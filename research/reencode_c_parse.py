"""Split the q11 gap into parse vs coder: decode the C engine's q11
stream into commands, re-serialize those exact commands through OUR
metablock optimizer/serializer, and compare sizes.

our_coder(C_parse) ~= C_size  -> coder at parity, gap is the parse.
our_coder(C_parse) >> C_size  -> coder (splits/context/huffman) gap.
our_coder(C_parse) <  ours    -> our DP never finds C's parse.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import numpy as np  # noqa: E402

import oracle  # noqa: E402
from brotli_tpu import compress  # noqa: E402
from brotli_tpu.utils.billing import account  # noqa: E402
from brotli_tpu.encode.params import EncoderParams  # noqa: E402
from brotli_tpu.encode.command import resolve_commands  # noqa: E402
from brotli_tpu.encode.metablock import choose_distance_params  # noqa: E402
from brotli_tpu.encode import bitstream as bs  # noqa: E402
from brotli_tpu.encode.bitstream import BitWriter  # noqa: E402
import brotli_tpu.core.constants as C  # noqa: E402

name = sys.argv[1] if len(sys.argv) > 1 else "alice29.txt"
raw = open(f"/root/reference/testdata/{name}", "rb").read()
data = np.frombuffer(raw, dtype=np.uint8)
cstream = oracle.compress(raw, quality=11, lgwin=22)
ours = compress(data, quality=11)
acc = account(cstream)
cmds_c = acc["commands"]

params = EncoderParams(quality=11, lgwin=22)
params.sanitize(len(raw))

ins = np.array([c[0] for c in cmds_c], dtype=np.int64)
wire = np.array([c[1] for c in cmds_c], dtype=np.int64)
dist = np.array([c[2] for c in cmds_c], dtype=np.int64)
adv = np.array([c[3] for c in cmds_c], dtype=np.int64)
assert int(ins.sum() + adv.sum()) == len(raw), \
    (ins.sum(), adv.sum(), len(raw))

cache = list(C.INITIAL_DISTANCE_CACHE)
dist_params = params.dist
cmds, _ = resolve_commands(ins, wire, dist, dist_params, advance=adv,
                           initial_cache=cache, pos_offset=0,
                           window_size=params.window_size)
better = choose_distance_params(cmds.distance, cmds.copy_len > 0,
                                cmds.dist_code)
if (better.npostfix, better.ndirect) != (dist_params.npostfix,
                                         dist_params.ndirect):
    dist_params = better
    cmds, _ = resolve_commands(ins, wire, dist, dist_params, advance=adv,
                               initial_cache=cache, pos_offset=0,
                               window_size=params.window_size)

w = BitWriter()
bs.write_stream_header(w, params.lgwin, params.large_window)
bs.store_meta_block_auto(w, data, 0, len(raw), cmds, dist_params,
                         params.quality, params.size_hint, params.mode,
                         True)
re_c = w.getvalue()
print(f"{name}: C={len(cstream)}  ours={len(ours)}  "
      f"our_coder(C_parse)={len(re_c)}")
print(f"  coder delta vs C: {len(re_c) - len(cstream):+d} "
      f"({(len(re_c) / len(cstream) - 1):+.3%})")
print(f"  parse delta (ours vs C parse, our coder): "
      f"{len(ours) - len(re_c):+d}")
assert oracle.decompress(re_c) == raw
print("  re-encoded stream round-trips OK")
