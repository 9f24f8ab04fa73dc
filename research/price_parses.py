"""Price OUR q11 parse and the C engine's q11 parse under OUR final
DP cost model.  Decides model-gap vs search-gap:

model(C_parse) <  model(ours)  -> search gap (DP can't reach C's parse:
                                  missing candidates)
model(C_parse) >= model(ours)  -> model gap (DP optimizes the wrong
                                  objective; real coder favors C's)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
os.environ["BROTLI_TPU_ZDEBUG"] = "1"

import numpy as np  # noqa: E402

import oracle  # noqa: E402
from brotli_tpu import compress  # noqa: E402
import brotli_tpu.encode.zopfli as Z  # noqa: E402
from brotli_tpu.utils.billing import account  # noqa: E402
from brotli_tpu.encode.params import EncoderParams  # noqa: E402
from brotli_tpu.encode.command import resolve_commands  # noqa: E402
import brotli_tpu.core.constants as C  # noqa: E402

name = sys.argv[1] if len(sys.argv) > 1 else "alice29.txt"
raw = open(f"/root/reference/testdata/{name}", "rb").read()
data = np.frombuffer(raw, dtype=np.uint8)

ours = compress(data, quality=11)
model = Z._DEBUG_MODEL
print(f"final model from iteration {model['it']}")
cstream = oracle.compress(raw, quality=11, lgwin=22)
acc = account(cstream)

params = EncoderParams(quality=11, lgwin=22)
params.sanitize(len(raw))


def parse_arrays(cmds_list):
    ins = np.array([c[0] for c in cmds_list], dtype=np.int64)
    wire = np.array([c[1] for c in cmds_list], dtype=np.int64)
    dist = np.array([c[2] for c in cmds_list], dtype=np.int64)
    adv = np.array([c[3] for c in cmds_list], dtype=np.int64)
    return ins, wire, dist, adv


def price(ins, wire, dist, adv):
    cmds, _ = resolve_commands(ins, wire, dist, params.dist, advance=adv,
                               initial_cache=list(
                                   C.INITIAL_DISTANCE_CACHE),
                               pos_offset=0,
                               window_size=params.window_size)
    lcp = model["lcp"]
    cost_cmd = model["cost_cmd"]
    cost_dist = model["cost_dist"]
    step = cmds.insert_len + cmds.copy_advance
    start = np.zeros(len(step), np.int64)
    np.cumsum(step[:-1], out=start[1:])
    lit_cost = (lcp[start + cmds.insert_len] - lcp[start]).sum()
    cmd_cost = cost_cmd[cmds.cmd_sym].sum()
    extra = (C.INSERT_EXTRA[C.CMD_TO_INSERT_CODE[cmds.cmd_sym]].sum()
             + C.COPY_EXTRA[C.CMD_TO_COPY_CODE[cmds.cmd_sym]].sum())
    mask = (cmds.copy_len > 0) & ~C.CMD_IMPLICIT_DIST0[cmds.cmd_sym]
    ctx = C.distance_context_from_copy_len(cmds.copy_len[mask])
    if cost_dist.ndim == 2:
        dsym = cost_dist[ctx, cmds.dist_code[mask]].sum()
    else:
        dsym = cost_dist[cmds.dist_code[mask]].sum()
    dx = cmds.dist_extra_bits[mask].sum() \
        if hasattr(cmds, "dist_extra_bits") else 0
    parts = dict(lit=float(lit_cost), cmd=float(cmd_cost),
                 ins_copy_extra=float(extra), dist_sym=float(dsym),
                 dist_extra=float(dx), n_cmds=len(step))
    parts["total"] = sum(v for k, v in parts.items() if k != "n_cmds")
    return parts


# our parse: recover it by decoding our own stream
acc_o = account(ours)
po = price(*parse_arrays(acc_o["commands"]))
pc = price(*parse_arrays(acc["commands"]))
print(f"{'':14s} {'ours':>12s} {'C':>12s}")
for k in po:
    print(f"{k:14s} {po[k]:12.0f} {pc[k]:12.0f}")
print(f"model delta (C - ours): {pc['total'] - po['total']:+.0f} bits "
      f"({(pc['total'] - po['total']) / 8:+.0f} bytes)")
print(f"real   delta (C - ours): {(len(cstream) - len(ours)) * 8:+d} bits")
