"""Batched decode with the TPU symbol-layer tier.

decompress_batch_tpu(streams): decodes N independent brotli streams.
For each stream the HOST parses stream/metablock headers (cheap,
byte-level) and checks device eligibility; eligible compressed
metablocks are queued as device lanes and their symbol layer (command
/ literal / distance decode incl. extra bits and the distance ring)
runs in ONE jitted while_loop on the chip (ops.decode_tpu).  The host
then replays the returned (ins, copy, dist) command list over the
literal stream to reconstruct bytes (LZ window work — memcpy-grade).

Eligibility per metablock: one block type in all three categories,
one literal tree and one distance tree (the context maps are then
all-zero and the literal-context feedback loop stays off-device).
Static-dictionary references ARE resolved on this path: the device
validates the word id and advances by the transform output length,
and the host resolves the bytes during LZ execution; only malformed
refs raise the lane's status flag.  Any ineligible or flagged stream
falls back to the native host decoder — results are identical either
way, the tier only moves where the entropy layer runs.  Our own q<4
streams and any single-tree streams qualify; context-modeled streams
(typical q5+) route to the host.

Reference surface bar: BrotliDecoderDecompress over a batch (SURVEY
§2.11 serving path); host oracle decode/decoder.py.
"""

from __future__ import annotations

import numpy as np

from ..core import constants as C
from ..core.bitio import BitReader
from ..core.prefix import read_prefix_code
from .decoder import (_BlockCategory, _read_count_code,
                      _read_context_map, _read_window_bits,
                      BrotliDecodeError)


class _Lane:
    __slots__ = ("stream_idx", "data", "bit0", "mlen", "window",
                 "npostfix", "ndirect", "lit_len", "cmd_len",
                 "dist_len", "cache", "out_prefix_len")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def _try_parse_stream(data: bytes):
    """Walk one stream on the host.  Returns a plan:
    list of segments, each either ("bytes", b) literal output,
    ("lane", _Lane) device metablock, or None if ineligible.
    Dispatches to the native header walk (parse_lane_header_native)
    when available — the Python per-stream parse was ~1 s per 128
    streams, the dominant host leg after the native LZ execute; the
    Python body below remains the tested oracle."""
    from .. import native_bridge as nb
    if nb.available():
        r = nb.parse_lane_header(data)
        if r is None:
            return None
        meta, pre_segs, lit_len, cmd_len, dist_len = r
        segs = [("bytes", data[off:off + ln]) for off, ln in pre_segs]
        lane = _Lane(
            stream_idx=-1, data=data, bit0=int(meta[0]),
            mlen=int(meta[1]), window=(1 << int(meta[2])) - 16,
            npostfix=int(meta[3]), ndirect=int(meta[4]),
            lit_len=lit_len.astype(np.int32),
            cmd_len=cmd_len.astype(np.int32),
            dist_len=dist_len.astype(np.int32),
            cache=list(C.INITIAL_DISTANCE_CACHE),
            out_prefix_len=int(meta[7]))
        segs.append(("lane", lane))
        return segs
    reader = BitReader(data)
    wbits = _read_window_bits(reader, False)
    window_size = (1 << wbits) - 16
    cache = list(C.INITIAL_DISTANCE_CACHE)
    segs = []
    out_len = 0
    while True:
        islast = reader.read(1)
        if islast and reader.read(1):
            break
        mnibbles = reader.read(2)
        if mnibbles == 3:
            if reader.read(1):
                raise BrotliDecodeError("reserved bit set")
            mskip = reader.read(2)
            skip = 0
            if mskip:
                val = reader.read(8 * mskip)
                if mskip > 1 and (val >> (8 * (mskip - 1))) == 0:
                    raise BrotliDecodeError("non-minimal MSKIPLEN")
                skip = val + 1
            if reader.align_to_byte():
                raise BrotliDecodeError("nonzero metadata padding")
            reader.read_bytes(skip)
            if islast:
                break
            continue
        mlen = reader.read(16 + 4 * mnibbles) + 1
        if mnibbles > 0 and (mlen - 1) >> (16 + 4 * (mnibbles - 1)) == 0:
            raise BrotliDecodeError("non-minimal MNIBBLES")
        if not islast and reader.read(1):  # ISUNCOMPRESSED
            if reader.align_to_byte() != 0:
                raise BrotliDecodeError("nonzero uncompressed padding")
            segs.append(("bytes", reader.read_bytes(mlen)))
            out_len += mlen
            continue

        # compressed metablock header
        blocks = {c: _BlockCategory() for c in "LID"}
        for c in "LID":
            blocks[c].read_header(reader)
        if any(blocks[c].num_types != 1 for c in "LID"):
            return None
        npostfix = reader.read(2)
        ndirect = reader.read(4) << npostfix
        _ = [reader.read(2) for _ in range(blocks["L"].num_types)]
        ntrees_l = _read_count_code(reader)
        _read_context_map(reader, 64 * blocks["L"].num_types, ntrees_l)
        ntrees_d = _read_count_code(reader)
        _read_context_map(reader, 4 * blocks["D"].num_types, ntrees_d)
        if ntrees_l != 1 or ntrees_d != 1:
            return None
        dist_alpha = C.distance_alphabet_size(npostfix, ndirect, 24)
        lit_len = read_prefix_code(reader, 256)
        cmd_len = read_prefix_code(reader, 704)
        dist_len = read_prefix_code(reader, dist_alpha)
        lane = _Lane(stream_idx=-1, data=data, bit0=reader.bit_pos,
                     mlen=mlen, window=window_size, npostfix=npostfix,
                     ndirect=ndirect, lit_len=lit_len, cmd_len=cmd_len,
                     dist_len=dist_len, cache=list(cache),
                     out_prefix_len=out_len)
        segs.append(("lane", lane))
        out_len += mlen
        # the device returns the end bit position; the host walk
        # cannot continue past an un-decoded metablock, so device
        # metablocks must be LAST unless we resume later.  Streams
        # with more than one compressed metablock are handled by
        # resuming this walk after the device pass; for the one-shot
        # prototype we only accept a trailing compressed metablock.
        if not islast:
            return None
        break
    return segs


def _reconstruct(lane: _Lane, prefix: bytes, lits: np.ndarray,
                 nlit: int, cmds: np.ndarray, ncmd: int) -> bytes:
    # seeded with preceding metablock output: distances may reach back
    # across metablock boundaries (the device already validated them
    # against out_prefix + local position).  Native LZ execution when
    # available — the per-command Python loop was the batch path's
    # bottleneck once the device leg shrank
    from .. import native_bridge as nb
    if nb.available():
        body = nb.lz_execute(prefix, lits[:nlit], cmds[:ncmd], ncmd,
                             lane.window, lane.mlen)
        if body is None:
            raise BrotliDecodeError("device metablock length mismatch")
        return body
    out = bytearray(prefix)
    p0 = len(prefix)
    li = 0
    for k in range(ncmd):
        ins, cpy, dist = (int(cmds[k, 0]), int(cmds[k, 1]),
                          int(cmds[k, 2]))
        if ins:
            out += bytes(lits[li:li + ins])
            li += ins
        if cpy:
            n = len(out)
            max_dist = min(n, lane.window)
            if dist > max_dist:
                # static-dictionary reference: the device validated
                # the id and advanced by the transform output length;
                # resolve the bytes here
                from ..core.dictionary import get_dictionary
                word = get_dictionary().resolve(cpy, dist - max_dist - 1)
                out += word
            elif dist <= 0:
                raise BrotliDecodeError("bad distance from device")
            elif dist >= cpy:
                out += out[n - dist:n - dist + cpy]
            else:
                for _ in range(cpy):
                    out.append(out[-dist])
    if len(out) - p0 != lane.mlen:
        raise BrotliDecodeError("device metablock length mismatch")
    return bytes(out[p0:])


def decompress_batch_tpu(streams, interpret: bool | None = None):
    """Decode N streams; eligible trailing metablocks run their symbol
    layer on the device, everything else on the host.  Returns
    (outputs, n_device_lanes)."""
    import jax
    import jax.numpy as jnp

    from .. import native_bridge as nb
    from ..ops.decode_tpu import batch_decode_device

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    plans = []
    for s in streams:
        try:
            plans.append(_try_parse_stream(bytes(s)))
        except Exception:
            plans.append(None)

    lanes = []
    for i, plan in enumerate(plans):
        if plan is None:
            continue
        for kind, seg in plan:
            if kind == "lane":
                seg.stream_idx = i
                lanes.append(seg)

    results: dict[int, bytes] = {}
    if lanes:
        n = len(lanes)
        Lmax = max(len(ln.data) for ln in lanes)
        mlen_max = max(ln.mlen for ln in lanes)
        data = np.zeros((n, Lmax), np.uint8)
        for j, ln in enumerate(lanes):
            data[j, :len(ln.data)] = np.frombuffer(ln.data, np.uint8)
        da_max = max(len(ln.dist_len) for ln in lanes)

        def stackpad(arrs, width):
            out = np.zeros((n, width), np.int32)
            for j, a in enumerate(arrs):
                out[j, :len(a)] = a
            return out

        s_lit = mlen_max
        s_cmd = mlen_max // 2 + 8
        fn = batch_decode_device
        if interpret:
            # the while_loop kernel is pure jax.numpy — it runs on the
            # CPU backend directly (no pallas), interpret is moot
            pass
        lits, nlit, cmds, ncmd, end_bit, status, _ = fn(
            jnp.asarray(data),
            jnp.asarray([ln.bit0 for ln in lanes], jnp.int32),
            jnp.asarray([ln.mlen for ln in lanes], jnp.int32),
            jnp.asarray([ln.window for ln in lanes], jnp.int32),
            jnp.asarray([ln.npostfix for ln in lanes], jnp.int32),
            jnp.asarray([ln.ndirect for ln in lanes], jnp.int32),
            jnp.asarray([ln.cache for ln in lanes], jnp.int32),
            jnp.asarray(stackpad([ln.lit_len for ln in lanes], 256)),
            jnp.asarray(stackpad([ln.cmd_len for ln in lanes], 704)),
            jnp.asarray(stackpad([ln.dist_len for ln in lanes],
                                 da_max)),
            jnp.asarray([ln.out_prefix_len for ln in lanes],
                        jnp.int32),
            jnp.int32(3 * mlen_max + 64),
            s_lit=s_lit, s_cmd=s_cmd)
        # pull the tiny count vectors first, then transfer only the
        # realized prefix of the wide buffers (power-of-two bucketed
        # so the slice executable is reused): the full-width lits/cmds
        # staging is sized for the worst case and would dominate d2h
        nlit = np.asarray(nlit)
        ncmd = np.asarray(ncmd)
        status = np.asarray(status)
        end_bit = np.asarray(end_bit)

        def bucket(v, cap):
            b = 64
            while b < v:
                b <<= 1
            return min(b, cap)

        wl = bucket(int(nlit.max(initial=0)), s_lit)
        wc = bucket(int(ncmd.max(initial=0)), s_cmd)
        lits = np.asarray(lits[:, :wl])
        cmds = np.asarray(cmds[:, :wc])

        for j, ln in enumerate(lanes):
            if int(status[j]) != 4:  # PH_DONE
                continue  # malformed construct: host fallback
            # RFC 7932 §9.2: final padding bits (from the device's end
            # bit up to the byte boundary) must be zero — the host and
            # native decoders reject nonzero padding, so this tier must
            # too (fall back; the host raises the matching error).
            end = int(end_bit[j])
            if (end & 7) and (ln.data[end >> 3] >> (end & 7)) != 0:
                continue
            prefix = b"".join(
                seg for kind, seg in plans[ln.stream_idx]
                if kind == "bytes")
            try:
                body = _reconstruct(ln, prefix, lits[j], int(nlit[j]),
                                    cmds[j], int(ncmd[j]))
            except BrotliDecodeError:
                continue
            results[ln.stream_idx] = prefix + body

    outputs = []
    n_device = 0
    for i, s in enumerate(streams):
        if i in results:
            outputs.append(results[i])
            n_device += 1
        else:
            # _host_decode (decoder.decompress) dispatches to the
            # native engine itself and translates its ValueError codes
            # into BrotliDecodeError/NeedsMoreInput — use it directly
            # so batch fallbacks raise the same exception types as
            # decompress()
            outputs.append(_host_decode(bytes(s)))
    return outputs, n_device


def _host_decode(data: bytes) -> bytes:
    from .decoder import decompress
    return decompress(data)
