"""Batched decode with the TPU symbol-layer tier.

decompress_batch_tpu(streams): decodes N independent brotli streams.
For each stream the HOST parses stream/metablock headers (cheap,
byte-level) and checks device eligibility; eligible compressed
metablocks are queued as device lanes and their symbol layer (command
/ literal / distance decode incl. extra bits and the distance ring)
runs in ONE jitted while_loop on the chip (ops.decode_tpu).  The host
then replays the returned (ins, copy, dist) command list over the
literal stream to reconstruct bytes (LZ window work — memcpy-grade).
Multi-metablock streams decode over several device ROUNDS: the chip
returns each lane's end bit and final distance ring, and the host
walk resumes there for the next metablock (round 5; previously only
trailing compressed metablocks were eligible).

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
                 "dist_len", "cache", "out_prefix_len", "is_final")

    def __init__(self, **kw):
        self.is_final = True
        for k, v in kw.items():
            setattr(self, k, v)


def _try_parse_stream(data: bytes):
    """Walk one stream on the host.  Returns (plan, pending):
    plan = list of segments, each either ("bytes", b) literal output
    or ("lane", _Lane) device metablock; None if ineligible.
    pending = True when the walk stopped at a NON-final compressed
    metablock — the caller resumes with _resume_parse_stream once the
    device reports that lane's end bit and final distance ring.
    Dispatches to the native header walk (parse_lane_header_native)
    for the common single-pass case; the Python body below remains
    the tested oracle and handles the resumable multi-metablock
    walks."""
    from .. import native_bridge as nb
    if nb.available():
        r = nb.parse_lane_header(data)
        if r is not None:
            meta, pre_segs, lit_len, cmd_len, dist_len = r
            segs = [("bytes", data[off:off + ln])
                    for off, ln in pre_segs]
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
            return segs, False
        # the native walk only accepts trailing compressed
        # metablocks; retry with the resumable Python walk
    reader = BitReader(data)
    wbits = _read_window_bits(reader, False)
    window_size = (1 << wbits) - 16
    cache = list(C.INITIAL_DISTANCE_CACHE)
    return _walk_from(data, reader, window_size, cache, 0)


def _resume_parse_stream(data: bytes, bit_pos: int, cache,
                         window_size: int, out_len: int):
    """Continue a paused walk right after a device-decoded metablock
    (bit_pos = the device's end bit; cache = its final distance
    ring)."""
    reader = BitReader(data)
    reader.bit_pos = bit_pos
    return _walk_from(data, reader, window_size, list(cache), out_len)


def _walk_from(data, reader, window_size, cache, out_len):
    """Shared walk body.  Returns (segs, pending); segs None =
    ineligible for the device tier (multi-type / context-modeled
    metablock).  Walk-terminated streams (ending in ISLASTEMPTY, a
    final metadata block, or a final uncompressed block) enforce the
    RFC 7932 §9.2 final-padding check here — streams that end in a
    device lane get the equivalent check after the device pass."""
    segs = []
    while True:
        islast = reader.read(1)
        if islast and reader.read(1):
            if reader.align_to_byte() != 0:
                raise BrotliDecodeError(
                    "nonzero padding after last metablock")
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
            return None, False
        npostfix = reader.read(2)
        ndirect = reader.read(4) << npostfix
        _ = [reader.read(2) for _ in range(blocks["L"].num_types)]
        ntrees_l = _read_count_code(reader)
        _read_context_map(reader, 64 * blocks["L"].num_types, ntrees_l)
        ntrees_d = _read_count_code(reader)
        _read_context_map(reader, 4 * blocks["D"].num_types, ntrees_d)
        if ntrees_l != 1 or ntrees_d != 1:
            return None, False
        dist_alpha = C.distance_alphabet_size(npostfix, ndirect, 24)
        lit_len = read_prefix_code(reader, 256)
        cmd_len = read_prefix_code(reader, 704)
        dist_len = read_prefix_code(reader, dist_alpha)
        lane = _Lane(stream_idx=-1, data=data, bit0=reader.bit_pos,
                     mlen=mlen, window=window_size, npostfix=npostfix,
                     ndirect=ndirect, lit_len=lit_len, cmd_len=cmd_len,
                     dist_len=dist_len, cache=list(cache),
                     out_prefix_len=out_len, is_final=bool(islast))
        segs.append(("lane", lane))
        out_len += mlen
        # the device returns the end bit position and final distance
        # ring; the host walk cannot continue past an un-decoded
        # metablock, so a NON-final device metablock PAUSES the walk —
        # the caller resumes it (round 5 lifted the old
        # trailing-metablock-only gate)
        if not islast:
            return segs, True
        break
    return segs, False


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


def _run_device(lanes, batch_decode_device, jnp):
    """One device pass over `lanes`.  Returns (lits, nlit, cmds, ncmd,
    end_bit, status, cache_out) as numpy arrays (wide buffers sliced
    to their realized power-of-two width)."""
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
    lits, nlit, cmds, ncmd, end_bit, status, cache_out = \
        batch_decode_device(
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
    # realized prefix of the wide buffers (power-of-two bucketed so
    # the slice executable is reused): the full-width lits/cmds
    # staging is sized for the worst case and would dominate d2h
    nlit = np.asarray(nlit)
    ncmd = np.asarray(ncmd)
    status = np.asarray(status)
    end_bit = np.asarray(end_bit)
    cache_out = np.asarray(cache_out)

    def bucket(v, cap):
        b = 64
        while b < v:
            b <<= 1
        return min(b, cap)

    wl = bucket(int(nlit.max(initial=0)), s_lit)
    wc = bucket(int(ncmd.max(initial=0)), s_cmd)
    return (np.asarray(lits[:, :wl]), nlit,
            np.asarray(cmds[:, :wc]), ncmd, end_bit, status,
            cache_out)


def decompress_batch_tpu(streams, interpret: bool | None = None,
                         max_rounds: int = 8):
    """Decode N streams; eligible compressed metablocks run their
    symbol layer on the device, everything else on the host.
    Multi-metablock streams decode over several device ROUNDS: after
    each pass the host walk resumes at the device's end bit with its
    final distance ring (round 5 lifted the trailing-metablock-only
    gate).  Returns (outputs, n_device_streams)."""
    import jax
    import jax.numpy as jnp

    from ..ops.decode_tpu import batch_decode_device

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    del interpret  # the while_loop kernel is pure jax.numpy

    # per-stream state: accumulated output segments (bytes), a paused
    # walk flag, and failure marking (-> whole-stream host fallback)
    n_streams = len(streams)
    segs_acc = [[] for _ in range(n_streams)]
    failed = [False] * n_streams
    done = [False] * n_streams
    used_device = [False] * n_streams
    lanes = []
    for i, s in enumerate(streams):
        try:
            plan, pend = _try_parse_stream(bytes(s))
        except Exception:
            plan, pend = None, False
        if plan is None:
            failed[i] = True
            continue
        got_lane = False
        for kind, seg in plan:
            if kind == "lane":
                seg.stream_idx = i
                lanes.append(seg)
                got_lane = True
            else:
                segs_acc[i].append(seg)
        if not pend and not got_lane:
            done[i] = True  # stream with no compressed metablocks

    rounds = 0
    while lanes and rounds < max_rounds:
        rounds += 1
        (lits, nlit, cmds, ncmd, end_bit, status,
         cache_out) = _run_device(lanes, batch_decode_device, jnp)
        next_lanes = []
        for j, ln in enumerate(lanes):
            i = ln.stream_idx
            if failed[i]:
                continue
            if int(status[j]) != 4:  # PH_DONE
                failed[i] = True  # malformed construct: host fallback
                continue
            end = int(end_bit[j])
            if ln.is_final:
                # RFC 7932 §9.2: final padding bits must be zero —
                # the host and native decoders reject nonzero padding,
                # so this tier must too (fall back; the host raises
                # the matching error)
                if (end & 7) and \
                        (ln.data[end >> 3] >> (end & 7)) != 0:
                    failed[i] = True
                    continue
            prefix = b"".join(segs_acc[i])
            try:
                body = _reconstruct(ln, prefix, lits[j], int(nlit[j]),
                                    cmds[j], int(ncmd[j]))
            except BrotliDecodeError:
                failed[i] = True
                continue
            segs_acc[i].append(body)
            used_device[i] = True
            if ln.is_final:
                done[i] = True
                continue
            # resume the paused walk with the device's end state
            try:
                plan, pend = _resume_parse_stream(
                    ln.data, end, cache_out[j].tolist(), ln.window,
                    ln.out_prefix_len + ln.mlen)
            except Exception:
                plan, pend = None, False
            if plan is None:
                failed[i] = True
                continue
            got_lane = False
            for kind, seg in plan:
                if kind == "lane":
                    seg.stream_idx = i
                    next_lanes.append(seg)
                    got_lane = True
                else:
                    segs_acc[i].append(seg)
            if not pend and not got_lane:
                done[i] = True
        lanes = next_lanes
    if lanes:  # round budget exhausted: remaining streams fall back
        for ln in lanes:
            failed[ln.stream_idx] = True

    outputs = []
    n_device = 0
    for i, s in enumerate(streams):
        if done[i] and not failed[i]:
            outputs.append(b"".join(segs_acc[i]))
            # walk-only streams (no compressed metablock) complete on
            # this tier too, but only lane-carrying streams count as
            # device-decoded
            if used_device[i]:
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
