"""TPU batched symbol-layer decode.

Serving-path device tier: N independent metablocks (one per lane)
decode their ENTROPY LAYER on the chip — canonical prefix-tree build,
per-symbol command/literal/distance decode with extra bits, distance
ring-cache resolution and exact output-length tracking — as one jitted
`lax.while_loop` whose step advances every live lane by one symbol.
The host keeps the byte-level work it is better at (headers before,
LZ window reconstruction after).

Scope (checked by the host router, `decode.batch_tpu`): single block
type per category, one literal tree and one distance tree (context
maps are then all-zero, so p1/p2 context never selects a tree and the
LZ feedback loop stays off-device), standard window, no custom
dictionary.  A lane that hits a static-dictionary reference or any
malformed construct raises its status flag and the host re-decodes
that stream natively — device results are only consumed for clean
lanes.

Decode structure per tree (built ON DEVICE from the wire's code-length
arrays): canonical first-code/limit/offset rows plus a (length,
symbol)-sorted symbol list — the Deflate-style bounded search, O(15)
compares per symbol, no 32K LUT per lane.

Reference functional bar: the command loop of
/root/reference/src/ffi/decompressor.rs + decode.rs ProcessCommands
(vendored google/brotli); host oracle: decode/decoder.py:311.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants as C

# phases
PH_CMD = 0
PH_EXTRAS = 1
PH_LIT = 2
PH_DIST = 3
PH_DONE = 4
PH_FALLBACK = 5

I32 = jnp.int32


@functools.lru_cache(maxsize=1)
def _dict_len_tables():
    """size_bits per word length (31 = invalid) and transform OUTPUT
    length per (transform, word length) — content-independent: omit
    counts and prefix/suffix lengths are static, ferment preserves
    length (RFC 7932 §8)."""
    from ..core.dictionary import apply_transform, get_dictionary
    d = get_dictionary()
    sbits = np.full(25, 31, np.int32)
    outlen = np.zeros((121, 25), np.int32)
    for L in range(4, 25):
        sbits[L] = int(d.size_bits_by_length[L])
        for t in range(121):
            outlen[t, L] = len(apply_transform(d, b"a" * L, t))
    return sbits, outlen


def _bitrev15(x):
    x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
    x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
    x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
    x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
    return (x >> 1) & 0x7FFF  # 16-bit reverse -> 15-bit


def build_tree_device(lengths):
    """Canonical decode rows from per-symbol code lengths.

    lengths: [N, A] int32 (0 = absent).  Returns dict of
    first/limit/offset [N, 16], syms [N, A] (sorted by (len, symbol)),
    single [N] (the symbol if the tree has exactly one, else -1).
    """
    n, a = lengths.shape
    ls = jnp.arange(1, 16, dtype=I32)                    # [15]
    count = jnp.sum(lengths[:, None, :] == ls[None, :, None],
                    axis=2).astype(I32)                  # [N, 15]

    firsts = []
    code = jnp.zeros(n, I32)
    prev = jnp.zeros(n, I32)
    for i in range(15):
        code = (code + prev) << 1
        firsts.append(code)
        prev = count[:, i]
    first = jnp.stack(firsts, axis=1)                    # [N, 15]
    limit = first + count
    offset = jnp.cumsum(count, axis=1) - count           # [N, 15]

    key = jnp.where(lengths > 0, lengths, 99) * (2 * a) \
        + jnp.arange(a, dtype=I32)[None, :]
    order = jnp.argsort(key, axis=1).astype(I32)         # [N, A]
    nz = jnp.sum((lengths > 0).astype(I32), axis=1)
    single_sym = jnp.argmax(lengths > 0, axis=1).astype(I32)
    single = jnp.where(nz == 1, single_sym, -1)
    return dict(first=first, limit=limit, offset=offset,
                syms=order, single=single)


def _tree_decode(tree, w_lo):
    """Decode one symbol per lane from the low bits of w_lo.
    Returns (symbol, bits_consumed)."""
    peek = (w_lo & 0x7FFF).astype(I32)
    r = _bitrev15(peek)
    # candidate code value at each length l = r >> (15 - l)
    shifts = 15 - jnp.arange(1, 16, dtype=I32)           # [15]
    cand = (r[:, None] >> shifts[None, :]).astype(I32)   # [N, 15]
    ok = (cand < tree["limit"]) & (cand >= tree["first"])
    l_idx = jnp.argmax(ok, axis=1).astype(I32)           # first True
    lane = jnp.arange(cand.shape[0])
    c = cand[lane, l_idx]
    pos = tree["offset"][lane, l_idx] + c - tree["first"][lane, l_idx]
    pos = jnp.clip(pos, 0, tree["syms"].shape[1] - 1)
    sym = tree["syms"][lane, pos]
    nbits = l_idx + 1
    bad = ~jnp.any(ok, axis=1)
    sgl = tree["single"]
    sym = jnp.where(sgl >= 0, sgl, sym)
    nbits = jnp.where(sgl >= 0, 0, nbits)
    bad = jnp.where(sgl >= 0, False, bad)
    return sym, nbits, bad


@functools.partial(jax.jit, static_argnames=("s_lit", "s_cmd"))
def batch_decode_device(data, bit0, mlen, window, npostfix, ndirect,
                        cache0, lit_len, cmd_len, dist_len,
                        out_prefix, max_steps,
                        s_lit: int, s_cmd: int):
    """One-symbol-per-step batched decode loop.

    data [N, L] u8, bit0/mlen/window/npostfix/ndirect [N] i32,
    cache0 [N, 4] i32, *_len [N, alpha] i32 code lengths.
    Returns (lits [N, s_lit] u8, nlit [N], cmds [N, s_cmd, 3] i32
    (ins_len, copy_len, distance; the trailing command may have
    copy_len 0), ncmd [N], end_bit [N], status [N] 0=ok 1=fallback).
    """
    n, L = data.shape
    lit_tree = build_tree_device(lit_len)
    cmd_tree = build_tree_device(cmd_len)
    dist_tree = build_tree_device(dist_len)

    ins_base = jnp.asarray(C.INSERT_BASE, I32)
    ins_extra = jnp.asarray(C.INSERT_EXTRA, I32)
    cpy_base = jnp.asarray(C.COPY_BASE, I32)
    cpy_extra = jnp.asarray(C.COPY_EXTRA, I32)
    cmd2ins = jnp.asarray(C.CMD_TO_INSERT_CODE, I32)
    cmd2cpy = jnp.asarray(C.CMD_TO_COPY_CODE, I32)
    implicit0 = jnp.asarray(np.asarray(C.CMD_IMPLICIT_DIST0,
                                       np.int32), I32)
    sc_idx = jnp.asarray(C.DISTANCE_SHORT_CODE_INDEX, I32)
    sc_delta = jnp.asarray(C.DISTANCE_SHORT_CODE_DELTA, I32)
    _sb, _ol = _dict_len_tables()
    dict_sbits_t = jnp.asarray(_sb, I32)
    dict_outlen_t = jnp.asarray(_ol, I32)

    lane = jnp.arange(n)

    def window64(bit_pos):
        byte = (bit_pos >> 3).astype(I32)
        idx = jnp.clip(byte[:, None] + jnp.arange(8)[None, :], 0, L - 1)
        b = jnp.take_along_axis(data, idx, axis=1).astype(jnp.uint32)
        lo = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
        hi = b[:, 4] | (b[:, 5] << 8) | (b[:, 6] << 16) | (b[:, 7] << 24)
        sh = (bit_pos & 7).astype(jnp.uint32)
        w_lo = jnp.where(sh > 0, (lo >> sh) | (hi << (32 - sh)), lo)
        w_hi = jnp.where(sh > 0, hi >> sh, hi)
        return w_lo, w_hi

    def shifted(w_lo, w_hi, k):
        """bits starting k (< 32) positions in (>= 25 valid bits)."""
        k = k.astype(jnp.uint32)
        return jnp.where(k > 0, (w_lo >> k) | (w_hi << (32 - k)),
                         w_lo)

    def shifted64(w_lo, w_hi, k):
        """bits starting k (<= 57) positions in (>= 64-7-k valid)."""
        k32 = k >= 32
        lo = jnp.where(k32, w_hi, w_lo)
        hi = jnp.where(k32, jnp.zeros_like(w_hi), w_hi)
        kk = (k & 31).astype(jnp.uint32)
        return jnp.where(kk > 0, (lo >> kk) | (hi << (32 - kk)), lo)

    def shifted_pair(w_lo, w_hi, k):
        """(lo, hi) 64-bit view starting k (<= 57) bits in; bits past
        64-7-k are garbage — callers bound their reads."""
        k32 = k >= 32
        lo = jnp.where(k32, w_hi, w_lo)
        hi = jnp.where(k32, jnp.zeros_like(w_hi), w_hi)
        kk = (k & 31).astype(jnp.uint32)
        lo2 = jnp.where(kk > 0, (lo >> kk) | (hi << (32 - kk)), lo)
        hi2 = jnp.where(kk > 0, hi >> kk, hi)
        return lo2, hi2

    def mask(v, nb):
        return v & ((jnp.uint32(1) << nb.astype(jnp.uint32)) - 1)

    state0 = dict(
        bit=bit0.astype(I32), phase=jnp.zeros(n, I32),
        out_len=jnp.zeros(n, I32),
        ins_code=jnp.zeros(n, I32), cpy_code=jnp.zeros(n, I32),
        ins_rem=jnp.zeros(n, I32), cur_ins=jnp.zeros(n, I32),
        copy_len=jnp.zeros(n, I32), impl=jnp.zeros(n, I32),
        cache=cache0.astype(I32),
        nlit=jnp.zeros(n, I32), ncmd=jnp.zeros(n, I32),
        lits=jnp.zeros((n, s_lit), jnp.uint8),
        cmds=jnp.zeros((n, s_cmd, 3), I32),
        steps=jnp.zeros((), I32),
    )

    def cond(st):
        return jnp.any(st["phase"] < PH_DONE) & \
            (st["steps"] < max_steps)

    def body(st):
        phase = st["phase"]
        live = phase < PH_DONE
        w_lo, w_hi = window64(st["bit"])

        is_cmd0 = live & (phase == PH_CMD)
        is_ext0 = live & (phase == PH_EXTRAS)

        # --- CMD ---
        c_sym, c_bits, c_bad = _tree_decode(cmd_tree, w_lo)
        c_sym = jnp.clip(c_sym, 0, 703)
        n_ins = cmd2ins[c_sym]
        n_cpy = cmd2cpy[c_sym]
        n_impl = implicit0[c_sym]

        # --- EXTRAS, fused with CMD when the 57-bit window covers
        # cmd symbol + both extras (all but huge-length commands: a
        # separate EXTRAS step then drains them) ---
        ic_eff = jnp.where(is_cmd0, n_ins, st["ins_code"])
        cc_eff = jnp.where(is_cmd0, n_cpy, st["cpy_code"])
        base_off = jnp.where(is_cmd0, c_bits, 0).astype(I32)
        iebits = ins_extra[ic_eff]
        cebits = cpy_extra[cc_eff]
        fits = (base_off + iebits + cebits) <= 57
        we1 = shifted64(w_lo, w_hi, base_off)
        v_ins = mask(we1, iebits).astype(I32)
        we2 = shifted64(w_lo, w_hi, base_off + iebits)
        v_cpy = mask(we2, cebits).astype(I32)
        e_ins_len = ins_base[ic_eff] + v_ins
        e_cpy_len = cpy_base[cc_eff] + v_cpy
        e_bits = iebits + cebits

        # --- LIT (up to 3 per step from one window: 3 x 15 bits
        # fit the guaranteed 57) ---
        l_sym, l_bits, l_bad = _tree_decode(lit_tree, w_lo)
        w2 = shifted64(w_lo, w_hi, l_bits)
        l_sym2, l_bits2, l_bad2 = _tree_decode(lit_tree, w2)
        w3 = shifted64(w_lo, w_hi, l_bits + l_bits2)
        l_sym3, l_bits3, l_bad3 = _tree_decode(lit_tree, w3)

        # --- DIST (symbol + short/direct/extra fused), evaluated at a
        # per-lane bit offset so it can ALSO run inside a CMD step
        # (copy-only command) or the final LIT step — saving the
        # dedicated PH_DIST round trip for most commands ---
        cache = st["cache"]

        def dist_decode(wl, wh):
            d_sym, d_bits0, d_bad = _tree_decode(dist_tree, wl)
            dcode = jnp.clip(d_sym, 0,
                             dist_tree["syms"].shape[1] - 1)
            short_d = cache[lane,
                            jnp.clip(sc_idx[jnp.clip(dcode, 0, 15)],
                                     0, 3)] \
                + sc_delta[jnp.clip(dcode, 0, 15)]
            direct_d = dcode - 16 + 1
            h = jnp.maximum(dcode - ndirect - 16, 0)
            hcode = h >> npostfix
            lcode = h & ((1 << npostfix) - 1)
            nbits_raw = (1 + (hcode >> 1)).astype(I32)
            nbits = jnp.clip(nbits_raw, 0, 24)  # >24 = malformed
            offs = ((2 + (hcode & 1)) << nbits) - 4
            xd = shifted(wl, wh, d_bits0)
            extra = mask(xd, nbits).astype(I32)
            long_d = ((offs + extra) << npostfix) + lcode \
                + ndirect + 1
            is_short = dcode < 16
            is_direct = (~is_short) & (dcode < 16 + ndirect)
            dd = jnp.where(is_short, short_d,
                           jnp.where(is_direct, direct_d, long_d))
            db = jnp.where(is_short | is_direct, d_bits0,
                           d_bits0 + nbits)
            d_bad = d_bad | (is_short & (dd <= 0)) \
                | (~is_short & ~is_direct & (nbits_raw > 24))
            return dd, db, d_bad, dcode

        distance, d_bits, d_bad, dcode = dist_decode(w_lo, w_hi)

        # ------- select per phase -------
        is_cmd = is_cmd0
        is_ext = is_ext0
        is_lit = live & (phase == PH_LIT)
        is_dst = live & (phase == PH_DIST)
        # ext_eff: this step delivered the extras — either the fused
        # CMD window covered them or a dedicated EXTRAS step ran
        ext_eff = (is_cmd & fits) | is_ext

        # literal batch: how many of the up-to-3 decodes apply
        take2 = is_lit & (st["ins_rem"] >= 2)
        take3 = is_lit & (st["ins_rem"] >= 3)
        nl = is_lit.astype(I32) + take2.astype(I32) + take3.astype(I32)
        lit_bits = l_bits + jnp.where(take2, l_bits2, 0) \
            + jnp.where(take3, l_bits3, 0)

        consumed = jnp.where(
            is_cmd, c_bits + jnp.where(fits, e_bits, 0),
            jnp.where(is_ext, e_bits,
                      jnp.where(is_lit, lit_bits,
                                jnp.where(is_dst, d_bits, 0))))
        bit = st["bit"] + consumed
        bad = (is_cmd & c_bad) | (is_lit & l_bad) \
            | (take2 & l_bad2) | (take3 & l_bad3) | (is_dst & d_bad)

        out_len = st["out_len"]
        mrem = mlen - out_len

        # CMD -> stash codes (consumed by the rare unfused EXTRAS step)
        ins_code = jnp.where(is_cmd, n_ins, st["ins_code"])
        cpy_code = jnp.where(is_cmd, n_cpy, st["cpy_code"])
        impl = jnp.where(is_cmd, n_impl, st["impl"])

        # EXTRAS -> ins_rem/copy_len; overruns flag fallback
        e_over = ext_eff & (e_ins_len > mrem)
        ins_rem = jnp.where(ext_eff, e_ins_len, st["ins_rem"])
        cur_ins = jnp.where(ext_eff, e_ins_len, st["cur_ins"])
        copy_len = jnp.where(ext_eff, e_cpy_len, st["copy_len"])

        # LIT -> emit up to 3 bytes
        li0 = jnp.clip(st["nlit"], 0, s_lit - 1)
        li1 = jnp.clip(st["nlit"] + 1, 0, s_lit - 1)
        li2 = jnp.clip(st["nlit"] + 2, 0, s_lit - 1)
        lits = st["lits"]
        lits = lits.at[lane, li0].set(
            jnp.where(is_lit, l_sym.astype(jnp.uint8),
                      lits[lane, li0]))
        lits = lits.at[lane, li1].set(
            jnp.where(take2, l_sym2.astype(jnp.uint8),
                      lits[lane, li1]))
        lits = lits.at[lane, li2].set(
            jnp.where(take3, l_sym3.astype(jnp.uint8),
                      lits[lane, li2]))
        nlit = st["nlit"] + nl
        out_len = out_len + nl
        ins_rem = ins_rem - nl

        # after literals (or extras with 0 inserts): where do we go?
        lit_done = (is_lit & (ins_rem == 0)) | (ext_eff & ~e_over &
                                                (e_ins_len == 0))
        block_end = lit_done & (out_len == mlen)
        # implicit-dist0 copy: emitted without a DIST phase
        use_impl = lit_done & ~block_end & (impl == 1)
        impl_dist = cache[:, 0]
        # fused explicit distance: lanes whose literals (or extras
        # with 0 inserts) finished THIS step still hold the distance
        # symbol+extras in the current window — decode at the per-lane
        # offset and skip the PH_DIST round trip.  Lanes whose window
        # can't cover it (offset > 42, or offset+bits past the 57
        # guaranteed-valid bits, or a spuriously-bad decode from
        # garbage tail bits) fall through to PH_DIST as before.
        f_off = jnp.where(is_cmd, c_bits + e_bits,
                          jnp.where(is_ext, e_bits,
                                    lit_bits)).astype(I32)
        fl, fh = shifted_pair(w_lo, w_hi, f_off)
        f_dist, f_bits, f_bad, f_dcode = dist_decode(fl, fh)
        want_f = lit_done & ~block_end & (impl == 0)
        is_fdst = want_f & ~f_bad & (f_off <= 42) & \
            (f_off + f_bits <= 57)
        # distances may reach into PREVIOUS metablock output: the
        # total position is out_prefix + metablock-local out_len
        max_dist = jnp.minimum(out_len + out_prefix, window)

        # unified copy emit (implicit, fused, or DIST phase): window
        # copies advance out_len by copy_len; static-dictionary
        # references (distance beyond max_dist) advance it by the
        # TRANSFORM OUTPUT length — content-independent, tabulated per
        # (transform, word length) — the host resolves the bytes
        is_copy = use_impl | is_dst | is_fdst
        eff_dist = jnp.where(is_dst, distance,
                             jnp.where(is_fdst, f_dist, impl_dist))
        is_dictref = is_copy & (eff_dist > max_dist)
        word_id = eff_dist - max_dist - 1
        cl_ok = (copy_len >= 4) & (copy_len <= 24)
        cl_idx = jnp.clip(copy_len, 0, 24)
        sb = dict_sbits_t[cl_idx]
        transform = jnp.where(sb < 31, word_id >> sb, 121)
        dict_ok = is_dictref & cl_ok & (transform < 121) & \
            (word_id >= 0)
        dict_add = dict_outlen_t[jnp.clip(transform, 0, 120), cl_idx]
        dict_bad = is_dictref & ~dict_ok
        adv = jnp.where(is_dictref, dict_add, copy_len)
        c_over = is_copy & ~dict_bad & (adv > mlen - out_len)

        emit_cmd = block_end | (is_copy & ~dict_bad & ~c_over)
        cmd_ins = cur_ins
        cmd_cpy = jnp.where(block_end, 0, copy_len)
        cmd_dist = jnp.where(block_end, 0, eff_dist)
        ci = jnp.clip(st["ncmd"], 0, s_cmd - 1)
        row = jnp.stack([cmd_ins, cmd_cpy, cmd_dist], axis=1)
        old = st["cmds"][lane, ci]
        cmds = st["cmds"].at[lane, ci].set(
            jnp.where(emit_cmd[:, None], row, old))
        ncmd = st["ncmd"] + emit_cmd.astype(I32)

        copy_adds = jnp.where(emit_cmd & ~block_end, adv, 0)
        out_len = out_len + copy_adds

        # ring cache: push on explicit non-dictionary non-zero codes
        push = ((is_dst & (dcode != 0)) | (is_fdst & (f_dcode != 0))) \
            & ~is_dictref & ~c_over
        new_cache = jnp.stack(
            [eff_dist, cache[:, 0], cache[:, 1], cache[:, 2]], axis=1)
        cache = jnp.where(push[:, None], new_cache, cache)
        # fused-dist lanes consumed their distance bits in this step
        bit = bit + jnp.where(is_fdst, f_bits, 0)

        # fallback: malformed codes/refs, overruns, output overflow
        bad = bad | e_over | dict_bad | c_over \
            | (nlit > s_lit) | (ncmd > s_cmd)

        done_now = emit_cmd & (out_len == mlen)
        nphase = jnp.where(
            is_cmd & ~fits, PH_EXTRAS,
            jnp.where(ext_eff & ~lit_done, PH_LIT,
                      jnp.where(lit_done & ~block_end & (impl == 0),
                                PH_DIST, phase)))
        nphase = jnp.where(is_copy & ~dict_bad & ~c_over & ~done_now,
                           PH_CMD, nphase)
        nphase = jnp.where(done_now | block_end, PH_DONE, nphase)
        nphase = jnp.where(bad, PH_FALLBACK, nphase)
        nphase = jnp.where(live, nphase, phase)

        return dict(bit=jnp.where(live, bit, st["bit"]), phase=nphase,
                    out_len=out_len, ins_code=ins_code,
                    cpy_code=cpy_code, ins_rem=ins_rem,
                    cur_ins=cur_ins, copy_len=copy_len, impl=impl,
                    cache=cache, nlit=nlit, ncmd=ncmd, lits=lits,
                    cmds=cmds, steps=st["steps"] + 1)

    st = jax.lax.while_loop(cond, body, state0)
    # status: the final phase (PH_DONE == clean; anything else means
    # the lane fell back — PH_FALLBACK, or still live at max_steps)
    return (st["lits"], st["nlit"], st["cmds"], st["ncmd"],
            st["bit"], st["phase"].astype(I32), st["cache"])
