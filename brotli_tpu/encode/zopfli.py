"""Zopfli-style optimal parse for q10/q11.

Reference: BrotliCreateZopfliBackwardReferences /
BrotliCreateHqZopfliBackwardReferences (src/enc/backward_references/
hq.rs:984, :1237) — a shortest-path DP over positions where edge costs
come from a fitted cost model (ZopfliCostModel, hq.rs:167: literal
costs from sliding-window entropy, command/distance costs from
histograms), refined over two iterations (hq.rs:1392-1443: iter 0 from
a greedy pre-pass, iter 1 from the emitted commands).

Shape differences from the reference, for the batched pipeline:
candidate matches come from the vectorized top-K tables instead of a
mutable hash-to-binary-tree; edges (match targets, distance symbol
costs, sub-lengths) are precomputed vectorized so the sequential DP
loop is a lean scalar pass; the insert-run start search uses a running
minimum of (cost[u] - literal_prefix[u]) — the O(1) core of the
reference's StartPosQueue trick (hq.rs:185).
"""

from __future__ import annotations

import numpy as np

from ..core import constants as C
from .match import MATCH_CAP, extend_match, find_best_matches, greedy_parse

INF = float("inf")

# insert/copy code lookup tables (list indexing is ~10x faster than
# np.searchsorted in the scalar DP loop)
_INS_CODE = np.searchsorted(C.INSERT_BASE,
                            np.arange(1 << 16), side="right") - 1
_COPY_CODE = np.searchsorted(C.COPY_BASE,
                             np.arange(1 << 16), side="right") - 1
_INS_CODE_L = _INS_CODE.tolist()
_COPY_CODE_L = _COPY_CODE.tolist()
_INS_EXTRA_L = C.INSERT_EXTRA.tolist()
_CMD_SYM = np.zeros((24, 24), dtype=np.int64)
for _i in range(24):
    _CMD_SYM[_i] = C.combine_length_codes(
        np.full(24, _i), np.arange(24), np.zeros(24, bool))
_CMD_SYM_L = [row.tolist() for row in _CMD_SYM]
_CMD_SYM_LAST = np.zeros((24, 24), dtype=np.int64)
for _i in range(8):
    _CMD_SYM_LAST[_i, :16] = C.combine_length_codes(
        np.full(16, _i), np.arange(16), np.ones(16, bool))


def _sliding_key_counts(keys: np.ndarray, queries: np.ndarray,
                        lo: np.ndarray, hi: np.ndarray):
    """count_i = #{j in [lo_i, hi_i] : keys[j] == queries[i]} via one
    composite-key sort (key*n + pos is sorted ascending per key)."""
    n = len(keys)
    order = np.argsort(keys, kind="stable")
    S = keys[order].astype(np.int64) * n + order
    base = queries.astype(np.int64) * n
    h = np.searchsorted(S, base + np.minimum(hi, n - 1), side="right")
    l = np.searchsorted(S, base + np.maximum(lo, 0), side="left")
    return h - l


def estimate_literal_costs(data: np.ndarray, window: int = 0):
    """Per-byte literal bit cost from a sliding local histogram
    (reference BrotliEstimateBitCostsForLiterals, src/enc/
    literal_cost.rs:179: +-495-byte window with UTF8 context classes
    for mostly-UTF8 input, +-2000-byte single histogram otherwise; the
    sequential add/remove histogram walk is replaced by a composite-key
    searchsorted, which gives the same window counts in O(n log n))."""
    n = len(data)
    if n == 0:
        return np.zeros(0)
    raw = data.tobytes()
    utf8 = len(raw.decode("utf-8", errors="ignore").encode()) > 0.75 * n
    idx = np.arange(n)
    if utf8:
        half = 495
        # context class of position i from bytes i-1 (c) and i-2 (last):
        # ASCII continuation -> 0, multibyte lead -> 1, interior -> 2
        # (literal_cost.rs:8, UTF8Position), clamped by the sampled
        # multi-byte level (DecideMultiByteStatsLevel)
        c = np.concatenate([[0], data[:-1]]).astype(np.int64)
        last = np.concatenate([[0, 0], data[:-2]]).astype(np.int64)
        cls2 = np.where(c < 128, 0,
                        np.where(c >= 192, 1, np.where(last < 0xE0, 0, 2)))
        counts = np.bincount(cls2, minlength=3)
        max_utf8 = 0 if counts[1] + counts[2] < 25 else (
            1 if counts[2] < 500 else 2)
        cls = np.minimum(cls2, max_utf8)
        lo, hi = idx - half + 1, idx + half
        if max_utf8 == 0:
            cnt = _sliding_key_counts(data.astype(np.int64),
                                      data.astype(np.int64), lo, hi)
            W = np.minimum(hi, n - 1) - np.maximum(lo, 0) + 1
        else:
            key = cls * 256 + data
            cnt = _sliding_key_counts(key, key, lo, hi)
            W = _sliding_key_counts(cls, cls, lo, hi)
        cost = (np.log2(np.maximum(W, 1))
                - np.log2(np.maximum(cnt, 1)) + 0.02905)
        cost = np.where(cost < 1.0, cost * 0.5 + 0.5, cost)
        ramp = idx < 2000
        cost = cost + ramp * (0.7 - (2000 - np.minimum(idx, 2000))
                              / 2000.0 * 0.35)
    else:
        half = 2000
        lo, hi = idx - half + 1, idx + half
        cnt = _sliding_key_counts(data.astype(np.int64),
                                  data.astype(np.int64), lo, hi)
        W = np.minimum(hi, n - 1) - np.maximum(lo, 0) + 1
        cost = (np.log2(np.maximum(W, 1))
                - np.log2(np.maximum(cnt, 1)) + 0.029)
        cost = np.where(cost < 1.0, cost * 0.5 + 0.5, cost)
    return cost


def _set_cost(h, literal=False):
    """Histogram -> per-symbol bit cost (reference SetCost,
    hq.rs:1046): missing symbols cost log2(sum [+ nmissing]) + 2,
    present symbols are floored at 1 bit."""
    h = np.asarray(h, np.float64)
    s = h.sum()
    if s == 0:
        return np.full(len(h), 2.0)
    miss = s if literal else s + (h == 0).sum()
    cost = np.where(h > 0,
                    np.maximum(np.log2(s) - np.log2(np.maximum(h, 1)), 1.0),
                    np.log2(miss) + 2.0)
    return cost


def _cost_tables(lit_hist, cmd_hist, dist_hist):
    return (_set_cost(lit_hist, literal=True), _set_cost(cmd_hist),
            _set_cost(dist_hist))


def _histograms_from_commands(data, cmds, dist_alpha):
    from .bitstream import extract_literals
    lits = extract_literals(data, 0, cmds)
    lit_hist = np.bincount(lits, minlength=256)
    cmd_hist = np.bincount(cmds.cmd_sym, minlength=704)
    mask = (cmds.copy_len > 0) & ~C.CMD_IMPLICIT_DIST0[cmds.cmd_sym]
    dist_hist = np.bincount(cmds.dist_code[mask], minlength=dist_alpha)
    return lit_hist, cmd_hist, dist_hist


def _build_edges(cand_lens, cand_dists, cand_isdict, cand_wire,
                 cost_dist, dist_params, n, extra=None):
    """Vectorized edge construction: per match candidate, the full
    length plus a geometric ladder of shorter lengths (dictionary
    matches keep only the exact word length).  Returns edges grouped by
    source position: lists (length, dist, copy_code, base_cost) where
    base = dist symbol cost + dist/copy extra bits."""
    npostfix, ndirect = dist_params.npostfix, dist_params.ndirect
    mvalid = cand_lens >= 2
    ci, pp = np.nonzero(mvalid)
    L = cand_lens[ci, pp]
    D = cand_dists[ci, pp]
    ISD = cand_isdict[ci, pp]
    W = cand_wire[ci, pp]
    if extra is not None:
        # sparse all-matches from the native collector plus dense
        # dictionary candidates (the reference's hash-to-binary-tree +
        # BrotliFindAllStaticDictionaryMatches, hq.rs:1237, return every
        # distinct-distance match; these rows are the batched analog)
        xp, xl, xd, xisd, xw = extra
        pp = np.concatenate([pp, xp])
        L = np.concatenate([L, xl])
        D = np.concatenate([D, xd])
        ISD = np.concatenate([ISD, xisd])
        W = np.concatenate([W, xw])
    # dedupe (p, d) pairs keeping the longest
    order = np.lexsort((-L, D, pp))
    pp, L, D, ISD, W = (pp[order], L[order], D[order], ISD[order],
                        W[order])
    keep = np.ones(len(pp), bool)
    keep[1:] = (pp[1:] != pp[:-1]) | (D[1:] != D[:-1])
    pp, L, D, ISD, W = pp[keep], L[keep], D[keep], ISD[keep], W[keep]

    # distance symbol costs (vectorized)
    dcost = np.zeros(len(pp))
    direct = D <= ndirect
    if direct.any():
        dcost[direct] = cost_dist[15 + D[direct]]
    far = ~direct
    if far.any():
        sym, extra, nbits = C.encode_distance(D[far], npostfix, ndirect)
        dcost[far] = cost_dist[sym] + nbits

    ladders = [(L, W)]
    near = np.where((L > 4) & ~ISD, L - 1, 0)
    ladders.append((near, near))
    near2 = np.where((L > 5) & ~ISD, L - 2, 0)
    ladders.append((near2, near2))
    for sub in (4, 5, 6, 8, 10, 13, 16, 22, 32, 48, 64, 96, 128, 192):
        # dictionary words cannot be shortened (copy_len selects the word)
        cut = np.where((L > sub) & ~ISD, sub, 0)
        ladders.append((cut, cut))

    srcs, lens, wires_a, dists, ccodes, bases, dcosts = \
        [], [], [], [], [], [], []
    for lad, wires in ladders:
        sel = np.nonzero(lad >= 2)[0]
        ll = lad[sel]          # advance (output) length
        ww = wires[sel]        # wire copy length (codes)
        cc = _COPY_CODE[np.minimum(ww, (1 << 16) - 1)]
        srcs.append(pp[sel])
        lens.append(ll)
        wires_a.append(ww)
        dists.append(D[sel])
        ccodes.append(cc)
        bases.append(dcost[sel] + C.COPY_EXTRA[cc])
        dcosts.append(dcost[sel])
    src = np.concatenate(srcs)
    order = np.argsort(src, kind="stable")
    src = src[order]
    e_len = np.concatenate(lens)[order]
    e_wire = np.concatenate(wires_a)[order]
    e_dist = np.concatenate(dists)[order]
    e_ccode = np.concatenate(ccodes)[order]
    e_base = np.concatenate(bases)[order]
    e_dcost = np.concatenate(dcosts)[order]
    edge_off = np.zeros(n + 2, dtype=np.int64)
    np.add.at(edge_off, src + 1, 1)
    edge_off = np.cumsum(edge_off)[:n + 1]
    return edge_off, e_len, e_wire, e_dist, e_ccode, e_base, e_dcost


def zopfli_parse(n: int, lcp: np.ndarray, cost_cmd, edges):
    """Shortest-path DP.  cost[j] = min bits for a parse of [0, j)
    ending exactly at a copy end (or j == 0); insert runs are closed
    implicitly via the running-min start.  Dispatches to the native
    relaxation when available."""
    (edge_off, e_len, e_wire, e_dist, e_ccode, e_base, e_dcost,
     cost_dist_short, data, dict_len, window_size,
     initial_cache) = edges

    from .. import native_bridge as nb
    if nb.available():
        cost, prev_start, prev_len, prev_wire, prev_dist = \
            nb.zopfli_dp_cache(
                n, lcp, cost_cmd, cost_dist_short, edge_off, e_len,
                e_wire, e_dist, e_ccode, e_base, e_dcost,
                _INS_CODE, C.INSERT_EXTRA, _CMD_SYM.reshape(-1),
                _CMD_SYM_LAST.reshape(-1), data, dict_len, window_size,
                initial_cache)
        cost = cost.tolist()
        prev_start = prev_start.tolist()
        prev_len = prev_len.tolist()
        prev_wire = prev_wire.tolist()
        prev_dist = prev_dist.tolist()
        best_adj = INF
        best_u = 0
        lcp_l = lcp.tolist()
        for p in range(n):
            c = cost[p]
            if c < 1e29:
                adj = c - lcp_l[p]
                if adj < best_adj:
                    best_adj = adj
                    best_u = p
        return _backtrack(n, lcp_l, cost, prev_start, prev_len,
                          prev_wire, prev_dist, best_adj, best_u)

    cost = [INF] * (n + 1)
    cost[0] = 0.0
    prev_start = [0] * (n + 1)
    prev_len = [0] * (n + 1)
    prev_wire = [0] * (n + 1)
    prev_dist = [0] * (n + 1)

    lcp_l = lcp.tolist()
    cost_cmd_l = cost_cmd.tolist()
    ins_code = _INS_CODE_L
    ins_extra = _INS_EXTRA_L
    cmd_sym = _CMD_SYM_L
    eo = edge_off.tolist()
    el, ew, ed, ec, eb = (e_len.tolist(), e_wire.tolist(),
                          e_dist.tolist(), e_ccode.tolist(),
                          e_base.tolist())

    best_adj = INF
    best_u = 0
    for p in range(n):
        c = cost[p]
        if c < INF:
            adj = c - lcp_l[p]
            if adj < best_adj:
                best_adj = adj
                best_u = p
        e0, e1 = eo[p], eo[p + 1]
        if e0 == e1:
            continue
        lp = lcp_l[p]
        for e in range(e0, e1):
            ll = el[e]
            tgt = p + ll
            if tgt > n:
                continue
            ccode = ec[e]
            base = eb[e]
            ct = cost[tgt]
            # start candidate 1: running-min u (possibly long insert)
            il = p - best_u
            ic = ins_code[il] if il < 65536 else 23
            t = (best_adj + lp + base + ins_extra[ic]
                 + cost_cmd_l[cmd_sym[ic][ccode]])
            if t < ct:
                cost[tgt] = ct = t
                prev_start[tgt] = best_u
                prev_len[tgt] = ll
                prev_wire[tgt] = ew[e]
                prev_dist[tgt] = ed[e]
            # start candidate 2: zero-insert continuation from p
            if cost[p] < INF and best_u != p:
                t = (cost[p] + base
                     + cost_cmd_l[cmd_sym[0][ccode]])
                if t < ct:
                    cost[tgt] = t
                    prev_start[tgt] = p
                    prev_len[tgt] = ll
                    prev_wire[tgt] = ew[e]
                    prev_dist[tgt] = ed[e]

    return _backtrack(n, lcp_l, cost, prev_start, prev_len, prev_wire,
                      prev_dist, best_adj, best_u)


def _backtrack(n, lcp_l, cost, prev_start, prev_len, prev_wire,
               prev_dist, best_adj, best_u):
    # close the stream: possibly a final pure-literal run from best u
    end_from_u = best_adj + lcp_l[n]
    ins, cps, dst, adv = [], [], [], []
    pos = n
    if cost[n] >= 1e29 or end_from_u < cost[n]:
        ins.append(n - best_u)
        cps.append(0)
        dst.append(0)
        adv.append(0)
        pos = best_u
    while pos > 0:
        u = prev_start[pos]
        l = prev_len[pos]
        ins.append(pos - l - u)
        cps.append(prev_wire[pos])
        dst.append(prev_dist[pos])
        adv.append(l)
        pos = u
    ins.reverse()
    cps.reverse()
    dst.reverse()
    adv.reverse()
    return ins, cps, dst, adv


def _collect_candidates(full, window_size, dict_len, literal_byte_score,
                        use_dictionary):
    """Per-position candidate rows: deep hash-4, deep hash-8, dict."""
    from .. import native_bridge as nb
    outs = []
    if nb.available():
        # deep table with runner-up (2 diverse rows from one pass)
        bl, bd, bs, isd, bw, b2l, b2d = nb.find_best_matches(
            full, window_size, dict_len=dict_len,
            literal_byte_score=literal_byte_score,
            k=48, bucket_bits=17, k8=0, use_dictionary=False,
            want_top2=True)
        outs.append((bl, bd, isd, bw))
        outs.append((b2l, b2d, np.zeros(len(b2l), bool), b2l))
    else:
        bl, bd, bs, isd, bw = find_best_matches(
            full, window_size, dict_len=dict_len,
            literal_byte_score=literal_byte_score,
            k=48, bucket_bits=17, k8=0, use_dictionary=False)
        outs.append((bl, bd, isd, bw))
    for kw in (dict(k=12, bucket_bits=14, k8=0, use_dictionary=False),
               dict(k=1, bucket_bits=17, k8=24,
                    use_dictionary=use_dictionary)):
        bl, bd, bs, isd, bw = find_best_matches(
            full, window_size, dict_len=dict_len,
            literal_byte_score=literal_byte_score, **kw)
        outs.append((bl, bd, isd, bw))
    cand_lens = np.stack([o[0] for o in outs])
    cand_dists = np.stack([o[1] for o in outs])
    cand_isdict = np.stack([o[2] for o in outs])
    cand_wire = np.stack([o[3] for o in outs])
    return cand_lens, cand_dists, cand_isdict, cand_wire


def zopfli_segment(full: np.ndarray, params, dict_len: int = 0,
                   initial_cache=(4, 11, 15, 16)):
    """q10/q11 command generation for one region with cost-model
    refinement.  Returns (ins[], cps[], dst[])."""
    from .command import resolve_commands

    n = len(full) - dict_len
    window_size = params.window_size
    dist_alpha = params.dist.alphabet_size

    # find_best_matches already returns region-relative arrays
    # (index 0 == absolute position dict_len)
    cand_lens, cand_dists, cand_isdict, cand_wire = _collect_candidates(
        full, window_size, dict_len, params.literal_byte_score,
        not params.catable)
    cand_lens = cand_lens.copy()
    cand_wire = cand_wire.copy()
    # exact lengths for cap-hit matches, with amortized skipping: inside
    # a span already covered by a longer extended match, the capped edge
    # is kept as-is (the long edge from the span start dominates), which
    # bounds total extension work to O(n) on runs like 'aaaa...'
    hits = np.argwhere((cand_lens >= MATCH_CAP) & ~cand_isdict)
    hits = hits[np.argsort(hits[:, 1], kind="stable")]
    last_end = -1
    for ci, p in hits:
        if p < last_end - 32:
            continue
        d = int(cand_dists[ci, p])
        ext = extend_match(full, dict_len + p - d, dict_len + p,
                           int(cand_lens[ci, p]), n - p)
        cand_lens[ci, p] = ext
        cand_wire[ci, p] = ext
        last_end = max(last_end, int(p) + ext)

    # greedy pre-pass for the iteration-0 cost model
    flat = np.argmax(cand_lens, axis=0)
    ar = np.arange(n)
    bl = cand_lens[flat, ar]
    bd = cand_dists[flat, ar]
    bs = np.where(bl >= 4, 135 * bl - 30 * np.log2(
        np.maximum(bd, 2)).astype(np.int64), 0)
    bwire = cand_wire[flat, ar]
    bisd = cand_isdict[flat, ar]
    pre = greedy_parse(full, bl, bd, bs, [n], dict_len=dict_len, pos0=0,
                       initial_cache=initial_cache,
                       window_size=window_size, best_isdict=bisd,
                       best_wire=bwire)
    p_ins, p_cps, p_dst, p_adv = pre[0]
    pre_cmds, _ = resolve_commands(p_ins, p_cps, p_dst, params.dist,
                                   advance=p_adv,
                                   initial_cache=list(initial_cache),
                                   pos_offset=dict_len,
                                   window_size=window_size)

    from .. import native_bridge as nb
    extra = None
    if params.quality >= 11:
        xs = []
        if nb.available():
            mp, ml, md = nb.collect_matches(full, window_size,
                                            dict_len=dict_len)
            xs.append((mp, ml, md, np.zeros(len(mp), bool), ml))
        if not params.catable:
            from .static_dict import collect_dict_matches
            dp_, dl_, dd_, dw_ = collect_dict_matches(
                full, dict_len, window_size)
            xs.append((dp_, dl_, dd_, np.ones(len(dp_), bool), dw_))
        if xs:
            extra = tuple(np.concatenate([x[i] for x in xs])
                          for i in range(5))

    data_region = full[dict_len:]
    lit_costs = estimate_literal_costs(data_region)
    lcp = np.concatenate([[0.0], np.cumsum(lit_costs)])

    lh, ch, dh = _histograms_from_commands(data_region, pre_cmds,
                                           dist_alpha)
    iters = 3 if params.quality >= 11 else 1
    result = None
    for it in range(iters):
        cost_lit, cost_cmd, cost_dist = _cost_tables(lh, ch, dh)
        if it > 0:
            # iterations >= 1 price literals from the previous parse's
            # literal histogram, not the position estimator (reference
            # set_from_commands, hq.rs:1076: only bytes that stayed
            # literals shape the cost)
            lcp = np.concatenate([[0.0],
                                  np.cumsum(cost_lit[data_region])])
        cds = cost_dist[:16].copy()
        if it == 0:
            # optimistic seeding: the pre-pass sees few cache hits, so
            # learned short-code/implicit-cell costs start prohibitive
            # and the DP would never discover them (reference seeds its
            # cost model from literal costs for the same reason)
            cds = np.minimum(cds, 6.0)
            cost_cmd = cost_cmd.copy()
            cost_cmd[:128] = np.minimum(cost_cmd[:128], 11.0)
        edges = _build_edges(cand_lens, cand_dists, cand_isdict,
                             cand_wire, cost_dist, params.dist, n,
                             extra=extra)
        edges = edges + (cds, full, dict_len,
                         window_size, np.asarray(initial_cache,
                                                 dtype=np.int64))
        result = zopfli_parse(n, lcp, cost_cmd, edges)
        if it + 1 < iters:
            r_ins, r_cps, r_dst, r_adv = result
            cmds, _ = resolve_commands(r_ins, r_cps, r_dst, params.dist,
                                       advance=r_adv,
                                       initial_cache=list(initial_cache),
                                       pos_offset=dict_len,
                                       window_size=window_size)
            lh, ch, dh = _histograms_from_commands(data_region, cmds,
                                                   dist_alpha)
    return result
