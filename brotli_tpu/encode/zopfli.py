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

import os

import numpy as np

from ..core import constants as C
from .match import MATCH_CAP, extend_match, find_best_matches, greedy_parse

INF = float("inf")
#: candidate-ladder width visited per position by the early cost-model
#: iterations (the final wide iteration always visits the full set)
_EARLY_CAND_CAP = int(os.environ.get("BROTLI_TPU_EARLY_CAND_CAP", "6"))
#: insert-start queue width of the final iteration (reference
#: StartPosQueue holds 8, hq.rs:185)
_FINAL_STARTS = int(os.environ.get("BROTLI_TPU_FINAL_STARTS", "5"))
#: candidate rows visited per position by the FAST tier's single DP
#: iteration (0 = unlimited, the refining tiers' final-iteration
#: setting).  8 produces byte-identical output on the mixed/text/
#: binary A/B corpora — the collector's prefix-min ladder makes rows
#: 9+ dominated — at strictly less DP work
_FAST_CAND_CAP = int(os.environ.get("BROTLI_TPU_FAST_CAND_CAP", "8"))

# q11 refinement depth: 3 (2 narrow + 1 wide-queue pass, with the
# convergence stop) is the round-5 default — the round-4 depth of 5
# bought ~0.07% size on the mixed bench slice for ~40% more wall time
# (it5 202278 vs it3 202575, C 202711; alice 0.9875 -> 0.9886), the
# wrong side of the mandate's match-or-beat-speed-at-size<=C trade.
# BROTLI_TPU_Q11_ITERS=5 restores the deep search.
Q11_ITERS = int(os.environ.get("BROTLI_TPU_Q11_ITERS", "3"))
               # cost-model refinement rounds at q11 (reference runs 2;
               # extra rounds keep improving the parse/histogram
               # equilibrium and stop early on convergence)

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
    from .. import native_bridge as nb
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
        if nb.available():
            return nb.est_lit(data, None if max_utf8 == 0
                              else cls.astype(np.uint8),
                              half, True, 0.02905)
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
        if nb.available():
            return nb.est_lit(data, None, half, False, 0.029)
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


def _context_distance_costs(cmds, dist_alpha, beta: float = 32.0):
    """[4, alpha] distance symbol costs conditioned on the RFC
    copy-length distance context, from the previous parse (the real
    coder clusters distance histograms over these contexts; a single
    global table misprices short-copy distances)."""
    mask = (cmds.copy_len > 0) & ~C.CMD_IMPLICIT_DIST0[cmds.cmd_sym]
    ctx = C.distance_context_from_copy_len(cmds.copy_len[mask])
    h = np.zeros((4, dist_alpha), np.float64)
    np.add.at(h, (ctx, cmds.dist_code[mask]), 1.0)
    g = h.sum(axis=0)
    gp = g / max(g.sum(), 1.0)
    p = (h + beta * gp[None, :] + 1e-12) / (h.sum(axis=1)[:, None] + beta)
    return np.maximum(-np.log2(p), 1.0)


def _context_literal_costs(data_region, full, dict_len, cmds,
                           mode: int = 2, alpha: float = 64.0,
                           bias: float = 0.4):
    """Per-position literal bit cost conditioned on the RFC literal
    context (lut0[p1] | lut1[p2]), from the previous parse's literals.

    The final coder codes literals in context-clustered trees, so a
    global literal histogram overprices them by ~0.5-1 bit each — which
    biases the DP toward marginal short copies.  (The reference's
    Zopfli shares that bias; this is a deliberate improvement over
    hq.rs:1076.)  Counts are smoothed toward the global distribution to
    approximate the coder's context clustering."""
    n_cmd = len(cmds.insert_len)
    step = cmds.insert_len + cmds.copy_advance
    cmd_start = np.zeros(n_cmd, np.int64)
    np.cumsum(step[:-1], out=cmd_start[1:])
    total = int(cmds.insert_len.sum())
    lut0, lut1 = C.CONTEXT_LUT0[mode], C.CONTEXT_LUT1[mode]
    hist = np.zeros((64, 256), np.float64)
    if total:
        owner = np.repeat(np.arange(n_cmd), cmds.insert_len)
        run_off = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(cmds.insert_len)[:-1]]),
            cmds.insert_len)
        lpos = cmd_start[owner] + run_off
        absd = dict_len + lpos
        p1 = np.where(absd >= 1, full[np.maximum(absd - 1, 0)], 0)
        p2 = np.where(absd >= 2, full[np.maximum(absd - 2, 0)], 0)
        ctx = lut0[p1] | lut1[p2]
        np.add.at(hist, (ctx, data_region[lpos]), 1.0)
    ctx_tot = hist.sum(axis=1)
    g = hist.sum(axis=0)
    g = g / max(g.sum(), 1.0)
    p = (hist + alpha * g[None, :] + 1e-9) / (ctx_tot[:, None] + alpha)
    cost_tab = np.maximum(-np.log2(p), 1.0)
    idx = dict_len + np.arange(len(data_region))
    p1a = np.where(idx >= 1, full[np.maximum(idx - 1, 0)], 0)
    p2a = np.where(idx >= 2, full[np.maximum(idx - 2, 0)], 0)
    ctx_all = lut0[p1a] | lut1[p2a]
    # the flat bias prices the per-literal share of costs outside the
    # model (context-tree descriptions, context-map and block-switch
    # overhead grow with literal-tree usage); tuned empirically
    return cost_tab[ctx_all, data_region] + bias


def _histograms_from_commands(data, cmds, dist_alpha):
    from .bitstream import extract_literals
    lits = extract_literals(data, 0, cmds)
    lit_hist = np.bincount(lits, minlength=256)
    cmd_hist = np.bincount(cmds.cmd_sym, minlength=704)
    mask = (cmds.copy_len > 0) & ~C.CMD_IMPLICIT_DIST0[cmds.cmd_sym]
    dist_hist = np.bincount(cmds.dist_code[mask], minlength=dist_alpha)
    return lit_hist, cmd_hist, dist_hist


def _prepare_edges(cand_lens, cand_dists, cand_isdict, cand_wire,
                   dist_params, n, extra=None):
    """One-time vectorized edge construction: per match candidate, the
    full length plus a geometric ladder of shorter lengths (dictionary
    matches keep only the exact word length).  Cost-independent — the
    per-iteration cost model only re-prices via _price_edges.  Returns
    edges grouped by source position."""
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
        srcs = extra if isinstance(extra, list) else [extra]
        pp = np.concatenate([pp] + [s[0] for s in srcs])
        L = np.concatenate([L] + [s[1] for s in srcs])
        D = np.concatenate([D] + [s[2] for s in srcs])
        ISD = np.concatenate([ISD] + [s[3] for s in srcs])
        W = np.concatenate([W] + [s[4] for s in srcs])
    # dedupe (p, d) pairs keeping the longest
    order = np.lexsort((-L, D, pp))
    pp, L, D, ISD, W = (pp[order], L[order], D[order], ISD[order],
                        W[order])
    keep = np.ones(len(pp), bool)
    keep[1:] = (pp[1:] != pp[:-1]) | (D[1:] != D[:-1])
    pp, L, D, ISD, W = pp[keep], L[keep], D[keep], ISD[keep], W[keep]

    # cap candidates per position (longest first; window and dictionary
    # budgeted separately) — bounds edge count on repetitive input
    # where the collector emits its full per-position quota everywhere
    ordc = np.lexsort((-L, ISD, pp))
    pp, L, D, ISD, W = (pp[ordc], L[ordc], D[ordc], ISD[ordc], W[ordc])
    key = pp * 2 + ISD
    rank = np.arange(len(key)) - np.searchsorted(key, key, side="left")
    keepc = rank < np.where(ISD, 4, 12)
    pp, L, D, ISD, W, rank = (pp[keepc], L[keepc], D[keepc], ISD[keepc],
                              W[keepc], rank[keepc])
    # only the 4 longest window candidates per position get the full
    # sub-length ladder; shorter runners-up contribute their exact
    # length only (their sub-lengths are dominated by the longer
    # candidates' ladders at nearly identical cost)
    laddered = ~ISD & (rank < 4)

    # distance symbol / extra-bit split (cost-independent)
    sym_a = np.zeros(len(pp), np.int64)
    nbits_a = np.zeros(len(pp), np.int64)
    direct = D <= ndirect
    if direct.any():
        sym_a[direct] = 15 + D[direct]
    far = ~direct
    if far.any():
        sym, extra_v, nbits = C.encode_distance(D[far], npostfix,
                                                ndirect)
        sym_a[far] = sym
        nbits_a[far] = nbits

    # length ladder as one candidate-major matrix: col 0 = exact
    # length, cols 1-2 = l-1 / l-2, remaining cols = fixed sub-lengths
    # (dictionary words cannot be shortened — copy_len selects the
    # word).  Candidate-major keeps edges grouped by (sorted) source
    # position, so no final sort is needed.
    subs = np.array((4, 5, 6, 8, 10, 13, 16, 22, 32, 48, 64, 96, 128,
                     192), dtype=np.int32)
    ai = np.nonzero(laddered)[0]
    LA = L[ai].astype(np.int32)
    MA = np.zeros((len(ai), 2 + len(subs)), np.int32)
    MA[:, 0] = np.where(LA > 4, LA - 1, 0)
    MA[:, 1] = np.where(LA > 5, LA - 2, 0)
    MA[:, 2:] = np.where(LA[:, None] > subs[None, :], subs[None, :], 0)
    ciA, _ = np.nonzero(MA >= 2)
    lenA = MA[MA >= 2].astype(np.int64)
    ciA = ai[ciA]
    # exact-length edges for every candidate + sub-length edges for the
    # laddered subset
    ci = np.concatenate([np.arange(len(pp)), ciA])
    e_len = np.concatenate([L, lenA])
    e_wire = np.concatenate([W, lenA])
    src = pp[ci]
    order = np.argsort(src, kind="stable")
    src = src[order]
    ci = ci[order]
    e_len = e_len[order]
    e_wire = e_wire[order]
    e_dist = D[ci]
    e_ccode = _COPY_CODE[np.minimum(e_wire, (1 << 16) - 1)]
    e_sym = sym_a[ci]
    e_nbits = nbits_a[ci]
    e_dctx = np.maximum(np.minimum(e_wire, 5) - 2, 0)
    edge_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(src, minlength=n), out=edge_off[1:])
    return (edge_off, e_len, e_wire, e_dist, e_ccode, e_sym, e_nbits,
            e_dctx)


def _price_edges(prepared, cost_dist):
    """Per-iteration pricing of prepared edges: dist symbol cost (+ the
    copy-length distance context when cost_dist is [4, alpha]) + dist
    and copy extra bits."""
    (edge_off, e_len, e_wire, e_dist, e_ccode, e_sym, e_nbits,
     e_dctx) = prepared
    cost_dist = np.asarray(cost_dist)
    if cost_dist.ndim == 2:
        e_dcost = cost_dist[e_dctx, e_sym] + e_nbits
    else:
        e_dcost = cost_dist[e_sym] + e_nbits
    e_base = e_dcost + C.COPY_EXTRA[e_ccode]
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
        return _finish_parse(n, lcp, cost, prev_start, prev_len,
                             prev_wire, prev_dist)

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


def _finish_parse(n, lcp, cost, prev_start, prev_len, prev_wire,
                  prev_dist):
    """Scan for the cheapest stream close (vectorized) and backtrack
    (shared by the edge-list and candidate-list native DPs)."""
    from .. import native_bridge as nb
    if nb.available():
        import ctypes
        lib = nb.get_lib()
        lcp_a = np.ascontiguousarray(lcp, np.float64)
        cost_a = np.ascontiguousarray(cost, np.float64)
        ps = np.ascontiguousarray(prev_start, np.int64)
        pl = np.ascontiguousarray(prev_len, np.int64)
        pw = np.ascontiguousarray(prev_wire, np.int64)
        pd = np.ascontiguousarray(prev_dist, np.int64)
        cap = n + 2
        oi = np.empty(cap, np.int64)
        oc = np.empty(cap, np.int64)
        od = np.empty(cap, np.int64)
        oa = np.empty(cap, np.int64)
        I64 = ctypes.POINTER(ctypes.c_int64)
        F64 = ctypes.POINTER(ctypes.c_double)
        cnt = lib.zopfli_backtrack_native(
            ctypes.c_int64(n), lcp_a.ctypes.data_as(F64),
            cost_a.ctypes.data_as(F64), ps.ctypes.data_as(I64),
            pl.ctypes.data_as(I64), pw.ctypes.data_as(I64),
            pd.ctypes.data_as(I64), oi.ctypes.data_as(I64),
            oc.ctypes.data_as(I64), od.ctypes.data_as(I64),
            oa.ctypes.data_as(I64))
        return (oi[:cnt], oc[:cnt], od[:cnt], oa[:cnt])
    cost = np.asarray(cost)
    lcp = np.asarray(lcp)
    adj = np.where(cost[:n] < 1e29, cost[:n] - lcp[:n], np.inf)
    best_u = int(np.argmin(adj)) if n else 0
    best_adj = float(adj[best_u]) if n else INF
    # backtrack walks the path only (command count, not n) so direct
    # array indexing is fine
    end_from_u = best_adj + float(lcp[n])
    ins, cps, dst, adv = [], [], [], []
    pos = n
    if cost[n] >= 1e29 or end_from_u < cost[n]:
        ins.append(n - best_u)
        cps.append(0)
        dst.append(0)
        adv.append(0)
        pos = best_u
    while pos > 0:
        u = int(prev_start[pos])
        l = int(prev_len[pos])
        ins.append(pos - l - u)
        cps.append(int(prev_wire[pos]))
        dst.append(int(prev_dist[pos]))
        adv.append(l)
        pos = u
    ins.reverse()
    cps.reverse()
    dst.reverse()
    adv.reverse()
    return ins, cps, dst, adv


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


_collect_toggle = __import__("threading").local()


def _collect_candidates(full, window_size, dict_len, literal_byte_score,
                        use_dictionary, fast=False):
    """Per-position candidate rows: deep hash-4, deep hash-8, dict.
    The three table passes are independent native calls (ctypes drops
    the GIL) with small rings (16MB deep / 2MB shallow — unlike the
    q11 dense-ring passes whose ~200MB working sets thrash the LLC
    when overlapped), so they run on a 3-thread pool: measured 1.9x
    on the 9.5-tier collection on a 4-vCPU host.

    fast (the single-iteration q10/9.5 default): a k=32 deep table and
    no second shallow pass — measured +0.3% size for ~1.5x collection
    speed on the 512K text+code slice."""
    from concurrent.futures import ThreadPoolExecutor

    from .. import native_bridge as nb
    outs = []
    if nb.available():
        deep_k = 32 if fast else 64

        def deep():
            # deep table with runner-up (2 diverse rows from one pass);
            # miss_economy backs the scan depth off over matchless
            # spans (collection-only knob: rows lost there are empty
            # anyway — size A/B'd on the mixed 512K slice)
            return nb.find_best_matches(
                full, window_size, dict_len=dict_len,
                literal_byte_score=literal_byte_score,
                k=deep_k, bucket_bits=15, k8=0, use_dictionary=False,
                want_top2=True, miss_economy=True)

        def shallow(kw):
            return find_best_matches(
                full, window_size, dict_len=dict_len,
                literal_byte_score=literal_byte_score, **kw)

        shallow_kws = (dict(k=1, bucket_bits=17, k8=16,
                            use_dictionary=use_dictionary,
                            miss_economy=True),) \
            if fast else \
            (dict(k=12, bucket_bits=14, k8=0, use_dictionary=False),
             dict(k=1, bucket_bits=17, k8=24,
                  use_dictionary=use_dictionary))
        with ThreadPoolExecutor(max_workers=3) as ex:
            futs = [ex.submit(deep)] + [ex.submit(shallow, kw)
                                        for kw in shallow_kws]
            bl, bd, bs, isd, bw, b2l, b2d = futs[0].result()
            outs.append((bl, bd, isd, bw))
            outs.append((b2l, b2d, np.zeros(len(b2l), bool), b2l))
            for f in futs[1:]:
                bl, bd, bs, isd, bw = f.result()
                outs.append((bl, bd, isd, bw))
        # assemble into pooled row matrices: np.stack allocates ~67MB
        # of fresh pages per 512K segment and was 40% of the fast
        # tier's wall clock (page faults, not copying).  DOUBLE
        # buffered: all collects run serially (one prefetch worker),
        # and segment g's rows are read by its DP while collect(g+1)
        # runs — buffer A is only rewritten at collect(g+2), after
        # DP(g) finished (prefetch depth is 1).
        #
        # INVARIANT (load-bearing): the returned cand_dists/cand_isdict
        # are LIVE VIEWS into this 2-slot toggled scratch (only
        # lens/wire are copied by zopfli_collect, which mutates them).
        # Correctness requires collection prefetch depth EXACTLY 1:
        # a caller that ever holds two pending collects, or reads a
        # collect's rows after two further collects, silently corrupts
        # candidate distances.  encoder.py's zopfli loop guarantees
        # this by construction (a single `zopfli_pending` future,
        # .result() before the next submit); keep it that way or copy
        # the rows here.
        from .. import native_bridge as _nb
        t = _collect_toggle.__dict__["v"] = \
            1 - _collect_toggle.__dict__.get("v", 0)
        m, n_ = len(outs), len(outs[0][0])
        cand_lens = _nb._scratch(f"zc_lens{t}", m * n_,
                                 np.int64).reshape(m, n_)
        cand_dists = _nb._scratch(f"zc_dists{t}", m * n_,
                                  np.int64).reshape(m, n_)
        cand_isdict = _nb._scratch(f"zc_isd{t}", m * n_,
                                   np.bool_).reshape(m, n_)
        cand_wire = _nb._scratch(f"zc_wire{t}", m * n_,
                                 np.int64).reshape(m, n_)
        for r, (rl, rd, ri, rw) in enumerate(outs):
            cand_lens[r] = rl
            cand_dists[r] = rd
            cand_isdict[r] = ri
            cand_wire[r] = rw
        return cand_lens, cand_dists, cand_isdict, cand_wire
    else:
        bl, bd, bs, isd, bw = find_best_matches(
            full, window_size, dict_len=dict_len,
            literal_byte_score=literal_byte_score,
            k=64, bucket_bits=15, k8=0, use_dictionary=False)
        outs.append((bl, bd, isd, bw))
        for kw in (dict(k=12, bucket_bits=14, k8=0,
                        use_dictionary=False),
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
    # (pure-Python fallback keeps the simple stack)


def zopfli_collect(full: np.ndarray, params, dict_len: int = 0,
                   iters=None):
    """Cache-independent candidate collection for one region: the deep
    all-matches rings (or the 9.5 tier's top-K rows), the exact
    dictionary candidates, and the literal-cost estimate.  Split from
    zopfli_segment so callers can prefetch metablock g+1's collection
    while metablock g's DP runs (the collection never depends on the
    rolling distance cache)."""
    n = len(full) - dict_len
    window_size = params.window_size
    if iters is None:
        iters = Q11_ITERS if params.quality >= 11 else 2
    use_prior = params.quality >= 10 and iters > 1

    from .. import native_bridge as nb
    # the candidate passes (deep all-matches collection, dictionary
    # probe, literal-cost estimate) run SEQUENTIALLY: each streams a
    # large working set (the ~200MB match rings, the 1.4M-entry sorted
    # dictionary index), and overlapping them on host threads thrashes
    # the shared LLC — measured 2-6x slower in wall time than
    # back-to-back on a 4-vCPU host (the old pooled version cost q11
    # alice ~0.5s of pure contention)
    cm = cd = el = None
    if nb.available():
        if use_prior:
            # deep rings (the domination filter makes extra probes one
            # byte-compare each), H10-grade coverage without the rows.
            # The whole refining family (q10 and q11) runs on these;
            # the single-iteration 9.5 tier keeps the scored top-K
            # rows, whose greedy pre-pass seeds its histograms
            cm = nb.collect_matches(full, window_size,
                                    dict_len=dict_len,
                                    k=96, k8=48, max_per_pos=16)
        fut_cd = None
        if params.quality >= 10 and not params.catable:
            # the whole optimal-parse family prices exact dictionary
            # candidates (reference hq.rs feeds Zopfli dict matches at
            # q10+ too; dropping them from the fast tier was measured
            # at +2.8% size on alice — they stay).  On the fast tier
            # it overlaps the row scans below (independent inputs; the
            # q11 tier keeps it serial — its dense-ring pass already
            # saturates the LLC, the round-2 measurement)
            from .static_dict import (collect_dict_matches,
                                      sorted_dict_index)
            sorted_dict_index()  # warm the lru_cache serially
            if use_prior:
                cd = collect_dict_matches(full, dict_len, window_size)
            else:
                from concurrent.futures import ThreadPoolExecutor
                _cd_ex = ThreadPoolExecutor(max_workers=1)
                fut_cd = _cd_ex.submit(collect_dict_matches, full,
                                       dict_len, window_size)
                _cd_ex.shutdown(wait=False)
        el = estimate_literal_costs(full[dict_len:])
    # q10/q11 take ALL their window candidates from the deep
    # all-matches collection (k=96 ring + k8=48 long ring,
    # increasing-length filtered); the per-position top-K rows only
    # back the 9.5 tier, whose single-iteration parse leans on the
    # scored best rows
    need_rows = cm is None
    if need_rows:
        # find_best_matches already returns region-relative arrays
        # (index 0 == absolute position dict_len)
        (cand_lens, cand_dists, cand_isdict,
         cand_wire) = _collect_candidates(
            full, window_size, dict_len, params.literal_byte_score,
            not params.catable, fast=True)
        cand_lens = cand_lens.copy()
        cand_wire = cand_wire.copy()
        # exact lengths for cap-hit matches, with amortized skipping:
        # inside a span already covered by a longer extended match, the
        # capped edge is kept as-is (the long edge from the span start
        # dominates), which bounds total extension work to O(n) on runs
        # like 'aaaa...'
        hits = np.argwhere((cand_lens >= MATCH_CAP) & ~cand_isdict)
        hits = hits[np.argsort(hits[:, 1], kind="stable")]
        if len(hits) and nb.available():
            hc, hp = hits[:, 0], hits[:, 1]
            ext = nb.extend_caps(full, dict_len, hp,
                                 cand_dists[hc, hp], cand_lens[hc, hp])
            cand_lens[hc, hp] = ext
            cand_wire[hc, hp] = ext
        else:
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
    else:
        cand_lens = np.zeros((0, n), dtype=np.int64)
        cand_dists = np.zeros((0, n), dtype=np.int64)
        cand_isdict = np.zeros((0, n), dtype=bool)
        cand_wire = np.zeros((0, n), dtype=np.int64)

    if nb.available() and fut_cd is not None:
        cd = fut_cd.result()
    extra = None
    if params.quality >= 10:
        xs = []
        if cm is not None:
            mp, ml, md = cm
            xs.append((mp, ml, md, np.zeros(len(mp), bool), ml))
        if not params.catable and cd is not None:
            dp_, dl_, dd_, dw_ = cd
            xs.append((dp_, dl_, dd_, np.ones(len(dp_), bool), dw_))
        if xs:
            # passed as separate sources: the dense prep k-way merges
            # the sorted runs natively, no concatenated copy
            extra = xs
    lit_costs = (el if el is not None
                 else estimate_literal_costs(full[dict_len:]))
    return dict(cand_lens=cand_lens, cand_dists=cand_dists,
                cand_isdict=cand_isdict, cand_wire=cand_wire,
                extra=extra, lit_costs=lit_costs)


_OVERLAP_SEED_FRAC = float(os.environ.get(
    "BROTLI_TPU_OVERLAP_SEED_FRAC", "0.5"))


def _zopfli_segment_fast_overlapped(full: np.ndarray, params,
                                    initial_cache):
    """Single-iteration (fast-tier) zopfli with the collection and the
    DP overlapped inside one metablock: the three candidate passes run
    on worker threads publishing per-position progress marks, and the
    main thread chases them with chunked dense-prep + chunked DP
    (native range entry points carry the offset/queue state across
    chunks).  The iteration-0 cost model is seeded from the greedy
    pre-pass over the first SEED_FRAC of the rows — measured
    size-neutral on the bench corpora (the histograms converge well
    before half the block) — so the DP can start before collection
    finishes.  Requires dict_len == 0 (the pooled row matrices are
    region-width); multi-metablock streams keep the cross-metablock
    prefetch pipeline instead.  Wall win on a 4-core host: the fast
    tier's deep pass (~0.17 s/512K) disappears behind the DP.

    Reference bar: BrotliCreateZopfliBackwardReferences (hq.rs:984)
    with the collection/DP phases overlapped; candidate and parse
    SEMANTICS are unchanged (same rows, same extension, same DP)."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    from .. import native_bridge as nb
    from .command import resolve_commands

    n = len(full)
    window_size = params.window_size
    dist_alpha = params.dist.alphabet_size
    lbs = params.literal_byte_score
    use_dict = not params.catable

    t = _collect_toggle.__dict__["v"] = \
        1 - _collect_toggle.__dict__.get("v", 0)
    m_rows = 3
    lens = nb._scratch(f"zco_lens{t}", m_rows * n,
                       np.int64).reshape(m_rows, n)
    dists = nb._scratch(f"zco_dists{t}", m_rows * n,
                        np.int64).reshape(m_rows, n)
    isd = nb._scratch(f"zco_isd{t}", m_rows * n,
                      np.uint8).reshape(m_rows, n)
    wire = nb._scratch(f"zco_wire{t}", m_rows * n,
                       np.int64).reshape(m_rows, n)
    score0 = nb._scratch(f"zco_sc0{t}", n, np.int64)
    score2 = nb._scratch(f"zco_sc2{t}", n, np.int64)
    isd[0] = 0
    isd[1] = 0
    prog_deep = np.zeros(1, np.int64)
    prog_shal = np.zeros(1, np.int64)
    prog_dict = np.zeros(2, np.int64)
    dict_cap = 6 * n + 64
    dcp = nb._scratch(f"zco_dcp{t}", dict_cap, np.int64)
    dcl = nb._scratch(f"zco_dcl{t}", dict_cap, np.int64)
    dcd = nb._scratch(f"zco_dcd{t}", dict_cap, np.int64)
    dcw = nb._scratch(f"zco_dcw{t}", dict_cap, np.int64)
    dci = nb._scratch(f"zco_dci{t}", dict_cap, np.uint8)

    def deep():
        return nb.find_best_matches(
            full, window_size, dict_len=0, literal_byte_score=lbs,
            k=32, bucket_bits=15, k8=0, use_dictionary=False,
            want_top2=True, miss_economy=True,
            out=(lens[0], dists[0], score0, isd[0], wire[0],
                 lens[1], dists[1]),
            progress=prog_deep)

    def shallow():
        return nb.find_best_matches(
            full, window_size, dict_len=0, literal_byte_score=lbs,
            k=1, bucket_bits=17, k8=16, use_dictionary=use_dict,
            miss_economy=True,
            out=(lens[2], dists[2], score2, isd[2], wire[2],
                 None, None),
            progress=prog_shal)

    def dict_pass():
        if not use_dict:
            prog_dict[0] = n
            return 0
        from .static_dict import collect_dict_matches, \
            sorted_dict_index
        sorted_dict_index()
        r = collect_dict_matches(full, 0, window_size,
                                 progress=prog_dict,
                                 out=(dcp, dcl, dcd, dcw))
        if r is None:
            return -1  # capacity overflow: caller falls back
        return len(r[0])

    ex = ThreadPoolExecutor(max_workers=3)
    fut_deep = ex.submit(deep)
    fut_shal = ex.submit(shallow)
    fut_dict = ex.submit(dict_pass)
    ex.shutdown(wait=False)

    try:
        lit_costs = estimate_literal_costs(full)
        lcp = np.concatenate([[0.0], np.cumsum(lit_costs)])

        def wait_cover(hi):
            """Block until every collector's rows cover [0, hi)."""
            while True:
                pd = int(prog_deep[0])
                ps = int(prog_shal[0])
                pq = int(prog_dict[0])
                if min(pd, ps, pq) >= hi:
                    return
                # surface worker exceptions instead of spinning
                for f in (fut_deep, fut_shal, fut_dict):
                    if f.done():
                        f.result()
                _time.sleep(2e-4)

        half = max(1 << 16, int(n * _OVERLAP_SEED_FRAC))
        half = min(half, n)
        wait_cover(half)
        ext_state = np.full(1, -1, np.int64)

        def extend_chunk(lo, hi):
            # row 1 (deep runner-up) wire = its length, like the
            # serial assembly's outs[1] = (b2l, b2d, zeros, b2l)
            wire[1, lo:hi] = lens[1, lo:hi]
            sub_l = lens[:, lo:hi]
            sub_i = isd[:, lo:hi]
            hits = np.argwhere((sub_l >= MATCH_CAP) & (sub_i == 0))
            if len(hits) == 0:
                return
            hits = hits[np.argsort(hits[:, 1], kind="stable")]
            hc, hp = hits[:, 0], hits[:, 1] + lo
            ext = nb.extend_caps_range(full, 0, hp,
                                       dists[hc, hp], lens[hc, hp],
                                       ext_state)
            lens[hc, hp] = ext
            wire[hc, hp] = ext

        extend_chunk(0, half)
        flat = np.argmax(lens[:, :half], axis=0)
        ar = np.arange(half)
        bl = lens[flat, ar]
        bd = dists[flat, ar]
        bs = np.where(bl >= 4, 135 * bl - 30 * np.log2(
            np.maximum(bd, 2)).astype(np.int64), 0)
        bwire = wire[flat, ar]
        bisd = isd[flat, ar].astype(bool)
        pre = greedy_parse(full[:half], bl, bd, bs, [half],
                           dict_len=0, pos0=0,
                           initial_cache=initial_cache,
                           window_size=window_size, best_isdict=bisd,
                           best_wire=bwire)
        p_ins, p_cps, p_dst, p_adv = pre[0]
        pre_cmds, _ = resolve_commands(p_ins, p_cps, p_dst,
                                       params.dist, advance=p_adv,
                                       initial_cache=list(
                                           initial_cache),
                                       pos_offset=0,
                                       window_size=window_size)
        lh, ch, dh = _histograms_from_commands(full[:half], pre_cmds,
                                               dist_alpha)
        cost_lit, cost_cmd, cost_dist = _cost_tables(lh, ch, dh)
        cost_cmd = cost_cmd + float(os.environ.get(
            "BROTLI_TPU_CMD_BIAS", "0"))
        cds = cost_dist[:16].copy()
        cd4 = np.tile(cost_dist, (4, 1))
        lcp64 = np.ascontiguousarray(lcp, np.float64)
        cost_cmd = np.ascontiguousarray(cost_cmd, np.float64)

        cand_off = nb._scratch("zco_off", n + 1, np.int64)
        cand_off[0] = 0
        packed = nb._scratch("zco_packed", 2 * n + 64,
                             nb.ZCAND_DTYPE)
        qstate = np.zeros(18, np.int64)
        # the chunked DP's cross-chunk state must live in buffers WE
        # hold: _scratch returns a fresh buffer when a request
        # exceeds its pooling cap (node_cache does at a 4 MiB
        # metablock), which would reset the state between chunks
        dp_state = (np.empty(n + 1, np.float32),
                    np.empty(n + 1, np.int32),
                    np.empty(n + 1, np.int32),
                    np.empty(n + 1, np.int32),
                    np.empty(n + 1, np.int32),
                    np.empty(4 * (n + 1), np.int32))
        chunk = 1 << 16
        n_starts = min(_FINAL_STARTS, 4)
        done = 0
        ym_done = 0
        result_arrays = None
        while done < n:
            hi = min(done + chunk, n)
            wait_cover(hi)
            if hi > half:
                # [0, half) was extended before the seed
                extend_chunk(max(done, half), hi)
            dci_ones = dci
            # dict entries emitted so far cover every pos < prog_dict
            ym = int(prog_dict[1])
            if len(dci_ones) and ym > ym_done:
                dci_ones[ym_done:ym] = 1
                ym_done = ym
            need = int(cand_off[done]) + \
                int((lens[:, done:hi] >= 2).sum()) + (ym - 0)
            if need > len(packed):
                grown = np.empty(max(need + 1024, 2 * len(packed)),
                                 nb.ZCAND_DTYPE)
                grown[:int(cand_off[done])] = \
                    packed[:int(cand_off[done])]
                packed = grown
            nb.zopfli_cands_dense_range(
                lens, dists, isd, wire, (dcp, dcl, dcd, dci, dcw),
                ym, n, params.dist.npostfix, params.dist.ndirect,
                cand_off, packed, done, hi)
            result_arrays = nb.zopfli_dp_cands(
                n, lcp64, cost_cmd, cds, cd4, (cand_off, packed),
                _INS_CODE, C.INSERT_EXTRA, _CMD_SYM.reshape(-1),
                _CMD_SYM_LAST.reshape(-1), full, 0, window_size,
                np.asarray(initial_cache, dtype=np.int64),
                n_starts=n_starts, cand_cap=_FAST_CAND_CAP,
                max_zopfli_len=150 if params.quality <= 10 else 325,
                p_range=(done, hi), qstate=qstate,
                state_bufs=dp_state)
            done = hi
        fut_deep.result()
        fut_shal.result()
        if fut_dict.result() < 0:
            return None  # dict buffer overflow: serial fallback
        cost, ps_, pl_, pw_, pd_ = result_arrays
        return _finish_parse(n, lcp, cost, ps_, pl_, pw_, pd_)
    except Exception:
        # any failure degrades to the serial path; the workers hold
        # only views into pooled scratch
        for f in (fut_deep, fut_shal, fut_dict):
            try:
                f.result()
            except Exception:
                pass
        raise


def zopfli_segment(full: np.ndarray, params, dict_len: int = 0,
                   initial_cache=(4, 11, 15, 16), iters=None,
                   precollected=None):
    """q9.5/q10/q11 command generation for one region with cost-model
    refinement (iters: 1 for the 9.5 tier, 2 for q10, Q11_ITERS with a
    convergence stop for q11).  Returns (ins[], cps[], dst[]).

    precollected: output of zopfli_collect for this exact region
    (callers prefetch it one metablock ahead)."""
    from .command import resolve_commands

    n = len(full) - dict_len
    window_size = params.window_size
    dist_alpha = params.dist.alphabet_size
    if iters is None:
        iters = Q11_ITERS if params.quality >= 11 else 2
    # a single-iteration run (the 9.5 tier) needs the histogram seed:
    # the gentle prior is only right when refinement follows
    use_prior = params.quality >= 10 and iters > 1

    from .. import native_bridge as nb
    if (precollected is None and dict_len == 0 and iters == 1
            and nb.available() and n >= (1 << 18)
            and not os.environ.get("BROTLI_TPU_NO_OVERLAP")):
        # single-iteration fast tier, single metablock: overlap the
        # collection with a chunk-chasing DP (the cross-metablock
        # prefetch pipeline can't help here)
        try:
            r = _zopfli_segment_fast_overlapped(full, params,
                                                initial_cache)
            if r is not None:
                return r
        except Exception:
            pass  # serial fallback below
    col = precollected if precollected is not None else zopfli_collect(
        full, params, dict_len, iters=iters)
    cand_lens = col["cand_lens"]
    cand_dists = col["cand_dists"]
    cand_isdict = col["cand_isdict"]
    cand_wire = col["cand_wire"]
    extra = col["extra"]
    lit_costs = col["lit_costs"]

    lh = ch = dh = None
    if not use_prior:
        # greedy pre-pass for the iteration-0 cost model (q11 uses the
        # reference prior instead)
        flat = np.argmax(cand_lens, axis=0)
        ar = np.arange(n)
        bl = cand_lens[flat, ar]
        bd = cand_dists[flat, ar]
        bs = np.where(bl >= 4, 135 * bl - 30 * np.log2(
            np.maximum(bd, 2)).astype(np.int64), 0)
        bwire = cand_wire[flat, ar]
        bisd = cand_isdict[flat, ar]
        pre = greedy_parse(full, bl, bd, bs, [n], dict_len=dict_len,
                           pos0=0, initial_cache=initial_cache,
                           window_size=window_size, best_isdict=bisd,
                           best_wire=bwire)
        p_ins, p_cps, p_dst, p_adv = pre[0]
        pre_cmds, _ = resolve_commands(p_ins, p_cps, p_dst, params.dist,
                                       advance=p_adv,
                                       initial_cache=list(initial_cache),
                                       pos_offset=dict_len,
                                       window_size=window_size)
    data_region = full[dict_len:]
    lcp = np.concatenate([[0.0], np.cumsum(lit_costs)])

    if not use_prior:
        lh, ch, dh = _histograms_from_commands(data_region, pre_cmds,
                                               dist_alpha)
    result = None
    prepared = None
    prev_end = None
    ctx_mode_seg = None  # computed lazily on first refinement iteration
    it = 0
    last_it = iters - 1  # index of the final (wide-queue) iteration
    while it <= last_it:
        if it == 0 and use_prior:
            # iteration-0 prior (reference set_from_literal_costs,
            # hq.rs:222): gentle index-graded costs — small command /
            # distance symbols cheap, large ones dear — with literal
            # costs from the position estimator.  A histogram seed from
            # a greedy pre-pass locks the parse into the pre-pass's
            # copy-heavy equilibrium.
            cost_cmd = np.log2(11.0 + np.arange(704))
            cost_dist = np.log2(20.0 + np.arange(dist_alpha,
                                                 dtype=np.float64))
        else:
            cost_lit, cost_cmd, cost_dist = _cost_tables(lh, ch, dh)
            cost_cmd = cost_cmd + float(os.environ.get(
                "BROTLI_TPU_CMD_BIAS", "0"))
            if it > 0:
                # iterations >= 1 price literals and distances from the
                # previous parse, context-conditioned (see
                # _context_literal_costs / _context_distance_costs).
                # The context family matches what the store will use
                # (UTF8 vs SIGNED LUTs — pricing binaries with text
                # contexts mispriced them by ~0.15%)
                if ctx_mode_seg is None:
                    from .metablock import choose_context_mode
                    ctx_mode_seg = choose_context_mode(
                        data_region, params.quality, params.mode)
                lc = _context_literal_costs(data_region, full, dict_len,
                                            prev_cmds,
                                            mode=ctx_mode_seg)
                lcp = np.concatenate([[0.0], np.cumsum(lc)])
                cost_dist = _context_distance_costs(prev_cmds,
                                                    dist_alpha)
        cds = (cost_dist[3, :16] if cost_dist.ndim == 2
               else cost_dist[:16]).copy()
        if os.environ.get("BROTLI_TPU_ZDEBUG"):
            global _DEBUG_MODEL
            _DEBUG_MODEL = dict(it=it, lcp=lcp.copy(),
                                cost_cmd=cost_cmd.copy(),
                                cost_dist=np.array(cost_dist))
        prev = result
        if nb.available():
            # native candidate path: one counting-sort/dedupe/cap pass,
            # then per-iteration DP with inline sub-length ladder — no
            # edge list is materialized or re-priced
            if prepared is None:
                prepared = nb.zopfli_cands_dense(
                    cand_lens, cand_dists, cand_isdict, cand_wire,
                    extra, n, params.dist.npostfix, params.dist.ndirect)
            if prepared is None:
                ci, ppr = np.nonzero(cand_lens >= 2)
                rp = [ppr]
                rl = [cand_lens[ci, ppr]]
                rd = [cand_dists[ci, ppr]]
                risd = [cand_isdict[ci, ppr]]
                rw = [cand_wire[ci, ppr]]
                if extra is not None:
                    for xp, xl, xd, xisd, xw in (
                            extra if isinstance(extra, list)
                            else [extra]):
                        rp.append(xp)
                        rl.append(xl)
                        rd.append(xd)
                        risd.append(xisd)
                        rw.append(xw)
                prepared = nb.zopfli_cands(
                    np.concatenate(rp), np.concatenate(rl),
                    np.concatenate(rd), np.concatenate(risd),
                    np.concatenate(rw), n, params.dist.npostfix,
                    params.dist.ndirect)
            cd4 = (cost_dist if cost_dist.ndim == 2
                   else np.tile(cost_dist, (4, 1)))
            # the wide insert-start queue (reference StartPosQueue)
            # only pays in the final iteration, once the cost model
            # has converged; earlier iterations run the 2-start DP
            cost, ps, pl, pw, pd = nb.zopfli_dp_cands(
                n, lcp, cost_cmd, cds, cd4, prepared, _INS_CODE,
                C.INSERT_EXTRA, _CMD_SYM.reshape(-1),
                _CMD_SYM_LAST.reshape(-1), full, dict_len, window_size,
                np.asarray(initial_cache, dtype=np.int64),
                # the single-iteration FAST tier (plain q10 / 9.5)
                # runs the narrow queue + 4 short-code probes: round-4
                # A/B on the 512K text+code slice measured +16% encode
                # speed for +0.11% size (0.9868 -> 0.9879 vs C); the
                # refining tiers (q10_deep/q11, tight size gates) keep
                # the wide queue
                n_starts=(min(_FINAL_STARTS, 4) if iters == 1
                          else _FINAL_STARTS) if it == last_it else 2,
                cand_cap=((_FAST_CAND_CAP if iters == 1 else 0)
                          if it == last_it else _EARLY_CAND_CAP),
                max_zopfli_len=150 if params.quality <= 10 else 325)
            end_cost = (min(float(cost[n]),
                            float((cost[:n] - lcp[:n]).min() + lcp[n]))
                        if n else 0.0)
            result = _finish_parse(n, lcp, cost, ps, pl, pw, pd)
        else:
            if prepared is None:
                prepared = _prepare_edges(cand_lens, cand_dists,
                                          cand_isdict, cand_wire,
                                          params.dist, n, extra=extra)
            edges = _price_edges(prepared, cost_dist)
            edges = edges + (cds, full, dict_len,
                             window_size, np.asarray(initial_cache,
                                                     dtype=np.int64))
            result = zopfli_parse(n, lcp, cost_cmd, edges)
            end_cost = None
        if prev is not None and all(
                len(a) == len(b) and np.array_equal(a, b)
                for a, b in zip(result, prev)):
            break
        if it < last_it:
            # cost-based convergence: when an iteration's model-priced
            # parse stops improving, promote the next iteration to the
            # wide final instead of running out the schedule
            if (end_cost is not None and prev_end is not None
                    and prev_end - end_cost <= 2e-4 * abs(end_cost)):
                last_it = it + 1
            prev_end = end_cost
            r_ins, r_cps, r_dst, r_adv = result
            cmds, _ = resolve_commands(r_ins, r_cps, r_dst, params.dist,
                                       advance=r_adv,
                                       initial_cache=list(initial_cache),
                                       pos_offset=dict_len,
                                       window_size=window_size)
            prev_cmds = cmds
            lh, ch, dh = _histograms_from_commands(data_region, cmds,
                                                   dist_alpha)
        it += 1
    return result
