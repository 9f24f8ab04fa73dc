"""Metablock optimization: block splitting, context modeling, histograms.

TPU-first reformulation of the reference's metablock pipeline
(src/enc/block_splitter.rs, metablock.rs, encode.rs context heuristics):

- Block splitting is chunked entropy clustering: per-chunk histograms,
  Lloyd iterations where the assignment step is a single
  [chunks, alphabet] x [alphabet, types] cost matmul (MXU shape), plus a
  hysteresis pass standing in for the reference's Viterbi FindBlocks
  switch-cost smoothing (block_splitter.rs:223).
- Literal context modeling mirrors the reference's static-map decision
  tree exactly: ChooseContextMode UTF8 detection (encode.rs:1357,
  utf8_util.rs), DecideOverLiteralContextModeling / ChooseContextMap /
  ShouldUseComplexStaticContextMap (encode.rs:1717-1930) with the same
  entropy thresholds and the same three static maps.
"""

from __future__ import annotations

import numpy as np

from ..core import constants as C

# Static literal context maps (reference encode.rs:1724-1800).
STATIC_CONTEXT_MAP_CONTINUATION = np.zeros(64, dtype=np.int64)
STATIC_CONTEXT_MAP_CONTINUATION[[0, 1]] = 1
STATIC_CONTEXT_MAP_CONTINUATION[[2, 3]] = 2

STATIC_CONTEXT_MAP_SIMPLE_UTF8 = np.zeros(64, dtype=np.int64)
STATIC_CONTEXT_MAP_SIMPLE_UTF8[[2, 3]] = 1

STATIC_CONTEXT_MAP_COMPLEX_UTF8 = np.array([
    11, 11, 12, 12, 0, 0, 0, 0, 1, 1, 9, 9, 2, 2, 2, 2,
    1, 1, 1, 1, 8, 3, 3, 3, 1, 1, 1, 1, 2, 2, 2, 2,
    8, 4, 4, 4, 8, 7, 4, 4, 8, 0, 0, 0, 3, 3, 3, 3,
    5, 5, 10, 5, 5, 5, 10, 5, 6, 6, 6, 6, 6, 6, 6, 6,
], dtype=np.int64)


def shannon_entropy(counts: np.ndarray) -> float:
    c = np.asarray(counts, dtype=np.float64)
    total = c.sum()
    if total == 0:
        return 0.0
    nz = c[c > 0]
    return float(total * np.log2(total) - np.sum(nz * np.log2(nz)))


def is_mostly_utf8(data: np.ndarray, min_fraction: float = 0.75) -> bool:
    """Fraction of bytes covered by valid UTF-8 sequences (reference
    BrotliIsMostlyUTF8, src/enc/utf8_util.rs).  Inputs over 64KB are
    sampled with contiguous 4KB blocks every 64KB (the decision is a
    coarse 0.75 threshold; full scans of multi-MB metablocks are
    measurable encode overhead)."""
    n = len(data)
    if n == 0:
        return True
    d = data
    if n > (1 << 16):
        pos = np.arange(0, n - 4095, 1 << 16, dtype=np.int64)
        d = d[pos[:, None] + np.arange(4096)[None, :]].ravel()
        n = len(d)
    size_utf8 = 0
    i = 0
    # Vectorized approximation of the sequential scan: classify each byte
    # as an ASCII char or a valid continuation of a 2/3-byte lead.
    ascii_mask = d < 0x80
    lead2 = (d >= 0xC2) & (d < 0xE0)
    lead3 = (d >= 0xE0) & (d < 0xF0)
    cont = (d >= 0x80) & (d < 0xC0)
    ok2 = np.zeros(n, dtype=bool)
    ok2[:-1] = lead2[:-1] & cont[1:]
    ok3 = np.zeros(n, dtype=bool)
    ok3[:-2] = lead3[:-2] & cont[1:-1] & cont[2:]
    size_utf8 = int(ascii_mask.sum()) + 2 * int(ok2.sum()) + 3 * int(ok3.sum())
    return size_utf8 > min_fraction * n


def choose_context_mode(data: np.ndarray, quality: int, mode: int) -> int:
    """Reference ChooseContextMode (encode.rs:1357): UTF8 when the input
    is mostly valid UTF-8, SIGNED otherwise; FONT mode forces SIGNED."""
    if mode == 2:  # MODE_FONT
        return C.CONTEXT_SIGNED
    if quality >= 4 and is_mostly_utf8(data):
        return C.CONTEXT_UTF8
    return C.CONTEXT_SIGNED


def _sampled_strides(data: np.ndarray, start: int, length: int):
    """64-byte strides every 4 KiB (the reference's sampling pattern),
    gathered as one [nsamp, 64] matrix."""
    end = start + length
    pos = np.arange(start, end - 63, 4096, dtype=np.int64)
    if len(pos) == 0:
        return np.zeros((0, 64), dtype=data.dtype)
    return data[pos[:, None] + np.arange(64)[None, :]]


def choose_literal_context_map(data: np.ndarray, start: int, length: int,
                               quality: int, size_hint: int):
    """Static literal context map decision (reference
    DecideOverLiteralContextModeling, encode.rs:1873-1930).

    Returns (num_contexts, context_map[64]) for UTF8 context mode.
    """
    one = (1, np.zeros(64, dtype=np.int64))
    if quality < 5 or length < 64:
        return one

    if size_hint >= (1 << 20):
        got = _should_use_complex_map(data, start, length)
        if got is not None:
            return got

    # Bigram prefix histogram over 3 classes of the top-2 bits
    # (reference ChooseContextMap, encode.rs:1717).
    lut = np.array([0, 0, 1, 2], dtype=np.int64)
    S = _sampled_strides(data, start, length)
    cls = lut[S >> 6]
    idx = cls[:, :-1] * 3 + cls[:, 1:]
    bigram = np.bincount(idx.ravel(), minlength=9)

    mono = np.zeros(3, dtype=np.int64)
    two_prefix = np.zeros(6, dtype=np.int64)
    for i in range(9):
        mono[i % 3] += bigram[i]
        two_prefix[i % 6] += bigram[i]
    total = int(mono.sum())
    if total == 0:
        return one
    e1 = shannon_entropy(mono) / total
    e2 = (shannon_entropy(two_prefix[:3]) +
          shannon_entropy(two_prefix[3:])) / total
    e3 = sum(shannon_entropy(bigram[3 * i:3 * i + 3]) for i in range(3)) \
        / total
    if quality < 7:
        e3 = e1 * 10.0
    if e1 - e2 < 0.2 and e1 - e3 < 0.2:
        return one
    if e2 - e3 < 0.02:
        return 2, STATIC_CONTEXT_MAP_SIMPLE_UTF8
    return 3, STATIC_CONTEXT_MAP_CONTINUATION


def _should_use_complex_map(data: np.ndarray, start: int, length: int):
    """Reference ShouldUseComplexStaticContextMap (encode.rs:1802-1871)."""
    lut0 = C.CONTEXT_LUT0[C.CONTEXT_UTF8]
    lut1 = C.CONTEXT_LUT1[C.CONTEXT_UTF8]
    S = _sampled_strides(data, start, length)
    p2 = S[:, :-2]
    p1 = S[:, 1:-1]
    lit = S[:, 2:]
    ctx = STATIC_CONTEXT_MAP_COMPLEX_UTF8[lut0[p1] | lut1[p2]]
    top5 = (lit >> 3).astype(np.int64)
    total = lit.size
    if total == 0:
        return None
    combined = np.bincount(top5.ravel(), minlength=32)
    context_histo = np.bincount((ctx * 32 + top5).ravel(),
                                minlength=13 * 32).reshape(13, 32)
    e1 = shannon_entropy(combined) / total
    e2 = sum(shannon_entropy(context_histo[i]) for i in range(13)) / total
    if e2 > 3.0 or e1 - e2 < 0.2:
        return None
    return 13, STATIC_CONTEXT_MAP_COMPLEX_UTF8


# ---------------------------------------------------------------------------
# Block splitting: chunked entropy clustering
# ---------------------------------------------------------------------------


class BlockSplit:
    """types[i] = block type of symbol i; blocks = [(type, length), ...]."""

    __slots__ = ("num_types", "types", "blocks")

    def __init__(self, num_types, types, blocks):
        self.num_types = num_types
        self.types = types
        self.blocks = blocks

    @classmethod
    def trivial(cls, n: int):
        return cls(1, np.zeros(n, dtype=np.int64), [(0, n)])


# Per-category tuning (reference block_splitter.rs:21-39: switch costs
# 28.1 / 13.5 / 14.6 bits, max types 100/50/50, min length 128).
SPLIT_PARAMS = {
    "literal": dict(chunk=256, max_types=32, switch_cost=28.1, min_run=3,
                    header_cost=320.0),
    "command": dict(chunk=128, max_types=16, switch_cost=13.5, min_run=3,
                    header_cost=500.0),
    "distance": dict(chunk=128, max_types=8, switch_cost=14.6, min_run=3,
                     header_cost=600.0),
}
MIN_LENGTH_FOR_SPLITTING = 128


def _entropy_cost(hist: np.ndarray) -> float:
    """Approximate bits to code `hist` with its own prefix code."""
    return shannon_entropy(hist)


def _entropy_rows(M: np.ndarray) -> np.ndarray:
    """Shannon bits per row of a histogram matrix (vectorized)."""
    s = M.sum(axis=-1)
    t = np.where(M > 0, M * np.log2(np.maximum(M, 1)), 0.0).sum(axis=-1)
    return np.where(s > 0, s * np.log2(np.maximum(s, 1)) - t, 0.0)


def _merge_types(assign: np.ndarray, hist: np.ndarray, k: int,
                 switch_cost: float, header_cost: float):
    """Greedy pairwise cluster merge while it reduces total cost
    (entropy + per-type header estimate), the analog of
    BrotliHistogramCombine (reference src/enc/cluster.rs:123).  The
    all-pairs merged entropies are computed as one [m, m, alpha]
    broadcast per round instead of a python pair loop."""
    cent = np.zeros((k, hist.shape[1]))
    np.add.at(cent, assign, hist)
    ids = np.unique(assign)
    C_ = cent[ids]
    while len(ids) > 1:
        m = len(ids)
        e = _entropy_rows(C_)
        pair = _entropy_rows(C_[:, None, :] + C_[None, :, :])
        delta = pair - e[:, None] - e[None, :] - header_cost
        iu = np.triu_indices(m, 1)
        flat = delta[iu]
        j = int(np.argmin(flat))
        if flat[j] >= 0.0:
            break
        a, b = int(iu[0][j]), int(iu[1][j])
        C_[a] += C_[b]
        assign = np.where(assign == ids[b], ids[a], assign)
        C_ = np.delete(C_, b, axis=0)
        ids = np.delete(ids, b)
    return assign


def split_symbols(syms: np.ndarray, alphabet_size: int, category: str,
                  iters: int = 3, max_types: int | None = None
                  ) -> BlockSplit:
    """Entropy-cluster a symbol stream into block types.

    Lloyd iterations: cost[chunk, type] = -hist_chunk · log2 p_type via
    one matmul; assignment hysteresis merges short runs (stand-in for the
    reference's switch-cost Viterbi, block_splitter.rs FindBlocks :223).

    max_types caps the cluster count below the category default (the
    literal store caps it at 256 // num_lit_ctx so block types x static
    contexts fit the 256-tree wire limit)."""
    p = SPLIT_PARAMS[category]
    if max_types is not None:
        p = dict(p, max_types=min(p["max_types"], max_types))
    n = len(syms)
    if n < MIN_LENGTH_FOR_SPLITTING:
        return BlockSplit.trivial(n)
    chunk = p["chunk"]
    nch = (n + chunk - 1) // chunk
    pad = nch * chunk - n
    padded = np.concatenate([syms, np.full(pad, -1, dtype=syms.dtype)])
    chunk_id = np.repeat(np.arange(nch), chunk)
    valid = padded >= 0
    flat = chunk_id[valid] * alphabet_size + padded[valid]
    hist = np.bincount(flat, minlength=nch * alphabet_size) \
        .reshape(nch, alphabet_size).astype(np.float64)

    k = int(min(p["max_types"], max(1, nch // 3), 256))
    if k <= 1:
        return BlockSplit.trivial(n)

    # init centroids from evenly spaced chunk groups
    seeds = np.linspace(0, nch, k + 1).astype(np.int64)
    cent = np.stack([hist[seeds[j]:max(seeds[j] + 1, seeds[j + 1])].sum(0)
                     for j in range(k)])

    assign = None
    for _ in range(iters):
        tot = cent.sum(axis=1, keepdims=True) + alphabet_size * 0.25
        logp = np.log2((cent + 0.25) / tot)            # [k, alphabet]
        cost = -(hist @ logp.T)                        # [nch, k]  (MXU shape)
        # amortized switch cost discourages fragmentation
        cost += p["switch_cost"] / max(1, chunk // 16)
        new_assign = cost.argmin(axis=1)
        new_assign = _hysteresis(new_assign, cost, p["min_run"])
        if assign is not None and np.array_equal(new_assign, assign):
            break
        assign = new_assign
        cent = np.zeros((k, alphabet_size))
        np.add.at(cent, assign, hist)
        # retire empty clusters (they keep their centroid; harmless)

    # agglomerative merge: only keep types that pay for their header
    assign = _merge_types(assign, hist, k, p["switch_cost"],
                          p["header_cost"])

    # compress type ids to used ones, first-appearance order with the
    # first block as type 0
    used, first_pos = np.unique(assign, return_index=True)
    order = used[np.argsort(first_pos)]
    remap = np.zeros(k, dtype=np.int64)
    remap[order] = np.arange(len(order))
    assign = remap[assign]
    num_types = len(order)
    if num_types == 1:
        return BlockSplit.trivial(n)

    types = np.repeat(assign, chunk)[:n]
    blocks = _runs(types)
    return BlockSplit(num_types, types, blocks)


def _hysteresis(assign: np.ndarray, cost: np.ndarray, min_run: int):
    """Absorb runs shorter than min_run into the cheaper neighbor."""
    out = assign.copy()
    nch = len(out)
    changed = True
    passes = 0
    while changed and passes < 4:
        changed = False
        passes += 1
        runs = _runs(out)
        pos = 0
        for ri, (t, ln) in enumerate(runs):
            if ln < min_run and len(runs) > 1:
                prev_t = runs[ri - 1][0] if ri > 0 else None
                next_t = runs[ri + 1][0] if ri + 1 < len(runs) else None
                sl = slice(pos, pos + ln)
                if prev_t is None:
                    new_t = next_t
                elif next_t is None:
                    new_t = prev_t
                else:
                    cp = cost[sl, prev_t].sum()
                    cn = cost[sl, next_t].sum()
                    new_t = prev_t if cp <= cn else next_t
                if new_t != t:
                    out[sl] = new_t
                    changed = True
            pos += ln
    return out


def _runs(types: np.ndarray):
    """Run-length encode: [(type, length), ...]."""
    n = len(types)
    if n == 0:
        return []
    edges = np.nonzero(np.diff(types))[0] + 1
    starts = np.concatenate([[0], edges])
    ends = np.concatenate([edges, [n]])
    return [(int(types[s]), int(e - s)) for s, e in zip(starts, ends)]


# ---------------------------------------------------------------------------
# Block-switch command encoding
# ---------------------------------------------------------------------------


def cluster_context_histograms(bucket_hist: np.ndarray, max_trees: int,
                               header_cost: float):
    """Cluster per-(block type x context) histograms into trees
    (reference BrotliClusterHistograms, src/enc/cluster.rs:360): k-means
    reduction to max_trees followed by greedy pairwise merging while a
    merge saves more than the per-tree description cost.

    Returns (assign[buckets] -> tree id, tree_hists[ntrees, alphabet]).
    """
    nb, alpha = bucket_hist.shape
    totals = bucket_hist.sum(axis=1)
    used = np.nonzero(totals > 0)[0]
    if len(used) == 0:
        return np.zeros(nb, dtype=np.int64), np.zeros((1, alpha),
                                                      dtype=np.int64)
    hist = bucket_hist[used].astype(np.float64)

    k = int(min(max_trees, len(used)))
    # k-means initialization: largest buckets as seeds
    seeds = np.argsort(-totals[used])[:k]
    cent = hist[seeds].copy()
    assign = None
    for _ in range(6):
        tot = cent.sum(axis=1, keepdims=True) + alpha * 0.25
        logp = np.log2((cent + 0.25) / tot)
        cost = -(hist @ logp.T)
        new_assign = cost.argmin(axis=1)
        if assign is not None and np.array_equal(new_assign, assign):
            break
        assign = new_assign
        cent = np.zeros((k, alpha))
        np.add.at(cent, assign, hist)

    # greedy pairwise merge with header-cost gating
    alive = sorted(set(assign.tolist()))
    cost_of = {t: shannon_entropy(cent[t]) for t in alive}
    merged = True
    while merged and len(alive) > 1:
        merged = False
        best_delta, best_pair = 0.0, None
        for ii in range(len(alive)):
            for jj in range(ii + 1, len(alive)):
                a, b = alive[ii], alive[jj]
                d = (shannon_entropy(cent[a] + cent[b])
                     - cost_of[a] - cost_of[b] - header_cost)
                if d < best_delta:
                    best_delta, best_pair = d, (a, b)
        if best_pair:
            a, b = best_pair
            cent[a] += cent[b]
            cost_of[a] = shannon_entropy(cent[a])
            alive.remove(b)
            assign = np.where(assign == b, a, assign)
            merged = True

    remap = {t: i for i, t in enumerate(sorted(set(assign.tolist())))}
    ntrees = len(remap)
    out_assign = np.zeros(nb, dtype=np.int64)
    out_assign[used] = np.array([remap[t] for t in assign])
    tree_hists = np.zeros((ntrees, alpha), dtype=np.int64)
    np.add.at(tree_hists, out_assign[used],
              bucket_hist[used])
    return out_assign, tree_hists


_DIST_LANE_POOL = None
_DIST_LANE_LOCK = __import__("threading").Lock()


def _dist_lane_pool():
    """Shared 4-worker pool for the npostfix lanes: a fresh executor
    per metablock paid thread spawn/join on every q10+ metablock.
    Creation is locked — concurrent first callers must not each spawn
    (and leak) an executor."""
    global _DIST_LANE_POOL
    if _DIST_LANE_POOL is None:
        with _DIST_LANE_LOCK:
            if _DIST_LANE_POOL is None:
                from concurrent.futures import ThreadPoolExecutor
                _DIST_LANE_POOL = ThreadPoolExecutor(max_workers=4)
    return _DIST_LANE_POOL


def _dist_stream_cost(hist: np.ndarray, extra_cost: int) -> float:
    """Actual serialized cost of a distance symbol stream: depth-limited
    Huffman code bits plus the wire-form tree description (reference
    BrotliPopulationCost, bit_cost.rs — but measured exactly by building
    and serializing the code, not by the piecewise estimate)."""
    from ..core.huffman import build_huffman_lengths, code_bit_cost, \
        optimize_counts_for_rle
    from ..core.prefix import write_prefix_code
    from .bitstream import BitWriter
    h = hist if hist.sum() else np.array([1], dtype=np.int64)
    lengths = build_huffman_lengths(optimize_counts_for_rle(h))
    w = BitWriter()
    write_prefix_code(w, lengths)
    return float(code_bit_cost(h, lengths)) + w.bit_length() + extra_cost


def choose_distance_params(distances: np.ndarray, copy_mask: np.ndarray,
                           dist_codes_now: np.ndarray,
                           large_window: bool = False):
    """Distance NPOSTFIX/NDIRECT search (reference BrotliBuildMetaBlock,
    metablock.rs:158-208): pick the (npostfix, ndirect) minimizing the
    distance-stream cost.  Cost is measured the way the stream is
    actually written — integer Huffman depths over the full symbol
    histogram (short codes included) plus the serialized tree
    description plus extra bits — because raw entropy over-favors wide
    alphabets (it ignores depth quantization and tree cost; measured
    +80B on alice q11 when it picked (3,120) over the C engine's
    (0,0)).  Search order mirrors the reference's ndirect_msb sweep with
    its early-break on worsening cost."""
    from .params import DistanceParams
    long_mask = copy_mask & (dist_codes_now >= 16)
    dists = distances[long_mask]
    short_hist = np.bincount(dist_codes_now[copy_mask & ~long_mask],
                             minlength=16)[:16]
    if len(dists) == 0:
        return DistanceParams(large_window=large_window)
    def lane(npostfix):
        # one npostfix lane of the sweep; the early break is
        # lane-local in the reference too, so running the four lanes
        # on threads (numpy drops the GIL in the heavy ops) changes
        # wall time only, never the winner
        lbest = None
        prev = None
        for wire in range(16):  # NDIRECT = wire << npostfix (4 bits)
            ndirect = wire << npostfix
            direct = dists <= ndirect
            far = dists[~direct]
            if len(far):
                sym, extra, nbits = C.encode_distance(far, npostfix,
                                                      ndirect)
                hist = np.bincount(sym, minlength=16 + ndirect)
                extra_cost = int(nbits.sum())
            else:
                hist = np.zeros(16 + ndirect, dtype=np.int64)
                extra_cost = 0
            hist[:16] += short_hist
            if direct.any():
                hist[16:16 + ndirect] += np.bincount(
                    dists[direct] - 1, minlength=ndirect)
            total = _dist_stream_cost(hist, extra_cost)
            if lbest is None or total < lbest[0]:
                lbest = (total, npostfix, ndirect)
            # the reference abandons an npostfix lane once cost rises
            # (metablock.rs ndirect_msb loop); two strikes guards the
            # non-monotone seam at small ndirect
            if prev is not None and total > prev and total > lbest[0]:
                break
            prev = total
        return lbest

    if len(dists) >= (1 << 15):
        lane_bests = list(_dist_lane_pool().map(lane, range(4)))
    else:
        lane_bests = [lane(npf) for npf in range(4)]
    # tie-break identical to the serial sweep: first lane wins ties
    # (strictly-less comparison in lane order)
    best = None
    for lb in lane_bests:
        if lb is not None and (best is None or lb[0] < best[0]):
            best = lb
    return DistanceParams(npostfix=best[1], ndirect=best[2],
                          large_window=large_window)


# ---------------------------------------------------------------------------
# Metablock plan: the full optimization pipeline
# ---------------------------------------------------------------------------


class MetaBlockPlan:
    """Everything bitstream.store_meta_block needs to serialize one
    optimized metablock."""
    __slots__ = (
        "mlen", "dist_params", "context_mode", "cmds", "literals",
        "lit_ntypes", "cmd_ntypes", "dist_ntypes",
        "lit_switch", "cmd_switch", "dist_switch",
        "ntrees_l", "cmap_l", "ntrees_d", "cmap_d",
        "lit_lengths", "cmd_lengths", "dist_lengths",
        "lit_tree", "cmd_tree", "dist_tree",
    )


def _safe(hist):
    if hist.sum() == 0:
        hist = hist.copy()
        hist[0] = 1
    return hist


def build_meta_block(full: np.ndarray, start: int, mlen: int,
                     cmds, dist_params, quality: int, size_hint: int,
                     mode: int = 0, enable_splits: bool = True,
                     num_lit_ctx=None, lit_static_map=None) -> MetaBlockPlan:
    """Optimize one metablock: block splits + context modeling +
    per-tree Huffman codes (reference BrotliBuildMetaBlockGreedy,
    metablock.rs:1022, with the static-context-map path of
    WriteMetaBlockInternal, encode.rs:2026-2111)."""
    from ..core.huffman import build_huffman_lengths, \
        optimize_counts_for_rle
    from .bitstream import extract_literals

    def _lengths(h):
        return build_huffman_lengths(optimize_counts_for_rle(_safe(h)))

    plan = MetaBlockPlan()
    plan.mlen = mlen
    plan.dist_params = dist_params
    plan.cmds = cmds

    literals = extract_literals(full, start, cmds)
    plan.literals = literals
    n_lit = len(literals)

    context_mode = choose_context_mode(full[start:start + mlen],
                                       quality, mode)
    plan.context_mode = context_mode

    # ---- literal contexts (vectorized p1/p2 gather) ----
    lit_abs = _literal_positions(cmds, start)
    p1 = np.where(lit_abs >= 1, full[np.maximum(lit_abs - 1, 0)], 0)
    p2 = np.where(lit_abs >= 2, full[np.maximum(lit_abs - 2, 0)], 0)
    ctx = (C.CONTEXT_LUT0[context_mode][p1]
           | C.CONTEXT_LUT1[context_mode][p2]).astype(np.int64)

    # ---- static context map decision ----
    if num_lit_ctx is None:
        if context_mode == C.CONTEXT_UTF8:
            num_lit_ctx, lit_static_map = choose_literal_context_map(
                full, start, mlen, quality, size_hint)
        else:
            num_lit_ctx, lit_static_map = 1, np.zeros(64, dtype=np.int64)

    # ---- block splits ----
    dist_mask = (cmds.copy_len > 0) & ~C.CMD_IMPLICIT_DIST0[cmds.cmd_sym]
    dist_syms = cmds.dist_code[dist_mask]
    if enable_splits:
        lit_split = split_symbols(literals.astype(np.int64), 256, "literal",
                                  max_types=256 // max(1, int(num_lit_ctx)))
        cmd_split = split_symbols(cmds.cmd_sym, 704, "command")
        dist_split = split_symbols(dist_syms, dist_params.alphabet_size,
                                   "distance")
    else:
        lit_split = BlockSplit.trivial(n_lit)
        cmd_split = BlockSplit.trivial(len(cmds))
        dist_split = BlockSplit.trivial(len(dist_syms))

    # cap total literal trees at 256
    while lit_split.num_types * num_lit_ctx > 256:
        num_lit_ctx, lit_static_map = 1, np.zeros(64, dtype=np.int64)

    plan.lit_ntypes = lit_split.num_types
    plan.cmd_ntypes = cmd_split.num_types
    plan.dist_ntypes = dist_split.num_types
    plan.lit_switch = plan_block_switches(lit_split) \
        if lit_split.num_types >= 2 else None
    plan.cmd_switch = plan_block_switches(cmd_split) \
        if cmd_split.num_types >= 2 else None
    plan.dist_switch = plan_block_switches(dist_split) \
        if dist_split.num_types >= 2 else None

    alpha_d = dist_params.alphabet_size
    dynamic_ctx = quality >= 10 and n_lit > 512

    if dynamic_ctx:
        # ---- dynamic context maps: cluster per-(type, context)
        # histograms (the q10+/BrotliBuildMetaBlock path,
        # metablock.rs:133 + cluster.rs) ----
        buckets_l = lit_split.types * 64 + ctx
        bh = np.bincount(buckets_l * 256 + literals,
                         minlength=lit_split.num_types * 64 * 256
                         ).reshape(lit_split.num_types * 64, 256)
        cmap_l, lit_h = cluster_context_histograms(
            bh, max_trees=48, header_cost=300.0)
        plan.ntrees_l = lit_h.shape[0]
        plan.cmap_l = cmap_l
        lit_tree = cmap_l[buckets_l]

        dctx = C.distance_context_from_copy_len(
            cmds.copy_len[dist_mask])
        buckets_d = dist_split.types * 4 + dctx
        bhd = np.bincount(buckets_d * alpha_d + dist_syms,
                          minlength=dist_split.num_types * 4 * alpha_d
                          ).reshape(dist_split.num_types * 4, alpha_d)
        cmap_d, dist_h = cluster_context_histograms(
            bhd, max_trees=8, header_cost=500.0)
        plan.ntrees_d = dist_h.shape[0]
        plan.cmap_d = cmap_d
        plan.dist_tree = cmap_d[buckets_d]
    else:
        # ---- static context maps (q<10 greedy path) ----
        ntrees_l = lit_split.num_types * num_lit_ctx
        cmap_l = np.zeros(64 * lit_split.num_types, dtype=np.int64)
        for t in range(lit_split.num_types):
            cmap_l[t * 64:(t + 1) * 64] = \
                t * num_lit_ctx + lit_static_map
        plan.ntrees_l = ntrees_l
        plan.cmap_l = cmap_l
        lit_tree = lit_split.types * num_lit_ctx + lit_static_map[ctx] \
            if n_lit else np.zeros(0, dtype=np.int64)
        lit_h = np.bincount(lit_tree * 256 + literals,
                            minlength=ntrees_l * 256
                            ).reshape(ntrees_l, 256)

        ntrees_d = dist_split.num_types
        plan.ntrees_d = ntrees_d
        plan.cmap_d = np.repeat(np.arange(ntrees_d, dtype=np.int64), 4)
        plan.dist_tree = dist_split.types
        dist_h = np.bincount(dist_split.types * alpha_d + dist_syms,
                             minlength=ntrees_d * alpha_d
                             ).reshape(ntrees_d, alpha_d)

    plan.lit_tree = lit_tree
    plan.cmd_tree = cmd_split.types
    plan.lit_lengths = [_lengths(h) for h in lit_h]

    nct = cmd_split.num_types
    cmd_h = np.bincount(cmd_split.types * 704 + cmds.cmd_sym,
                        minlength=nct * 704).reshape(nct, 704)
    plan.cmd_lengths = [_lengths(h) for h in cmd_h]
    plan.dist_lengths = [_lengths(h) for h in dist_h]
    return plan


def _literal_positions(cmds, start: int) -> np.ndarray:
    """Absolute position in the input of each literal (vectorized)."""
    n = len(cmds)
    step = cmds.insert_len + cmds.copy_advance
    cmd_start = np.zeros(n, dtype=np.int64)
    np.cumsum(step[:-1], out=cmd_start[1:])
    cmd_start += start
    total = int(cmds.insert_len.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    owner = np.repeat(np.arange(n), cmds.insert_len)
    run_off = np.arange(total) - np.repeat(
        np.concatenate([[0], np.cumsum(cmds.insert_len)[:-1]]),
        cmds.insert_len)
    return cmd_start[owner] + run_off


def plan_block_switches(split: BlockSplit):
    """Turn a BlockSplit into wire data: first block length + per-switch
    (type_symbol, len_code, len_extra_val, len_extra_bits) and the
    histograms for the type/length prefix codes (RFC 6)."""
    blocks = split.blocks
    first_len = blocks[0][1]
    ntypes = split.num_types
    type_syms = []
    len_codes = [int(C.get_block_length_code(first_len))]
    len_extra = []
    cur, prev = 0, 1
    for t, ln in blocks[1:]:
        if t == prev:
            s = 0
        elif t == (cur + 1) % ntypes:
            s = 1
        else:
            s = t + 2
        type_syms.append(s)
        lc = int(C.get_block_length_code(ln))
        len_codes.append(lc)
        len_extra.append((int(ln - C.BLOCK_LEN_BASE[lc]),
                          int(C.BLOCK_LEN_EXTRA[lc])))
        prev, cur = cur, t
    type_hist = np.bincount(np.array(type_syms, dtype=np.int64),
                            minlength=ntypes + 2) if type_syms else \
        np.zeros(ntypes + 2, dtype=np.int64)
    len_hist = np.bincount(np.array(len_codes, dtype=np.int64), minlength=26)
    # switch positions in symbol units: cumulative block lengths
    switch_at = np.cumsum([ln for _, ln in blocks[:-1]])
    return dict(first_len=first_len, type_syms=type_syms,
                len_codes=len_codes[1:], len_extra=len_extra,
                first_len_code=len_codes[0] if len_codes else 0,
                type_hist=type_hist, len_hist=len_hist,
                switch_at=switch_at)
