"""Encoder-side static dictionary matching (vectorized).

The reference probes a precomputed 32K-entry hash of dictionary-word
prefixes during match finding (SearchInStaticDictionary,
src/enc/backward_references/mod.rs:1942; kStaticDictionaryHash,
src/enc/dictionary_hash.rs).  Here the index is built once from the RFC
dictionary itself and probed for ALL positions in one vectorized pass:
hash the 4-byte prefix at every position, gather the bucket's candidate
words, and verify full-word equality with a masked [n, 24] byte compare.

Dictionary references encode as distance = max_distance + 1 + word_id
(RFC 8); identity transform only (transform id 0), like the hot path of
the reference's TestStaticDictionaryItem (mod.rs:1896).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..core.dictionary import get_dictionary

HASH_MUL32 = 0x1E35A7BD
DICT_HASH_BITS = 15
DICT_SLOTS = 2
MAX_WORD_LEN = 24
DISTANCE_BIT_PENALTY = 30


@lru_cache(maxsize=1)
def dict_index():
    """(word_bytes[n_entries, 24], word_len[n], word_id_by_len, table
    [2^bits, slots] of entry ids (-1 empty))."""
    d = get_dictionary()
    data = np.frombuffer(d.data, dtype=np.uint8)
    entries_len = []
    entries_idx = []
    entries_off = []
    for length in range(4, MAX_WORD_LEN + 1):
        nwords = d.num_words(length)
        if nwords == 0:
            continue
        off = int(d.offsets_by_length[length])
        idx = np.arange(nwords, dtype=np.int64)
        entries_len.append(np.full(nwords, length, dtype=np.int64))
        entries_idx.append(idx)
        entries_off.append(off + idx * length)
    word_len = np.concatenate(entries_len)
    word_idx = np.concatenate(entries_idx)
    word_off = np.concatenate(entries_off)
    m = len(word_len)

    # padded word byte matrix [m, 24]
    gather = word_off[:, None] + np.arange(MAX_WORD_LEN)[None, :]
    gather = np.minimum(gather, len(data) - 1)
    word_bytes = data[gather]

    # 4-byte-prefix hash table
    p = data[word_off[:, None] + np.arange(4)[None, :]].astype(np.uint32)
    v = p[:, 0] | (p[:, 1] << 8) | (p[:, 2] << 16) | (p[:, 3] << 24)
    h = ((v * np.uint32(HASH_MUL32)) >> np.uint32(32 - DICT_HASH_BITS)) \
        .astype(np.int64)
    table = np.full((1 << DICT_HASH_BITS, DICT_SLOTS), -1, dtype=np.int64)
    fill = np.zeros(1 << DICT_HASH_BITS, dtype=np.int64)
    # iterate lengths ascending: slot 0 = shortest candidate per bucket
    for e in range(m):
        b = h[e]
        f = fill[b]
        if f < DICT_SLOTS:
            table[b, f] = e
            fill[b] = f + 1

    size_bits = np.zeros(MAX_WORD_LEN + 1, dtype=np.int64)
    for length in range(4, MAX_WORD_LEN + 1):
        size_bits[length] = int(d.size_bits_by_length[length])
    return word_bytes, word_len, word_idx, table, size_bits


@lru_cache(maxsize=1)
def omit_last_transform_ids():
    """transform id of the bare ('', OmitLast_k, '') transform per k
    (RFC Appendix B); index 0 = identity."""
    from ..core.dictionary import OMIT_LAST_1
    d = get_dictionary()
    ids = np.full(10, -1, dtype=np.int64)
    ids[0] = 0
    for t in range(len(d.t_type)):
        ty = d.t_type[t]
        if d.t_prefix[t] == b"" and d.t_suffix[t] == b"" \
                and OMIT_LAST_1 <= ty <= OMIT_LAST_1 + 8:
            ids[ty - OMIT_LAST_1 + 1] = t
    return ids


def add_dictionary_matches(data: np.ndarray, dict_len: int,
                           window_size: int, lbs: int,
                           best_len: np.ndarray, best_dist: np.ndarray,
                           best_score: np.ndarray, best_isdict: np.ndarray,
                           best_wire: np.ndarray,
                           chunk: int = 1 << 20):
    """Union static-dictionary matches into the per-position best arrays
    (in place).  Full-word identity matches plus cutoff (OmitLast_k)
    partial matches, like the reference's TestStaticDictionaryItem
    (mod.rs:1896): a prefix match of m of the word's L bytes encodes as
    transform omit_last_(L-m) with wire copy length L and output m."""
    word_bytes, word_len, word_idx, table, size_bits = dict_index()
    omit_ids = omit_last_transform_ids()
    n = len(data)
    if n < 4:
        return
    d32 = np.concatenate([data, np.zeros(4, np.uint8)]).astype(np.uint32)
    v = d32[:n] | (d32[1:n + 1] << 8) | (d32[2:n + 2] << 16) \
        | (d32[3:n + 3] << 24)
    h = ((v * np.uint32(HASH_MUL32)) >> np.uint32(32 - DICT_HASH_BITS)) \
        .astype(np.int64)
    pad = np.concatenate([data, np.zeros(MAX_WORD_LEN, np.uint8)])
    span = np.arange(MAX_WORD_LEN)

    for c0 in range(dict_len, n, chunk):
        c1 = min(c0 + chunk, n)
        idx = np.arange(c0, c1, dtype=np.int64)
        window = pad[idx[:, None] + span[None, :]]   # [m, 24]
        for slot in range(DICT_SLOTS):
            e = table[h[c0:c1], slot]
            hit = e >= 0
            if not hit.any():
                continue
            ee = np.maximum(e, 0)
            L = word_len[ee]
            eq = window == word_bytes[ee]
            cmp_ok = np.cumprod(eq, axis=1, dtype=bool)
            mlen = np.minimum(cmp_ok.sum(axis=1), L)
            mlen = np.minimum(mlen, n - idx)  # clamp to available input
            omit = L - mlen
            valid_t = (omit == 0) | ((omit <= 9) &
                                     (omit_ids[np.minimum(omit, 9)] >= 0))
            ok = hit & (mlen >= 4) & valid_t
            if not ok.any():
                continue
            sel = np.nonzero(ok)[0]
            pos = idx[sel]
            m = mlen[sel]
            Ls = L[sel]
            transform = omit_ids[Ls - m]
            max_dist = np.minimum(pos, window_size)
            wid = (transform << size_bits[Ls]) + word_idx[ee[sel]]
            dist = max_dist + 1 + wid
            sc = (lbs * m - DISTANCE_BIT_PENALTY *
                  np.floor(np.log2(dist)).astype(np.int64))
            upd = sc > best_score[pos]
            u = pos[upd]
            best_len[u] = m[upd]
            best_dist[u] = dist[upd]
            best_score[u] = sc[upd]
            best_isdict[u] = True
            best_wire[u] = Ls[upd]
