"""Command stream construction: distance codes, cache resolution, symbols.

A parsed metablock is a struct-of-arrays of commands
(insert_len, copy_len, distance).  This module resolves each distance
against the rolling 4-entry distance cache into short codes 0-15 /
direct codes / long codes with extra bits (RFC 7932 section 4), and maps
(insert code, copy code, dist0?) to the 704-symbol command alphabet.

Reference parity: ComputeDistanceCode (src/enc/command.rs:48-69),
PrefixEncodeCopyDistance (:134), CreateBackwardReferences distance-cache
update (src/enc/backward_references/mod.rs:2497-2503).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core import constants as C


@dataclass
class CommandArrays:
    """Fully-resolved command stream for one metablock (struct of arrays).

    copy_len is the WIRE value (what the copy-length code encodes; for
    dictionary references this selects the word-length bucket);
    copy_advance is the bytes of input the command covers — they differ
    only for dictionary cutoff transforms (output shorter than word).
    """
    insert_len: np.ndarray    # int64[n]
    copy_len: np.ndarray      # int64[n]  wire copy length (0 allowed only
    #                           for a trailing insert-only command)
    distance: np.ndarray      # int64[n]  resolved distance (dict refs are
    #                           > max_distance); 0 for insert-only tail
    dist_code: np.ndarray     # int64[n]  distance symbol (cache-relative)
    dist_extra: np.ndarray    # int64[n]  extra-bit value
    dist_extra_bits: np.ndarray  # int64[n]
    cmd_sym: np.ndarray       # int64[n]  command alphabet symbol (0..703)
    copy_advance: np.ndarray = None  # int64[n]; defaults to copy_len

    def __post_init__(self):
        if self.copy_advance is None:
            self.copy_advance = self.copy_len

    def __len__(self):
        return len(self.insert_len)

    @property
    def num_literals(self) -> int:
        return int(self.insert_len.sum())


def compute_distance_code(distance: int, max_distance: int,
                          cache: list[int]) -> int:
    """Map a distance to its cache-relative code (reference
    ComputeDistanceCode, src/enc/command.rs:48-69).  Distances beyond
    max_distance are dictionary references and use the long form."""
    if distance <= max_distance:
        if distance == cache[0]:
            return 0
        if distance == cache[1]:
            return 1
        if distance == cache[2]:
            return 2
        if distance == cache[3]:
            return 3
        d = distance - cache[0] + 3
        if 0 <= d <= 6 and d != 3:
            # cache[0] + delta: -1->4, +1->5, -2->6, +2->7, -3->8, +3->9
            return (8, 6, 4, -1, 5, 7, 9)[d]
        d = distance - cache[1] + 3
        if 0 <= d <= 6 and d != 3:
            return (14, 12, 10, -1, 11, 13, 15)[d]
    return -1  # no short code


def resolve_commands(insert_len, copy_len, distance, dist_params,
                     advance=None,
                     initial_cache=None, pos_offset: int = 0,
                     window_size: int | None = None) -> CommandArrays:
    """Resolve raw (insert, copy, distance) triples into wire commands.

    pos_offset: absolute output position (incl. custom dictionary) at the
    start of these commands — needed to decide short-code eligibility
    (short codes are only valid while distance <= max_distance).
    window_size: the stream window; max_distance = min(pos, window).

    The distance-cache walk is sequential; it runs here on host over the
    command array (O(#commands), trivially cheap next to the parse).
    """
    insert_len = np.asarray(insert_len, dtype=np.int64)
    copy_len = np.asarray(copy_len, dtype=np.int64)
    distance = np.asarray(distance, dtype=np.int64)
    advance = copy_len if advance is None \
        else np.asarray(advance, dtype=np.int64)
    n = len(insert_len)
    npostfix, ndirect = dist_params.npostfix, dist_params.ndirect

    from .. import native_bridge as nb
    if nb.available():
        # position stepping uses the ADVANCE (output) lengths; the
        # command symbol is computed natively from the wire lengths
        code, extra, bits, use_last_n, cmd_sym, cache = \
            nb.resolve_distance_codes(
                insert_len, advance, distance, npostfix, ndirect,
                list(initial_cache if initial_cache is not None
                     else C.INITIAL_DISTANCE_CACHE),
                pos_offset,
                window_size if window_size is not None else 1 << 62,
                wire_copy=copy_len)
        return CommandArrays(insert_len, copy_len, distance, code,
                             extra, bits, cmd_sym, advance), cache

    dist_code = np.zeros(n, dtype=np.int64)
    dist_extra = np.zeros(n, dtype=np.int64)
    dist_extra_bits = np.zeros(n, dtype=np.int64)
    use_last = np.zeros(n, dtype=bool)

    cache = list(initial_cache if initial_cache is not None
                 else C.INITIAL_DISTANCE_CACHE)
    pos = pos_offset
    wsz = window_size if window_size is not None else 1 << 62

    il = insert_len.tolist()
    cl = advance.tolist()
    dl = distance.tolist()
    for i in range(n):
        pos += il[i]
        c = cl[i]
        d = dl[i]
        if c == 0:
            # trailing insert-only command: wire copy_len 4, no distance
            dist_code[i] = 0
            use_last[i] = True
            continue
        max_distance = min(pos, wsz)
        sc = compute_distance_code(d, max_distance, cache)
        if sc == 0:
            dist_code[i] = 0
            use_last[i] = True
        elif sc > 0:
            dist_code[i] = sc
            cache.pop()
            cache.insert(0, d)
        elif d <= ndirect:
            dist_code[i] = 15 + d  # direct code: 16 + d - 1
            if d <= max_distance:  # dict refs never enter the cache
                cache.pop()
                cache.insert(0, d)
        else:
            sym, extra, nbits = C.encode_distance(d, npostfix, ndirect)
            dist_code[i] = int(sym)
            dist_extra[i] = int(extra)
            dist_extra_bits[i] = int(nbits)
            if d <= max_distance:  # dictionary refs don't enter the cache
                cache.pop()
                cache.insert(0, d)
        pos += c

    wire_copy = np.where(copy_len == 0, 4, copy_len)
    ins_code = C.get_insert_length_code(insert_len)
    copy_code = C.get_copy_length_code(wire_copy)
    # dist0 cells exist only for ins_code<8 and copy_code<16
    use_last &= (ins_code < 8) & (copy_code < 16)
    cmd_sym = C.combine_length_codes(ins_code, copy_code, use_last)

    return CommandArrays(insert_len, copy_len, distance, dist_code,
                         dist_extra, dist_extra_bits, cmd_sym,
                         advance), cache


def command_extra_bits(cmd: CommandArrays):
    """(insert_extra_val, insert_extra_bits, copy_extra_val, copy_extra_bits)
    per command, vectorized."""
    wire_copy = np.where(cmd.copy_len == 0, 4, cmd.copy_len)
    ins_code = C.get_insert_length_code(cmd.insert_len)
    copy_code = C.get_copy_length_code(wire_copy)
    ins_nbits = C.INSERT_EXTRA[ins_code]
    ins_val = cmd.insert_len - C.INSERT_BASE[ins_code]
    copy_nbits = C.COPY_EXTRA[copy_code]
    copy_val = wire_copy - C.COPY_BASE[copy_code]
    return ins_val, ins_nbits, copy_val, copy_nbits
