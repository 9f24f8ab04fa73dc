"""Encoder parameter system.

Capability parity with the reference's BrotliEncoderParams
(reference src/enc/backward_references/mod.rs:72-125) and the numbered
BrotliEncoderParameter enum (src/enc/parameters.rs:3-259), including the
Dropbox extensions (q9.5, catable/appendable/bare/byte_align/magic,
literal byte score).  `sanitize()` mirrors SanitizeParams
(src/enc/encode.rs:546-568): catable implies appendable and forbids an
external custom dictionary; bare implies byte_align.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

MIN_QUALITY = 0
# 12 = the -q9.5y tier (reference bin/brotli.rs:658-680 maps 9.5y to
# quality 12: one refinement deeper than 9.5x)
MAX_QUALITY = 12
MIN_WINDOW_BITS = 10
MAX_WINDOW_BITS = 24
LARGE_MAX_WINDOW_BITS = 30
MIN_INPUT_BLOCK_BITS = 16
MAX_INPUT_BLOCK_BITS = 24

# Encoding modes (reference parameters.rs BrotliEncoderMode)
MODE_GENERIC = 0
MODE_TEXT = 1
MODE_FONT = 2


@dataclass
class DistanceParams:
    """Distance prefix parameters (NPOSTFIX/NDIRECT, RFC 7932 section 4)."""
    npostfix: int = 0
    ndirect: int = 0
    large_window: bool = False

    @property
    def alphabet_size(self) -> int:
        max_distbits = 62 if self.large_window else 24
        return 16 + self.ndirect + (max_distbits << (self.npostfix + 1))


@dataclass
class EncoderParams:
    quality: int = 11
    q9_5: bool = False            # the "9.5" pseudo-quality family
    q10_deep: bool = False        # q10 with the full 2-iteration
    #                               refinement (default q10 runs one
    #                               pass, like the reference's one-shot
    #                               q10 -> 9.5 mapping, encode.rs:1470)
    lgwin: int = 22
    lgblock: int = 0              # 0 = auto (ComputeLgBlock)
    mode: int = MODE_GENERIC
    size_hint: int = 0
    large_window: bool = False

    # Stream-shaping flags (Dropbox extensions; reference README
    # "Technical Reference" table)
    catable: bool = False         # stream can be concatenated after another
    appendable: bool = False      # another stream may be appended (no ISLAST)
    bare: bool = False            # omit window header / final marker
    byte_align: bool = False      # pad final output to a byte boundary
    magic_number: bool = False    # emit magic-number metadata header

    # Tuning
    literal_byte_score: int = 540  # BROTLI_PARAM_LITERAL_BYTE_SCORE
    avoid_distance_prefix_search: bool = False
    favor_cpu_efficiency: bool = False
    num_threads: int = 1
    # BROTLI_PARAM_DISABLE_LITERAL_CONTEXT_MODELING: literals use one
    # tree per block type (no context map)
    disable_literal_context_modeling: bool = False
    # BROTLI_PARAM_STREAM_OFFSET: output will sit at this byte offset
    # of a larger stream (catable continuation); shifts position-based
    # distance legality
    stream_offset: int = 0

    # IR / analysis side channel (reference §2.9)
    log_meta_block: bool = False
    stride_detection_quality: int = 0
    prior_bitmask_detection: int = 0
    literal_adaptation: tuple = ()
    use_utf8_context_mode: bool | None = None  # None = auto-detect

    dist: DistanceParams = field(default_factory=DistanceParams)

    def sanitize(self, input_size: int | None = None) -> "EncoderParams":
        """Resolve parameter dependencies (reference SanitizeParams,
        src/enc/encode.rs:546-568 + ComputeLgBlock :570)."""
        p = replace(self)
        p.quality = max(MIN_QUALITY, min(MAX_QUALITY, p.quality))
        if p.catable:
            p.appendable = True
        if p.bare:
            p.byte_align = True
        max_w = LARGE_MAX_WINDOW_BITS if p.large_window else MAX_WINDOW_BITS
        p.lgwin = max(MIN_WINDOW_BITS, min(max_w, p.lgwin))
        if input_size is not None and p.size_hint == 0:
            p.size_hint = input_size
        # Shrink the window for small inputs — but never for streams meant
        # for concatenation, whose window must match across parts.
        if (input_size is not None and 0 < input_size and p.quality >= 2
                and not (p.catable or p.appendable)):
            while (p.lgwin > MIN_WINDOW_BITS
                   and (1 << (p.lgwin - 1)) - 16 >= input_size):
                p.lgwin -= 1
        p.lgblock = compute_lg_block(p)
        p.dist = replace(p.dist, large_window=p.large_window)
        return p

    @property
    def window_size(self) -> int:
        return (1 << self.lgwin) - 16

    @property
    def effective_quality(self) -> int:
        """Quality used for algorithm selection: the 9.5 family runs
        greedy match finding with full metablock optimization."""
        return self.quality


def compute_lg_block(p: EncoderParams) -> int:
    """Metablock input span (reference ComputeLgBlock,
    src/enc/encode.rs:570-589, bounds each metablock's input by
    1<<lgblock).  An explicit `-l` is honored, clamped to [16, 24] as in
    the reference.  The auto default diverges deliberately: the
    reference picks 16-18 to bound its ring buffer; our batched
    pipeline has no ring buffer.  For the greedy tiers (q2-9) auto = 20:
    1 MiB spans give the histograms locality the block splitter does
    not fully recover on heterogeneous data (measured on the mixed
    bench corpus: q5 1.022 -> 1.005 vs C, q3 1.000 -> 0.973), while
    4 MiB spans (auto = 22) remain best for the Zopfli tiers, whose
    per-metablock optimization benefits from the longer span."""
    lgblock = p.lgblock
    if lgblock == 0:
        if p.quality <= 1:
            # 1 MiB spans let the fragment tier overlap parse(g+1)
            # with serialization(g); the persistent table keeps
            # matches crossing the boundaries
            lgblock = min(p.lgwin, 20)
        elif p.quality <= 3:
            # the basic-tier search misses more than the splitter can
            # recover on heterogeneous data; 128 KiB spans buy back the
            # local adaptation (the reference uses 16 KiB here) at
            # ~1% of the speed (q2 1.032 -> 1.000, q3 1.004 -> 0.974
            # vs C on the mixed corpus)
            lgblock = 17
        elif p.quality <= 9:
            # 512 KiB spans beat 1 MiB on both axes for the greedy
            # tiers (q5 26.3 -> 29.4 MB/s at -0.2% size on the mixed
            # corpus): better store locality and a tighter parse/store
            # pipeline balance
            lgblock = 19
        else:
            lgblock = 22
    return max(MIN_INPUT_BLOCK_BITS, min(MAX_INPUT_BLOCK_BITS, lgblock))


def max_compressed_size(input_size: int) -> int:
    """Worst-case output bound (reference BrotliEncoderMaxCompressedSize,
    src/enc/encode.rs:1277-1299): input + uncompressed-metablock overhead
    + 16 bytes slack for magic/headers."""
    num_blocks = (input_size >> 24) + 1
    overhead = 2 + 4 * num_blocks + 3 + 1
    return input_size + overhead + 16
