"""IR analysis extensions: stride / prior / adaptation-speed detection.

The reference's research side-channel (activated by stride_detection_
quality, prior_bitmask_detection, and the -findprior/-findspeed/-stride
CLI flags): multi-resolution entropy buckets score candidate STRIDE
predictors (find_stride.rs EntropyPyramid, stride_eval.rs StrideEval),
per-context CDFs pick a prior mixing strategy (prior_eval.rs WhichPrior),
and candidate CDF adaptation speeds are evaluated against the literal
stream (context_map_entropy.rs).  Results ride in the IR PredictionMode
record, not in the wire format — they feed downstream recompression
research, exactly like the reference.

Implementations here are vectorized numpy equivalents of the reference's
scoring passes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# candidate adaptation speeds (inc, max), reference interface.rs speed
# metadata / context_map_entropy.rs NUM_SPEEDS_TO_TRY
CANDIDATE_SPEEDS = [(0, 1024), (1, 1024), (1, 4096), (2, 1024),
                    (4, 1024), (8, 8192), (16, 48), (16, 8192),
                    (32, 4096), (64, 16384), (128, 16384), (512, 16384)]

MAX_STRIDE = 8


@dataclass
class AnalysisResult:
    best_stride: int
    stride_costs: list          # bits/byte per stride 1..8
    cm_speed: tuple             # (inc, max) for the context-map model
    stride_speed: tuple         # (inc, max) for the stride model
    prior: str                  # chosen prior family (CM / STRIDE / ADV)


def stride_entropy_costs(data: np.ndarray, max_stride: int = MAX_STRIDE):
    """Bits/byte of coding each byte conditioned on the byte `stride`
    back, using the top nibble as context (the vector analog of
    StrideEval's per-stride CDF cost, reference stride_eval.rs:93-210)."""
    n = len(data)
    costs = []
    for stride in range(1, max_stride + 1):
        if n <= stride:
            costs.append(8.0)
            continue
        ctx = (data[:-stride] >> 4).astype(np.int64)
        sym = data[stride:].astype(np.int64)
        hist = np.zeros((16, 256), np.float64)
        np.add.at(hist, (ctx, sym), 1)
        tot = hist.sum(axis=1, keepdims=True)
        p = (hist + 0.25) / (tot + 64.0)
        bits = -(hist * np.log2(p)).sum()
        costs.append(float(bits / max(1, n - stride)))
    return costs


def adaptive_cost(symbols: np.ndarray, inc: int, cap: int,
                  nibble: bool = True, chunk: int = 512) -> float:
    """Total bits to code `symbols` with an adaptive frequency model
    (increment `inc`, renormalize at `cap`), evaluated chunk-wise (the
    reference scores adaptation speeds the same way,
    context_map_entropy.rs:1-554).  Top-nibble alphabet keeps this
    cheap, matching the reference's 16-ary CDFs."""
    if len(symbols) == 0:
        return 0.0
    syms = (symbols >> 4).astype(np.int64) if nibble else \
        symbols.astype(np.int64)
    k = 16 if nibble else 256
    freq = np.ones(k, np.float64)
    total_bits = 0.0
    for c0 in range(0, len(syms), chunk):
        part = syms[c0:c0 + chunk]
        hist = np.bincount(part, minlength=k)
        tot = freq.sum()
        p = freq / tot
        total_bits += -(hist * np.log2(p)).sum()
        freq = freq + hist * inc
        if freq.sum() > cap:
            freq = np.maximum(freq * 0.5, 1.0)
    return float(total_bits)


def detect_speeds(literals: np.ndarray):
    """Best (inc, max) speed pair for the context-map model and the
    stride model (reference -findspeed; best_speed_log,
    brotli_bit_stream.rs:197-218)."""
    best_cm, best_cm_cost = CANDIDATE_SPEEDS[0], float("inf")
    for inc, cap in CANDIDATE_SPEEDS:
        c = adaptive_cost(literals, max(inc, 1), cap)
        if c < best_cm_cost:
            best_cm_cost, best_cm = c, (inc, cap)
    # the stride model sees residual-like symbols; reuse the scorer on
    # the low nibbles (different view, same machinery)
    best_st, best_st_cost = CANDIDATE_SPEEDS[0], float("inf")
    low = (literals & 0x0F) << 4
    for inc, cap in CANDIDATE_SPEEDS[:8]:
        c = adaptive_cost(low, max(inc, 1), cap)
        if c < best_st_cost:
            best_st_cost, best_st = c, (inc, cap)
    return best_cm, best_st


def detect_prior(data: np.ndarray, best_stride: int,
                 stride_costs: list) -> str:
    """Pick the prior family (reference prior_eval.rs WhichPrior): CM
    when the previous-byte context wins, STRIDE when a stride predictor
    is clearly better, ADV when they are close (mixing pays)."""
    cm_cost = stride_costs[0]  # stride 1 == previous-byte context
    st_cost = min(stride_costs)
    if best_stride == 1 or cm_cost - st_cost < 0.05:
        return "CM"
    if cm_cost - st_cost > 0.3:
        return f"STRIDE{min(best_stride, 4)}"
    return "ADV"


def analyze(data: bytes, stride_detection_quality: int = 1,
            prior_bitmask_detection: int = 0) -> AnalysisResult:
    """Full analysis pass (the encoder's side-channel; CLI -findprior /
    -findspeed / -stride)."""
    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    if stride_detection_quality >= 2 or len(arr) > 1 << 20:
        sample = arr[: 1 << 20]
    else:
        sample = arr
    costs = stride_entropy_costs(sample)
    best_stride = int(np.argmin(costs)) + 1
    cm_speed, stride_speed = detect_speeds(sample)
    prior = detect_prior(sample, best_stride, costs) \
        if prior_bitmask_detection else "CM"
    return AnalysisResult(best_stride=best_stride,
                          stride_costs=[round(c, 4) for c in costs],
                          cm_speed=cm_speed, stride_speed=stride_speed,
                          prior=prior)
