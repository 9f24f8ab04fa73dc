"""FFI-shape API tests (reference src/ffi/ + c/brotli headers parity)."""

from brotli_tpu import decompress, ffi

from .conftest import TESTDATA


def load(name):
    with open(f"{TESTDATA}/{name}", "rb") as f:
        return f.read()


def test_encoder_instance_streaming():
    data = load("asyoulik.txt")
    st = ffi.BrotliEncoderCreateInstance()
    assert ffi.BrotliEncoderSetParameter(st, ffi.BROTLI_PARAM_QUALITY, 7)
    assert ffi.BrotliEncoderSetParameter(st, ffi.BROTLI_PARAM_LGWIN, 22)
    out = bytearray()
    for i in range(0, len(data), 30000):
        assert ffi.BrotliEncoderCompressStream(
            st, ffi.BROTLI_OPERATION_PROCESS, data[i:i + 30000])
        while ffi.BrotliEncoderHasMoreOutput(st):
            out += ffi.BrotliEncoderTakeOutput(st, 4096)
    assert ffi.BrotliEncoderCompressStream(
        st, ffi.BROTLI_OPERATION_FINISH)
    out += ffi.BrotliEncoderTakeOutput(st)
    assert ffi.BrotliEncoderIsFinished(st)
    assert decompress(bytes(out)) == data
    ffi.BrotliEncoderDestroyInstance(st)


def test_encoder_oneshot_and_bounds():
    data = load("quickfox")
    out = ffi.BrotliEncoderCompress(9, 22, 0, data)
    assert decompress(out) == data
    assert ffi.BrotliEncoderMaxCompressedSize(len(data)) >= len(out)
    assert ffi.BrotliEncoderVersion() > 0


def test_decoder_instance_streaming():
    data = load("alice29.txt")
    comp = load("alice29.txt.compressed")
    st = ffi.BrotliDecoderCreateInstance()
    got = bytearray()
    res = None
    for i in range(0, len(comp), 10000):
        res = ffi.BrotliDecoderDecompressStream(st, comp[i:i + 10000])
        while ffi.BrotliDecoderHasMoreOutput(st):
            got += ffi.BrotliDecoderTakeOutput(st)
    assert res == ffi.BROTLI_DECODER_RESULT_SUCCESS
    assert ffi.BrotliDecoderIsFinished(st)
    assert ffi.BrotliDecoderIsUsed(st)
    assert ffi.BrotliDecoderGetErrorCode(st) == 0
    assert bytes(got) == data


def test_decoder_error_path():
    comp = bytearray(load("alice29.txt.compressed"))
    comp[40:60] = b"\xff" * 20  # corrupt the prefix-code region
    st = ffi.BrotliDecoderCreateInstance()
    res = ffi.BrotliDecoderDecompressStream(st, bytes(comp))
    assert res == ffi.BROTLI_DECODER_RESULT_ERROR
    assert ffi.BrotliDecoderGetErrorCode(st) != 0
    assert ffi.BrotliDecoderErrorString(st) != "NO_ERROR"


def test_decoder_prealloc_decode():
    data = load("alice29.txt")
    comp = load("alice29.txt.compressed")
    buf = bytearray(len(data))
    info = ffi.BrotliDecoderDecompressPrealloc(comp, buf)
    assert info.result == ffi.BROTLI_DECODER_RESULT_SUCCESS
    assert info.decoded_size == len(data)
    assert bytes(buf[:info.decoded_size]) == data
    # too-small buffer reports an error instead of raising
    small = bytearray(100)
    info = ffi.BrotliDecoderDecompressWithReturnInfo(comp, small)
    assert info.result == ffi.BROTLI_DECODER_RESULT_ERROR
    assert info.error
    # corrupt input
    bad = bytearray(comp)
    bad[40:60] = b"\xff" * 20
    info = ffi.BrotliDecoderDecompressPrealloc(bytes(bad), bytearray(len(data)))
    assert info.result == ffi.BROTLI_DECODER_RESULT_ERROR


def test_compress_multi_ffi():
    data = load("asyoulik.txt")
    out = ffi.BrotliEncoderCompressMulti(data, 4, quality=7)
    assert decompress(out) == data


def test_encoder_metadata_op():
    data = load("quickfox")
    st = ffi.BrotliEncoderCreateInstance()
    assert ffi.BrotliEncoderCompressStream(
        st, ffi.BROTLI_OPERATION_PROCESS, data)
    assert ffi.BrotliEncoderCompressStream(
        st, ffi.BROTLI_OPERATION_EMIT_METADATA, metadata=b"xyz")
    assert ffi.BrotliEncoderCompressStream(
        st, ffi.BROTLI_OPERATION_FINISH)
    out = ffi.BrotliEncoderTakeOutput(st)
    assert decompress(out) == data


def test_live_metablock_callback():
    """The metablock callback fires per emitted metablock with IR
    commands that reconstruct the input (reference MetablockCallback,
    interface.rs:633)."""
    from brotli_tpu import compress, decompress
    from brotli_tpu.utils.ir import Copy, Dict, Literal
    from brotli_tpu.core.dictionary import get_dictionary

    data = open(f"{TESTDATA}/asyoulik.txt", "rb").read()[:50000]
    blocks = []
    out = compress(data, quality=9,
                   metablock_callback=lambda ir, region: blocks.append(
                       (ir, region)))
    assert decompress(out) == data
    assert blocks, "callback never fired"
    # replay the IR: literals + copies + dict words reproduce the input
    dic = get_dictionary()
    rebuilt = bytearray()
    for ir, region in blocks:
        for c in ir:
            if isinstance(c, Literal):
                rebuilt += c.data
            elif isinstance(c, Copy):
                start = len(rebuilt) - c.distance
                for j in range(c.num_bytes):
                    rebuilt.append(rebuilt[start + j])
            elif isinstance(c, Dict):
                w = dic.transformed(c.word_size, c.word_id, c.transform)
                rebuilt += w[:c.final_size]
    assert bytes(rebuilt) == data


def test_prior_eval_and_speeds():
    """Full prior/CM-speed search (prior_eval.rs / context_map_entropy
    .rs analogs): text prefers the CM family; speeds are from the
    candidate table."""
    from brotli_tpu.utils.prior import (CANDIDATE_SPEEDS, Weights,
                                        prior_eval)
    data = open(f"{TESTDATA}/alice29.txt", "rb").read()[:200000]
    rep = prior_eval(data)
    assert len(rep.per_context) == 16
    assert rep.cm_speed in CANDIDATE_SPEEDS
    assert rep.stride_speed in CANDIDATE_SPEEDS
    assert set(rep.costs) >= {"CM", "SLOW_CM", "FAST_CM", "STRIDE1",
                              "ADV"}
    # text: CM-family should beat far strides
    assert rep.costs["CM"] <= rep.costs["STRIDE4"]
    # the mixer moves its weight toward the better model
    m = Weights()
    for _ in range(200):
        m.update(0.9, 0.1)
    assert m.w / 65536.0 > 0.6


def test_param_parity_flags():
    """disable_literal_context_modeling, stream_offset, and
    avoid_distance_prefix_search are live parameters (reference
    parameters.rs 4/9 + encode.rs distance search gate)."""
    from brotli_tpu import compress, decompress
    data = open(f"{TESTDATA}/alice29.txt", "rb").read()[:60000]
    plain = compress(data, quality=9)
    noctx = compress(data, quality=9,
                     disable_literal_context_modeling=True)
    assert decompress(noctx) == data
    # UTF8 text benefits from context modeling; disabling must change
    # (and generally grow) the stream.  (Asserted on the native
    # production path only: the Python-oracle store may pick a
    # single-context map here anyway, making both streams equal.)
    from brotli_tpu import native_bridge as _nb
    if _nb.available():
        assert noctx != plain
    # stream_offset (google/brotli BROTLI_PARAM_STREAM_OFFSET): the
    # part is only decodable at its declared offset of the larger
    # stream — concatenate after a prefix part and decode the whole
    prefix, rest = data[:12345], data[12345:]
    p0 = compress(prefix, quality=9, appendable=True, byte_align=True,
                  bare=False)
    # appendable trailer ends with the empty-last block; strip it so
    # the catable continuation follows (the byte-aligned '11' trailer
    # is the final 0x03 byte)
    assert p0.endswith(b"\x03")
    p1 = compress(rest, quality=9, catable=True, bare=True,
                  byte_align=True, stream_offset=len(prefix))
    whole = p0[:-1] + p1 + b"\x03"
    assert decompress(whole) == data
    q11 = compress(data, quality=11)
    q11_nodps = compress(data, quality=11,
                         avoid_distance_prefix_search=True)
    assert decompress(q11_nodps) == data


def test_external_literal_probability_rides_ir():
    """external-literal-probability feature (interface.rs:378-420):
    caller-supplied per-literal probabilities appear on IR Literal
    records through the live callback."""
    import numpy as np
    from brotli_tpu import compress
    from brotli_tpu.utils.ir import Literal
    data = open(f"{TESTDATA}/quickfox", "rb").read()
    probs = np.arange(len(data), dtype=np.uint8)
    seen = []
    compress(data, quality=9, literal_probabilities=probs.tobytes(),
             metablock_callback=lambda ir, region: seen.extend(
                 c for c in ir if isinstance(c, Literal)))
    assert seen and all(c.probs is not None and
                        len(c.probs) == len(c.data) for c in seen)


def test_entropy_pyramid_regional_strides():
    """Multi-resolution stride detection (reference EntropyPyramid/
    EntropyTally, find_stride.rs:182-860): a file that switches from
    text to stride-4 float-like records mid-way gets per-region stride
    picks the flat scorer blurs together."""
    import numpy as np

    from brotli_tpu.utils.analysis import (analyze, entropy_pyramid,
                                           pyramid_stride_regions)
    rng = np.random.default_rng(3)
    with open(f"{TESTDATA}/alice29.txt", "rb") as f:
        text = np.frombuffer(f.read()[:32768], np.uint8).copy()
    # stride-4 structure: constant-ish channel bytes (e.g. low-entropy
    # exponents every 4th byte)
    rec = rng.integers(0, 256, 32768, dtype=np.uint8)
    rec[::4] = 0x3F
    rec[1::4] = (np.arange(len(rec[1::4])) % 7).astype(np.uint8)
    data = np.concatenate([text, rec])
    pyr = entropy_pyramid(data, levels=3)
    assert 0 in pyr and 3 in pyr
    assert pyr[3].shape == (8, 8)
    region_len, strides = pyramid_stride_regions(data, levels=3)
    assert region_len == len(data) // 8
    # the first (text) regions pick stride 1; the record regions pick
    # a multiple-of-4 stride
    assert strides[0] == 1
    assert strides[-1] in (4, 8)
    rep = analyze(data.tobytes(), stride_detection_quality=2)
    assert rep.region_strides is not None
    assert len(rep.region_strides) >= 8


def test_stride_eval_per_block_type():
    """Per-block-type stride evaluation (reference StrideEval,
    stride_eval.rs:93-210): each literal block type gets its own
    stride winner."""
    import numpy as np

    from brotli_tpu.utils.analysis import stride_eval_per_block
    rng = np.random.default_rng(5)
    text = np.frombuffer(b"abcdefgh" * 2048, np.uint8).copy()
    rec = rng.integers(0, 256, 16384, dtype=np.uint8)
    rec[::2] = 0x41  # stride-2 structure
    lits = np.concatenate([text, rec])
    types = np.concatenate([np.zeros(len(text), np.int64),
                            np.ones(len(rec), np.int64)])
    best, costs = stride_eval_per_block(lits, types, 2)
    assert costs.shape == (2, 8)
    assert best[1] in (2, 4, 6, 8)   # the structured type
    # and type 0's winner must actually be cheapest for type 0
    assert costs[0, best[0] - 1] == costs[0].min()
