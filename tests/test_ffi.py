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
