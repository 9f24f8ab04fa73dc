"""Randomized ABI-streaming differential campaign: every stream decodes
through the resumable streaming engine under random chunk feeds and
random output-buffer sizes, compared against the one-shot decoder."""
import sys, random, time, ctypes
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import numpy as np
import oracle
from brotli_tpu import compress, decompress
import brotli_tpu.native_bridge as nb

L = nb.get_lib()
L.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
pyrng = random.Random(99)
rng = np.random.default_rng(99)

def stream_decode(comp, chunker, outsz):
    st = ctypes.c_void_p(L.BrotliDecoderCreateInstance(None, None, None))
    total = bytearray()
    outbuf = ctypes.create_string_buffer(outsz)
    try:
        pos = 0
        stalled = 0
        while True:
            csz = chunker()
            piece = bytes(comp[pos:pos + csz])
            pos += len(piece)
            avail_in = ctypes.c_size_t(len(piece))
            next_in = ctypes.cast(ctypes.c_char_p(piece),
                                  ctypes.POINTER(ctypes.c_uint8))
            while True:
                avail_out = ctypes.c_size_t(len(outbuf))
                next_out = ctypes.cast(outbuf, ctypes.POINTER(ctypes.c_uint8))
                r = L.BrotliDecoderDecompressStream(
                    st, ctypes.byref(avail_in), ctypes.byref(next_in),
                    ctypes.byref(avail_out), ctypes.byref(next_out), None)
                got = len(outbuf) - avail_out.value
                if got:
                    total += outbuf.raw[:got]
                if r == 0:
                    return None  # error
                if r == 1:
                    return bytes(total)
                if r != 3:
                    break
            if pos >= len(comp):
                stalled += 1
                if stalled > 3:
                    return None  # truncated / stuck
    finally:
        L.BrotliDecoderDestroyInstance(st)

def payload(kind, n):
    if kind == 0:
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == 1:
        words = [bytes(rng.integers(97, 123, rng.integers(2, 10), dtype=np.uint8)) for _ in range(40)]
        return b" ".join(pyrng.choice(words) for _ in range(n // 5))[:n]
    if kind == 2:
        period = pyrng.randint(1, 64)
        return (rng.integers(0, 256, period, dtype=np.uint8).tobytes() * (n // period + 1))[:n]
    return open("/usr/lib/x86_64-linux-gnu/libc.so.6", "rb").read()[:n]

t0 = time.time()
trials = 0
while time.time() - t0 < 360:
    kind = pyrng.randint(0, 3)
    n = pyrng.choice([0, 1, 100, 4096, 65536, 250000])
    data = payload(kind, n)
    q = pyrng.choice([0, 1, 2, 5, 9, 11])
    lgwin = pyrng.choice([10, 18, 22])
    use_c = pyrng.random() < 0.4
    comp = (oracle.compress(data, quality=max(q, 1), lgwin=lgwin)
            if use_c else compress(data, quality=q, lgwin=lgwin))
    sizes = pyrng.choice([[1], [3], [17], [991], [65536]])
    chunker = lambda s=sizes: pyrng.choice(s + [s[0] * 2 + 1])
    outsz = pyrng.choice([64, 4096, 1 << 18])
    got = stream_decode(comp, chunker, outsz)
    assert got == data, (kind, n, q, lgwin, use_c,
                         None if got is None else len(got))
    # corruption must error or stall, never crash/hang
    if len(comp) > 4:
        bad = bytearray(comp)
        bad[pyrng.randrange(len(bad))] ^= 1 << pyrng.randrange(8)
        stream_decode(bytes(bad), chunker, outsz)
    trials += 1
print(f"streaming campaign OK: {trials} trials in {time.time()-t0:.0f}s")
