"""Randomized differential campaign: every stream must decode through
BOTH our decoder and the upstream C decoder; corrupted streams must
error, never crash."""
import sys, random, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import numpy as np
import oracle
from brotli_tpu import compress, compress_multi, decompress
from brotli_tpu.concat.brocatli import concatenate

rng = np.random.default_rng(20260819)
pyrng = random.Random(20260819)

def payload(kind, n):
    if kind == 0:
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == 1:
        words = [bytes(rng.integers(97, 123, rng.integers(2, 10), dtype=np.uint8)) for _ in range(50)]
        return b" ".join(pyrng.choice(words) for _ in range(n // 5))[:n]
    if kind == 2:
        period = pyrng.randint(1, 64)
        base = rng.integers(0, 256, period, dtype=np.uint8).tobytes()
        return (base * (n // period + 1))[:n]
    if kind == 3:
        b = bytearray(open("/usr/lib/x86_64-linux-gnu/libc.so.6", "rb").read()[:n])
        return bytes(b)
    # mixed
    return payload(0, n // 2) + payload(1, n - n // 2)

t0 = time.time()
trials = 0
while time.time() - t0 < 420:
    kind = pyrng.randint(0, 4)
    n = pyrng.choice([0, 1, 2, 7, 100, 4096, 65536, 300000])
    data = payload(kind, n)
    mode = pyrng.randint(0, 3)
    q = pyrng.choice([0, 1, 2, 3, 5, 7, 9, 10, 11])
    lgwin = pyrng.choice([10, 16, 18, 22, 24])
    try:
        if mode == 0:
            out = compress(data, quality=q, lgwin=lgwin)
        elif mode == 1 and n >= 8192:
            out = compress_multi(data, num_parts=pyrng.choice([2, 4]),
                                 quality=min(q, 9), lgwin=lgwin,
                                 backend=pyrng.choice(["thread", "workpool"]))
        elif mode == 2:
            half = len(data) // 2
            c1 = compress(data[:half], quality=min(q, 9), lgwin=lgwin, appendable=True)
            c2 = compress(data[half:], quality=min(q, 9), lgwin=lgwin, catable=True)
            out = concatenate([c1, c2])
        else:
            out = compress(data, quality=q, lgwin=lgwin,
                           q10_deep=pyrng.random() < 0.5)
        assert decompress(out) == data, "self-decode"
        assert oracle.decompress(out, max_size_hint=len(data) + 64) == data, "C-decode"
        # corruption: flip a bit / truncate — must raise, never crash
        if len(out) > 4 and pyrng.random() < 0.5:
            b = bytearray(out)
            b[pyrng.randrange(len(b))] ^= 1 << pyrng.randrange(8)
            try:
                r = decompress(bytes(b))
            except Exception:
                pass
        if len(out) > 2 and pyrng.random() < 0.5:
            try:
                decompress(out[:pyrng.randrange(1, len(out))])
            except Exception:
                pass
        trials += 1
    except AssertionError as e:
        print("FAIL", kind, n, mode, q, lgwin, e)
        raise
print(f"campaign OK: {trials} trials in {time.time()-t0:.0f}s")
