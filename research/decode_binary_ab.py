"""Interleaved decode A/B on binary content (libc) — the one content
class where the native decoder trails the C engine (RESULTS.md
0.90-0.98x).  Also dumps the decoder work counters to show where the
bytes come from (trivial vs context literals, copies, dict words).

Usage: python research/decode_binary_ab.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

from brotli_tpu import native_bridge as nb
import oracle


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    with open("/lib/x86_64-linux-gnu/libc.so.6", "rb") as f:
        data = f.read()[: 3 << 20]
    comp = oracle.compress(data, quality=9, lgwin=22)
    print(f"input {len(data)} -> {len(comp)} bytes (C q9)")

    lib = nb.get_lib()
    import ctypes
    out = ctypes.create_string_buffer(len(data) + 64)

    def ours():
        sz = ctypes.c_size_t(len(data) + 64)
        r = lib.BrotliDecoderDecompress(
            ctypes.c_size_t(len(comp)), comp, ctypes.byref(sz), out)
        assert r == 1 and sz.value == len(data)

    def theirs():
        assert oracle.decompress(comp, max_size_hint=len(data)) == data

    ours(); theirs()  # warm
    t_ours = []
    t_c = []
    for _ in range(reps):
        t0 = time.perf_counter(); ours(); t1 = time.perf_counter()
        theirs(); t2 = time.perf_counter()
        t_ours.append(t1 - t0); t_c.append(t2 - t1)
    mo, mc = min(t_ours), min(t_c)
    print(f"ours  {len(data)/mo/1e6:8.1f} MB/s")
    print(f"C     {len(data)/mc/1e6:8.1f} MB/s")
    print(f"ratio (ours/C speed) {mc/mo:.3f}")

    if "--counters" in sys.argv:
        import subprocess
        code = ("import sys, ctypes; sys.path.insert(0, %r); "
                "from brotli_tpu import native_bridge as nb; "
                "lib = nb.get_lib(); "
                "comp = open('/tmp/_dec_ab.br','rb').read(); "
                "out = ctypes.create_string_buffer(%d); "
                "sz = ctypes.c_size_t(%d); "
                "lib.BrotliDecoderDecompress(ctypes.c_size_t(len(comp)),"
                " comp, ctypes.byref(sz), out)"
                % (sys.path[0], len(data) + 64, len(data) + 64))
        with open("/tmp/_dec_ab.br", "wb") as f:
            f.write(comp)
        r = subprocess.run(
            [sys.executable, "-c", code],
            env=dict(os.environ, BROTLI_TPU_DEC_CTR="1"),
            capture_output=True)
        print(r.stderr.decode().strip())


if __name__ == "__main__":
    main()
