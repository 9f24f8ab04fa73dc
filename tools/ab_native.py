"""Interleaved A/B benchmark for two builds of the native runtime.

This VM's wall clock drifts +-30% over minutes, so sequential
benchmarking of two builds is meaningless.  This tool loads two
pre-built .so files into ONE process, swaps them under native_bridge,
and alternates A/B/A/B taking min-of-N per build — drift hits both
sides equally.

Usage:
    # build the current tree's .so, stash, build the old one, restore:
    python tools/ab_native.py --prepare /tmp/new.so      # current tree
    git stash && python tools/ab_native.py --prepare /tmp/old.so && git stash pop
    python tools/ab_native.py /tmp/old.so /tmp/new.so --what parse9 parse5
"""

import argparse
import ctypes
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def prepare(out_path):
    """Compile the working tree's native sources to out_path."""
    from brotli_tpu import native_bridge as nb
    r = subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
         *nb._SRCS, "-o", out_path + ".tmp"],
        check=True, capture_output=True, timeout=600)
    del r
    shutil.move(out_path + ".tmp", out_path)
    print("built", out_path)


def load_as_lib(path):
    """ctypes-load a .so and configure restypes like get_lib does."""
    lib = ctypes.CDLL(path)
    for fn, rt in [
        ("greedy_parse_native", ctypes.c_int64),
        ("decode_native", ctypes.c_int64),
        ("combined_parse_native", ctypes.c_int64),
        ("collect_matches_native", ctypes.c_int64),
        ("zopfli_cands_native", ctypes.c_int64),
        ("collect_dict_native", ctypes.c_int64),
        ("pack_bits_native", ctypes.c_int64),
        ("encode_metablock_native", ctypes.c_int64),
        ("zopfli_backtrack_native", ctypes.c_int64),
        ("find_matches_native", ctypes.c_int64),
    ]:
        try:
            getattr(lib, fn).restype = rt
        except AttributeError:
            pass
    return lib


def corpus4m():
    from bench import build_corpus
    return build_corpus()[: 4 << 20]


def make_tasks(which):
    sl = np.frombuffer(corpus4m(), np.uint8)
    from brotli_tpu import native_bridge as nb
    tasks = {}

    def parse(kw):
        def run():
            return nb.combined_parse(sl, 1 << 22, [len(sl)],
                                     literal_byte_score=540,
                                     use_dictionary=True, **kw)
        return run

    tasks["parse9"] = parse(dict(k=24, bucket_bits=16, k8=8,
                                 bucket_bits8=16, hash_len=5,
                                 n_cache=16))
    tasks["parse5"] = parse(dict(k=8, bucket_bits=15, k8=4,
                                 bucket_bits8=15, hash_len=5))

    def encode(q):
        from brotli_tpu import compress

        def run():
            return compress(bytes(sl), quality=q)
        return run

    tasks["enc5"] = encode(5)
    tasks["enc9"] = encode(9)
    tasks["enc11"] = encode(11)

    def dec(q):
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tests"))
        import oracle
        comp = oracle.compress(bytes(sl), quality=q)
        from brotli_tpu import decompress

        def run():
            return decompress(comp)
        return run

    if any(w == "dec" for w in which):
        tasks["dec"] = dec(9)
    if any(w == "dec5" for w in which):
        tasks["dec5"] = dec(5)
    return {w: tasks[w] for w in which}, len(sl)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sos", nargs="*", help="two .so paths: old new")
    ap.add_argument("--prepare", help="compile working tree to PATH")
    ap.add_argument("--what", nargs="+", default=["parse9", "parse5"],
                    choices=["parse9", "parse5", "enc5", "enc9", "dec5",
                             "enc11", "dec"])
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()
    if args.prepare:
        prepare(args.prepare)
        return
    assert len(args.sos) == 2, "need two .so paths (old new)"
    from brotli_tpu import native_bridge as nb
    libs = [(os.path.basename(p), load_as_lib(p)) for p in args.sos]
    for _, lib in libs:
        nb._install_decoder_dictionary(lib)
    nb._tried = True
    tasks, nbytes = make_tasks(args.what)
    for name, fn in tasks.items():
        best = {lbl: 1e9 for lbl, _ in libs}
        size = {}
        for _ in range(args.rounds):
            for lbl, lib in libs:
                nb._lib = lib
                t0 = time.perf_counter()
                r = fn()
                best[lbl] = min(best[lbl], time.perf_counter() - t0)
                if isinstance(r, (bytes, bytearray)):
                    size[lbl] = len(r)
        line = f"{name:8s} "
        for lbl, _ in libs:
            line += f" {lbl}: {nbytes / best[lbl] / 1e6:7.2f} MB/s"
            if lbl in size:
                line += f" ({size[lbl]} B)"
        vals = [best[lbl] for lbl, _ in libs]
        line += f"   new/old speed: {vals[0] / vals[1]:.3f}x"
        print(line)


if __name__ == "__main__":
    main()
