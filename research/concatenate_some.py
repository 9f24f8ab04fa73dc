"""Randomized concatenation fuzzer (reference research/concatenate_some.py):
split a file at random points, compress the pieces appendable/catable at
random qualities, merge with BroCatli, and SHA-256-verify the round trip
against the original.  Usage: python research/concatenate_some.py FILE [N]
"""
import hashlib
import random
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from brotli_tpu import compress, concatenate, decompress


def main():
    path = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    with open(path, "rb") as f:
        data = f.read()
    want = hashlib.sha256(data).hexdigest()
    rng = random.Random(1234)
    for t in range(trials):
        k = rng.randint(2, 6)
        cuts = sorted(rng.randrange(len(data) + 1) for _ in range(k - 1))
        parts, prev = [], 0
        for c in cuts + [len(data)]:
            parts.append(data[prev:c])
            prev = c
        streams = [compress(parts[0], quality=rng.randint(2, 11),
                            appendable=True)]
        streams += [compress(p, quality=rng.randint(2, 11), catable=True)
                    for p in parts[1:]]
        joined = concatenate(streams)
        got = hashlib.sha256(decompress(joined)).hexdigest()
        status = "OK" if got == want else "MISMATCH"
        print(f"trial {t}: {k} parts, {len(joined)} bytes -> {status}")
        if got != want:
            sys.exit(1)
    print("all trials OK")


if __name__ == "__main__":
    main()
