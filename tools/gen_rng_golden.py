#!/usr/bin/env python3
"""Numpy legacy-RandomState goldens for graft.rng.NumpyRandom (NumpyRandomSpec).

Emits src/test/resources/fixtures/numpy_rng_golden.tsv with bit-exact values
from numpy's legacy global RNG (the API the reference uses: np.random.seed /
permutation / randn / random_sample — featsel.py:229-231,34-37,139).

Sections (one TSV row each, fields tab-separated):
  dbl   <seed> <n>        hex-LE-double...       np.random.random_sample(n)
  gauss <seed> <n>        hex-LE-double...       np.random.randn(n)
  perm  <seed> <n> <k>    int...                 np.random.permutation(n)[:k]
  permsum <seed> <n>      <sum>                  checksum of the full permutation
  seq   <seed> ...        mixed featsel-shaped sequence (see below)
  gaussstream <seed> <n>  <sha256-hex>           digest of n randn doubles (LE bytes)

The `seq` rows pin CROSS-CALL stream continuity exactly as featsel consumes it:
  seed(i); permutation(n)[:m]; permutation(n*d) first 8; randn(n,g) C-order
  first 8; one more permutation(n) first 8.
Doubles are hex of the 8 little-endian IEEE-754 bytes.
"""
import hashlib
import struct
import numpy as np

OUT = "src/test/resources/fixtures/numpy_rng_golden.tsv"


def hexd(x):
    return struct.pack("<d", float(x)).hex()


rows = []
for seed in [0, 1, 2, 5, 42, 1337, 123456789, 2**32 - 1]:
    np.random.seed(seed)
    rows.append(["dbl", seed, 12] + [hexd(v) for v in np.random.random_sample(12)])
    np.random.seed(seed)
    rows.append(["gauss", seed, 11] + [hexd(v) for v in np.random.randn(11)])
    np.random.seed(seed)
    p = np.random.permutation(13)
    rows.append(["perm", seed, 13, 13] + [int(v) for v in p])
    np.random.seed(seed)
    p = np.random.permutation(1000)
    rows.append(["perm", seed, 1000, 20] + [int(v) for v in p[:20]])
    rows.append(["permsum", seed, 1000, int(np.sum(np.arange(1000, dtype=np.int64) * p))])

# featsel-shaped composed sequences: stream continuity across call kinds
for seed in range(6):
    n, d, g = 80, 4, 3
    m = max(10, int(0.85 * n))
    np.random.seed(seed)
    sub = np.random.permutation(n)[:m]
    flat = np.random.permutation(n * d)
    gz = np.random.randn(n, g)
    post = np.random.permutation(n)
    rows.append(
        ["seq", seed, n, d, g, m]
        + [int(v) for v in sub[:10]]
        + [int(np.sum(np.arange(len(sub), dtype=np.int64) * sub))]
        + [int(v) for v in flat[:8]]
        + [int(np.sum(np.arange(n * d, dtype=np.int64) * flat))]
        + [hexd(v) for v in gz.ravel()[:8]]
        # sequential C-order sum (numpy's .sum() is pairwise; the Scala side
        # folds left, so the checksum must be sequential on both sides)
        + [hexd(sum(gz.ravel().tolist(), 0.0))]
        + [int(v) for v in post[:8]]
    )

# long gauss window: pins GlibcLog vs glibc log agreement over 200k draws
for seed in [42, 7]:
    np.random.seed(seed)
    z = np.random.randn(200_000)
    dig = hashlib.sha256(z.astype("<f8").tobytes()).hexdigest()
    rows.append(["gaussstream", seed, 200_000, dig])

# direct libm log goldens for GlibcLog: wide-range, near-1 and subnormal inputs
import ctypes
import random as pyrandom

libm = ctypes.CDLL("libm.so.6")
libm.log.restype = ctypes.c_double
libm.log.argtypes = [ctypes.c_double]
pyrandom.seed(99)
log_inputs = [pyrandom.random() for _ in range(40)]
log_inputs += [
    struct.unpack("<d", struct.pack("<Q", pyrandom.getrandbits(62) | (1 << 52)))[0]
    for _ in range(40)
]
lo_u = struct.unpack("<Q", struct.pack("<d", 0.9375))[0] - (1 << 46)
hi_u = struct.unpack("<Q", struct.pack("<d", float.fromhex("0x1.09p-4") + 1.0))[0] + (1 << 46)
log_inputs += [
    struct.unpack("<d", struct.pack("<Q", pyrandom.randrange(lo_u, hi_u)))[0]
    for _ in range(40)
]
log_inputs += [
    struct.unpack("<d", struct.pack("<Q", pyrandom.getrandbits(50) | 1))[0]
    for _ in range(20)
]
log_inputs.append(1.0)
for x in log_inputs:
    if x > 0 and np.isfinite(x):
        rows.append(["logpair", hexd(x), hexd(libm.log(x))])

with open(OUT, "w") as f:
    for r in rows:
        f.write("\t".join(str(x) for x in r) + "\n")
print(f"wrote {OUT} ({len(rows)} rows)")
