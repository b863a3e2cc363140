#!/usr/bin/env python3
"""Extract glibc's __log_data table from the runtime libm and emit
src/main/scala/graft/rng/LogData.scala.

graft.rng.GlibcLog reimplements the published glibc/ARM-optimized-routines
double-precision log algorithm (glibc sysdeps/ieee754/dbl-64/e_log.c); numpy's
legacy RandomState gauss draws call that exact libm function, so bit-level
gauss parity (NumpyRandom.nextGauss) needs the same polynomial/table data the
runtime libm uses. The struct layout (ln2hi, ln2lo, poly[5], poly1[11],
tab[128]{invc,logc}) is from the public glibc source; the bytes are read out
of the installed libm.so.6 and located by the unique ln2hi||ln2lo prefix.

After extraction, a Python reimplementation of the exact FMA-variant
instruction sequence (read from the libm disassembly: vfmadd order matters —
see GlibcLog.scala) is verified bit-for-bit against ctypes libm.log on random
normals, subnormals and a dense near-1.0 sweep before the Scala file is
written; any mismatch aborts.
"""
import ctypes
import math
import random
import struct
from fractions import Fraction

LIBM = "/lib/x86_64-linux-gnu/libm.so.6"
OUT = "src/main/scala/graft/rng/LogData.scala"
N = 128


def asu(x):
    return struct.unpack("<Q", struct.pack("<d", x))[0]


def asd(u):
    return struct.unpack("<d", struct.pack("<Q", u & 0xFFFFFFFFFFFFFFFF))[0]


data = open(LIBM, "rb").read()
pat = struct.pack("<Q", 0x3FE62E42FEFA3800) + struct.pack("<Q", 0x3D2EF35793C76730)
off = data.find(pat)
assert off != -1, "ln2hi/ln2lo prefix not found in libm"
# Disambiguate from __pow_log_data (same ln2 pair): __log_data's poly1[0] is
# exactly -0.5 at +7 doubles and poly[0] ~ -0.5+ulp at +2 doubles.
while off != -1:
    probe = struct.unpack_from("<18d", data, off)
    if probe[7] == -0.5 and abs(probe[2] + 0.5) < 1e-15 and probe[2] != -0.5:
        break
    off = data.find(pat, off + 1)
assert off != -1, "__log_data layout not identified"

vals = struct.unpack_from("<%dd" % (2 + 5 + 11 + 2 * N), data, off)
ln2hi, ln2lo = vals[0], vals[1]
A = vals[2:7]
B = vals[7:18]
tab = [(vals[18 + 2 * i], vals[18 + 2 * i + 1]) for i in range(N)]

libm = ctypes.CDLL(LIBM)
libm.log.restype = ctypes.c_double
libm.log.argtypes = [ctypes.c_double]

fh = float.fromhex
P27 = fh("0x1p27")
P52 = fh("0x1p52")
OFF = 0x3FE6000000000000
LO = asu(1.0 - fh("0x1p-4"))
HI = asu(1.0 + fh("0x1.09p-4"))


def fma(a, b, c):
    return float(Fraction(a) * Fraction(b) + Fraction(c))


def glog(x):
    ix = asu(x)
    if ((ix - LO) & 0xFFFFFFFFFFFFFFFF) < (HI - LO):
        if ix == asu(1.0):
            return 0.0
        r = x - 1.0
        r2 = r * r
        r3 = r * r2
        t1 = fma(r2, B[3], fma(r, B[2], B[1]))
        t2 = fma(r2, B[6], fma(r, B[5], B[4]))
        t3 = fma(r3, B[10], fma(r2, B[9], fma(r, B[8], B[7])))
        v = fma(r3, fma(r3, t3, t2), t1)
        rhi = fma(-P27, r, fma(r, P27, r))
        rlo = r - rhi
        rhi2 = rhi * rhi
        hi = fma(rhi2, B[0], r)
        lo2 = fma(B[0] * rlo, r + rhi, fma(rhi2, B[0], r - hi))
        return hi + fma(r3, v, lo2)
    top = ix >> 48
    if ((top - 0x0010) & 0xFFFFFFFF) >= 0x7FF0 - 0x0010:
        ix = asu(x * P52)
        ix = (ix - (52 << 52)) & 0xFFFFFFFFFFFFFFFF
    tmp = (ix - OFF) & 0xFFFFFFFFFFFFFFFF
    i = (tmp >> 45) % N
    stmp = tmp - (1 << 64) if tmp >= 1 << 63 else tmp
    k = stmp >> 52
    iz = (ix - (tmp & (0xFFF << 52))) & 0xFFFFFFFFFFFFFFFF
    invc, logc = tab[i]
    z = asd(iz)
    r = fma(z, invc, -1.0)
    kd = float(k)
    w = fma(kd, ln2hi, logc)
    hi = w + r
    lo = fma(kd, ln2lo, (w - hi) + r)
    r2 = r * r
    r3 = r * r2
    poly = fma(r2, fma(r, A[4], A[3]), fma(r, A[2], A[1]))
    return fma(r3, poly, fma(r2, A[0], lo)) + hi


random.seed(20260817)
pool = [random.random() for _ in range(60000)]
pool += [asd(random.getrandbits(63)) for _ in range(40000)]
pool += [asd(random.randrange(LO - (1 << 46), HI + (1 << 46))) for _ in range(40000)]
pool += [asd(random.getrandbits(52)) for _ in range(8000)]
checked = bad = 0
for x in pool:
    if not (x > 0 and math.isfinite(x)):
        continue
    checked += 1
    if asu(glog(x)) != asu(libm.log(x)):
        bad += 1
        if bad <= 5:
            print("MISMATCH", x.hex(), glog(x).hex(), libm.log(x).hex())
assert bad == 0, f"{bad}/{checked} mismatches vs libm — layout or sequence wrong"
print(f"verified bit-exact vs libm log on {checked} inputs")


def lit(x):
    u = asu(x)
    return f"0x{u:016x}L"


lines = []
lines.append("package graft.rng")
lines.append("")
lines.append("/** glibc __log_data constants (IEEE-754 bit patterns), extracted from the")
lines.append("  * runtime libm by tools/gen_glibc_log_data.py and verified bit-for-bit")
lines.append("  * against libm.log before emission. Regenerate with that tool; do not")
lines.append("  * hand-edit. Layout: glibc sysdeps/ieee754/dbl-64/e_log.c (public).")
lines.append("  */")
lines.append("private[rng] object LogData {")
lines.append(f"  val Ln2Hi: Double = java.lang.Double.longBitsToDouble({lit(ln2hi)})")
lines.append(f"  val Ln2Lo: Double = java.lang.Double.longBitsToDouble({lit(ln2lo)})")
lines.append("  // poly[5]: log1p(r)-r correction on the main path")
lines.append("  val A: Array[Double] = Array(")
lines.append("    " + ", ".join(lit(a) for a in A))
lines.append("  ).map(java.lang.Double.longBitsToDouble)")
lines.append("  // poly1[11]: the near-1.0 polynomial (B(0) = -0.5 exactly)")
lines.append("  val B: Array[Double] = Array(")
for i in range(0, 11, 4):
    chunk = ", ".join(lit(b) for b in B[i : i + 4])
    sep = "," if i + 4 < 11 else ""
    lines.append(f"    {chunk}{sep}")
lines.append("  ).map(java.lang.Double.longBitsToDouble)")
lines.append("  // tab[128]: (invc, logc) pairs, interleaved")
lines.append("  val Tab: Array[Double] = Array(")
flat = [v for pair in tab for v in pair]
for i in range(0, len(flat), 4):
    chunk = ", ".join(lit(v) for v in flat[i : i + 4])
    sep = "," if i + 4 < len(flat) else ""
    lines.append(f"    {chunk}{sep}")
lines.append("  ).map(java.lang.Double.longBitsToDouble)")
lines.append("}")

with open(OUT, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {OUT}")
