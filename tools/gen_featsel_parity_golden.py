#!/usr/bin/env python3
"""Bit-exact selection-parity golden: runs the REFERENCE featsel.select_features
verbatim (under tools/ref_shim.py) on the reference's own test fixture
(/root/reference/tests/test_featsel.py:8-18, seed 15) with a deterministic
shared CV-lasso solver injected for sklearn's LassoLarsCV, and dumps the
fixture plus stage-by-stage traces for graft.select.NumpyParity to reproduce
bit-for-bit (NumpyParitySpec).

The solver (ParityLasso below) is NOT sklearn's LARS: it is a deliberately
simple, operation-order-pinned 5-fold-CV coordinate-descent lasso implemented
twice — here and in graft/select/ParityLasso.scala — with identical scalar
float64 op order, so that the *reference control flow around it* (RNG draw
order, numpy float32 pairwise reductions, CPython set iteration order, Counter
tie-breaks, pandas corr filtering) is what the parity test actually pins.
Everything here not part of the solver is the reference's own code running
unmodified.

Output: src/test/resources/fixtures/featsel_parity_golden.tsv
Sections (tab-separated; doubles as hex of 8 LE IEEE-754 bytes):
  X       <row> <hex...>                 fixture row (7 cols, float64)
  y       <hex...>                       target (1000 values, chunked rows)
  scaled_sha  <sha256>                   df_scaled.to_numpy() (f32, C-order) bytes
  tscaled_sha <sha256>                   target_scaled (f64) bytes
  run     <i> <selected labels...>       per-run _select_features_1run output
  randidx <i> <first 12 ints> <checksum> per-run subsample rand_idx
  initcoef <i> <sha256>                  per-run initial-fit coef_ bytes
  counter <labels...>                    Counter order after tie-break sort
  corrkeep <labels...>                   good_cols after correlation filter
  final   <labels...>                    final selection (after last noise filter)
"""
import hashlib
import struct
import sys

sys.path.insert(0, "/root/repo/tools")
import ref_shim  # noqa: F401  (installs numba/sklearn/pint/joblib shims)

sys.path.insert(0, "/root/reference/src")

import numpy as np
import pandas as pd

OUT = "src/test/resources/fixtures/featsel_parity_golden.tsv"
OUT2 = "src/test/resources/fixtures/featsel_parity_golden2.tsv"


# --------------------------------------------------------------------------
# Shared deterministic solver (twin: graft/select/ParityLasso.scala).
# Pure-python floats only; every reduction is a sequential ascending loop.
# --------------------------------------------------------------------------
K_LAMBDAS = 40
CD_TOL = 1e-12
CD_MAX_SWEEPS = 1000


def _cd_solve(G, c, L, w):
    d = len(c)
    for _ in range(CD_MAX_SWEEPS):
        max_delta = 0.0
        for j in range(d):
            gjj = G[j][j]
            if gjj <= 0.0:
                wj = 0.0
            else:
                dot = 0.0
                row = G[j]
                for k in range(d):
                    dot += row[k] * w[k]
                rho = c[j] - dot + gjj * w[j]
                if rho > L:
                    wj = (rho - L) / gjj
                elif rho < -L:
                    wj = (rho + L) / gjj
                else:
                    wj = 0.0
            delta = wj - w[j]
            if delta < 0.0:
                delta = -delta
            if delta > max_delta:
                max_delta = delta
            w[j] = wj
        if max_delta <= CD_TOL:
            break
    return w


def _means(X, y, rows):
    d = len(X[0]) if X else 0
    n = len(rows)
    mx = [0.0] * d
    for j in range(d):
        s = 0.0
        for i in rows:
            s += X[i][j]
        mx[j] = s / n
    s = 0.0
    for i in rows:
        s += y[i]
    return mx, s / n


def _gram(X, y, rows, mx, my):
    d = len(mx)
    G = [[0.0] * d for _ in range(d)]
    c = [0.0] * d
    for j in range(d):
        for k in range(j, d):
            s = 0.0
            for i in rows:
                s += (X[i][j] - mx[j]) * (X[i][k] - mx[k])
            G[j][k] = s
            G[k][j] = s
        s = 0.0
        for i in rows:
            s += (X[i][j] - mx[j]) * (y[i] - my)
        c[j] = s
    return G, c


class ParityLasso:
    """Injected as sklearn.linear_model.LassoLarsCV: 5-fold contiguous-block
    CV over a fixed geometric lambda path, cyclic coordinate descent on the
    centered Gram, warm-started along the path. Deterministic, exception-free
    (the reference's ValueError-retry path at featsel.py:118-124 therefore
    never consumes RNG draws)."""

    def __init__(self, cv=5, eps=None, **kw):
        self.cv = cv

    def fit(self, X, y):
        Xa = np.asarray(X, dtype=np.float64)
        ya = np.asarray(y, dtype=np.float64).ravel()
        n, d = Xa.shape
        Xl = [[float(v) for v in row] for row in Xa]
        yl = [float(v) for v in ya]
        if d == 0:
            self.coef_ = np.zeros(0)
            return self
        nfolds = self.cv
        base, extra = n // nfolds, n % nfolds
        bounds = []
        start = 0
        for s in range(nfolds):
            size = base + (1 if s < extra else 0)
            bounds.append((start, start + size))
            start += size
        all_rows = list(range(n))
        mx_full, my_full = _means(Xl, yl, all_rows)
        lam_max = 0.0
        for j in range(d):
            s = 0.0
            for i in all_rows:
                s += (Xl[i][j] - mx_full[j]) * (yl[i] - my_full)
            a = s / n
            if a < 0.0:
                a = -a
            if a > lam_max:
                lam_max = a
        if not (lam_max > 0.0) or lam_max != lam_max or lam_max == float("inf"):
            self.coef_ = np.zeros(d)
            return self
        # exact-binary ratio (0.75) so the lambda grid is bit-identical across
        # languages (library pow differs by ULPs between glibc and the JVM)
        lams = [lam_max]
        for _ in range(K_LAMBDAS - 1):
            lams.append(lams[-1] * 0.75)
        cv_err = [0.0] * K_LAMBDAS
        for lo, hi in bounds:
            train = [i for i in all_rows if i < lo or i >= hi]
            ntr = len(train)
            mx, my = _means(Xl, yl, train)
            G, c = _gram(Xl, yl, train, mx, my)
            w = [0.0] * d
            for t in range(K_LAMBDAS):
                w = _cd_solve(G, c, lams[t] * ntr, w)
                for i in range(lo, hi):
                    pred = my
                    xi = Xl[i]
                    for j in range(d):
                        pred += w[j] * (xi[j] - mx[j])
                    r = yl[i] - pred
                    cv_err[t] += r * r
        best = 0
        for t in range(1, K_LAMBDAS):
            if cv_err[t] < cv_err[best]:
                best = t
        G, c = _gram(Xl, yl, all_rows, mx_full, my_full)
        w = [0.0] * d
        for t in range(best + 1):
            w = _cd_solve(G, c, lams[t] * n, w)
        self.coef_ = np.array(w, dtype=np.float64)
        return self


# inject BEFORE importing the reference module
sys.modules["sklearn.linear_model"].LassoLarsCV = ParityLasso

from autofeat import featsel  # noqa: E402  (the REFERENCE module, unmodified)


def hexd(x):
    return struct.pack("<d", float(x)).hex()


def run_fixture(X, target, out):
    rows = []
    for i in range(X.shape[0]):
        rows.append(["X", i] + [hexd(v) for v in X[i]])
    for lo in range(0, len(target), 100):
        rows.append(["y", lo] + [hexd(v) for v in target[lo : lo + 100]])

    # trace hooks: pass-through wrappers, no semantic change
    run_selected = []
    rand_idxs = []
    init_coefs = []
    orig_1run = featsel._select_features_1run
    orig_perm = np.random.permutation
    orig_counter_sorted = {}

    def traced_perm(x):
        p = orig_perm(x)
        # first permutation after each seed(i) is the subsample index draw
        if isinstance(x, pd.RangeIndex):
            rand_idxs.append(np.array(p))
        return p

    class TracedLasso(ParityLasso):
        def fit(self, X, y):
            super().fit(X, y)
            if not init_coefs or init_coefs[-1][0] != len(run_selected):
                init_coefs.append((len(run_selected), hashlib.sha256(self.coef_.tobytes()).hexdigest()))
            return self

    def traced_1run(df, target, problem_type="regression", verbose=0):
        r = orig_1run(df, target, problem_type, verbose)
        run_selected.append(list(r))
        return r

    featsel._select_features_1run = traced_1run
    np.random.permutation = traced_perm
    sys.modules["sklearn.linear_model"].LassoLarsCV = TracedLasso
    featsel.lm.LassoLarsCV = TracedLasso

    df = pd.DataFrame(X)

    # recompute the scaled frame exactly as select_features does, for the digest
    from autofeat.nb_utils import nb_standard_scale

    df_scaled = pd.DataFrame(nb_standard_scale(df.to_numpy()), columns=df.columns, dtype=np.float32)
    target_scaled = nb_standard_scale(target.reshape(-1, 1)).ravel()
    rows.append(["scaled_sha", hashlib.sha256(df_scaled.to_numpy().tobytes()).hexdigest()])
    rows.append(["tscaled_sha", hashlib.sha256(target_scaled.tobytes()).hexdigest()])

    # capture counter order + corr survivors by replicating the two pure
    # stages outside (validated below against the real run's final output)
    good = featsel.select_features(df, target, featsel_runs=5, keep=None, problem_type="regression", n_jobs=1, verbose=0)

    from collections import Counter

    sel_flat = [c for run in run_selected for c in run]
    counter = Counter(sel_flat)
    counter_order = sorted(counter, key=lambda x: counter[x] - 0.000001 * len(str(x)), reverse=True)
    rows.append(["counter"] + [str(int(c)) for c in counter_order])

    corr_keep = [counter_order[0]]
    if len(counter_order) > 1:
        correlations = df_scaled[counter_order].corr()
        for i, c in enumerate(counter_order[1:], 1):
            if np.max(np.abs(correlations[c].ravel()[:i])) < 0.9:
                corr_keep.append(c)
    rows.append(["corrkeep"] + [str(int(c)) for c in corr_keep])

    for i, sel in enumerate(run_selected):
        rows.append(["run", i] + [str(int(c)) for c in sel])
    for i, ridx in enumerate(rand_idxs[:5]):
        chk = int(np.sum(np.arange(len(ridx), dtype=np.int64) * ridx))
        rows.append(["randidx", i] + [str(int(v)) for v in ridx[:12]] + [str(chk)])
    for i, sha in init_coefs[:5]:
        rows.append(["initcoef", i, sha])
    rows.append(["final"] + [str(int(c)) for c in good])

    with open(out, "w") as f:
        for r in rows:
            f.write("\t".join(str(v) for v in r) + "\n")
    # restore patched globals for the next fixture
    featsel._select_features_1run = orig_1run
    np.random.permutation = orig_perm
    print("runs:", [len(r) for r in run_selected])
    print("counter:", [int(c) for c in counter_order])
    print("corrkeep:", [int(c) for c in corr_keep])
    print("final:", [int(c) for c in good])
    print("wrote", out)


def main():
    # fixture 1: the reference's own test fixture, test_featsel.py:8-18 (seed 15)
    np.random.seed(15)
    x1 = np.random.rand(1000)
    x2 = np.random.randn(1000)
    x3 = np.random.rand(1000)
    x4 = np.random.randn(1000)
    x5 = np.random.rand(1000)
    target = 2 + 15 * x1 + 3 / (x2 - 1 / x3) + 5 * (x2 + np.log(x1)) ** 3
    X = np.vstack([x1, x2, x3, x4, x5, 1 / (x2 - 1 / x3), (x2 + np.log(x1)) ** 3]).T
    run_fixture(X, target, OUT)

    # fixture 2: adversarial — small n (multi-split path), wide d, a
    # near-duplicate column pair (correlation filter), weak signals so the
    # runs disagree and the Counter tie-break does real work
    np.random.seed(101)
    n, d = 60, 30
    X2 = np.random.randn(n, d)
    X2[:, 1] = X2[:, 0] + 0.02 * np.random.randn(n)   # corr ~ 0.999 with col 0
    # signal split across the near-dup pair so different subsamples pick
    # either column -> both enter the vote, the later one must be dropped
    # by the correlation filter
    t2 = 1.0 * X2[:, 0] + 1.0 * X2[:, 1] - 1.5 * X2[:, 5] + 1.0 * X2[:, 9] + 0.3 * X2[:, 12] + 0.1 * np.random.randn(n)
    run_fixture(X2, t2, OUT2)


if __name__ == "__main__":
    main()
