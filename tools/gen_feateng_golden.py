#!/usr/bin/env python3
"""Generate golden fixtures from the REFERENCE feateng implementation.

Produces, for the F2 regression fixture (tests/test_autofeat.py:8-16, seed 15):
- src/test/resources/fixtures/f2_input.parquet  (row_id, x1, x2, x3, target)
- src/test/resources/fixtures/f2_steps{N}_golden.parquet (row_id + all
  engineered columns, float32) for N in {1, 2}
- src/test/resources/fixtures/f2_steps{N}_cols.txt (output column order +
  full filtered pool names)
"""
import sys

sys.path.insert(0, "tools")
import ref_shim  # noqa: F401  (installs numba/sklearn/pint shims)

sys.path.insert(0, "/root/reference/src")
import numpy as np
import pandas as pd
from autofeat.feateng import engineer_features

OUT = "src/test/resources/fixtures"


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    np.random.seed(15)
    x1 = np.random.rand(1000)
    x2 = np.random.randn(1000)
    x3 = np.random.rand(1000)
    target = 2 + 15 * x1 + 3 / (x2 - 1 / x3) + 5 * (x2 + np.log(x1)) ** 3
    dfin = pd.DataFrame({"x1": x1, "x2": x2, "x3": x3})
    inp = dfin.copy()
    inp.insert(0, "row_id", np.arange(len(inp)))
    inp["target"] = target
    inp.to_parquet(f"{OUT}/f2_input.parquet", index=False)

    for steps in (1, 2, 3):
        df, pool = engineer_features(dfin.copy(), max_steps=steps, verbose=0)
        golden = df.copy()
        golden.insert(0, "row_id", np.arange(len(golden)))
        golden.to_parquet(f"{OUT}/f2_steps{steps}_golden.parquet", index=False)
        with open(f"{OUT}/f2_steps{steps}_cols.txt", "w") as fh:
            fh.write("\t".join(map(str, df.columns)) + "\n")
            fh.write("\t".join(map(str, pool.keys())) + "\n")
        print(f"steps={steps}: {len(df.columns)} cols, pool={len(pool)}")
        if steps == 3:
            # float64 serving-path golden on a deterministic column sample
            # (the float32 fit matrix is too ill-conditioned for value parity
            # on difference-reciprocal columns; mirror FeatEngSpec's sampling:
            # every (len//120+1)-th new column)
            import sympy
            new_cols = [c for c in df.columns if c not in ("x1", "x2", "x3")]
            stride = len(new_cols) // 120 + 1
            sample = new_cols[::stride]
            out = {"row_id": np.arange(len(dfin))}
            cols64 = {c: dfin[c].to_numpy(dtype=float) for c in dfin.columns}
            for name in sample:
                expr = pool[name]
                syms = sorted(expr.free_symbols, key=lambda s: str(s))
                fn = sympy.lambdify(syms, expr)
                out[name] = fn(*[cols64[str(s)] for s in syms]).astype(float)
            pd.DataFrame(out).to_parquet(f"{OUT}/f2_steps3_float64_golden.parquet", index=False)
            print(f"steps=3 float64 sample: {len(sample)} cols")

    # deep-wave fixture: 2 features, reduced transform set, steps 4 and 5 —
    # pins the scheduler's alternating transform/combine loop beyond the
    # reference's own steps=3 tests (name sets only; values are covered by
    # the shared canonicalizer + projection parity above)
    df4in = dfin[["x1", "x2"]].copy()
    for steps, trans in ((4, ("1/", "^2", "sqrt")),):
        df4, pool4 = engineer_features(
            df4in.copy(), max_steps=steps, transformations=trans, verbose=0)
        with open(f"{OUT}/f4_steps{steps}_cols.txt", "w") as fh:
            fh.write("\t".join(map(str, df4.columns)) + "\n")
            fh.write("\t".join(map(str, pool4.keys())) + "\n")
        print(f"deep steps={steps}: {len(df4.columns)} cols, pool={len(pool4)}")


if __name__ == "__main__":
    main()
