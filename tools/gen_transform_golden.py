#!/usr/bin/env python3
"""Generate the TRANSFORM-TIME (float64) golden from the reference.

The fit path stores features as float32 (feateng.py:145); at transform time
the reference regenerates selected features in float64 via lambdify on the
raw columns (autofeat.py:176-242). This is the production/serving-path
number the north rule's allclose (rtol 1e-5) applies to. We evaluate every
formula in the steps=2 engineered pool at float64 exactly as
_generate_features does and save it for the Scala rtol-1e-5 parity spec.
"""
import sys

sys.path.insert(0, "tools")
import ref_shim  # noqa: F401

sys.path.insert(0, "/root/reference/src")
import numpy as np
import pandas as pd
import sympy
from autofeat.feateng import engineer_features

OUT = "src/test/resources/fixtures"


def main():
    np.random.seed(15)
    x1 = np.random.rand(1000)
    x2 = np.random.randn(1000)
    x3 = np.random.rand(1000)
    dfin = pd.DataFrame({"x1": x1, "x2": x2, "x3": x3})

    df, pool = engineer_features(dfin.copy(), max_steps=2, verbose=0)
    new_cols = [c for c in df.columns if c not in ("x1", "x2", "x3")]

    # float64 regeneration, mirroring autofeat.py:176-242: lambdify on the
    # RAW float64 columns (not the float32 fit matrix)
    out = {"row_id": np.arange(len(dfin))}
    cols64 = {c: dfin[c].to_numpy(dtype=float) for c in dfin.columns}
    for name in new_cols:
        expr = pool[name]
        syms = sorted(expr.free_symbols, key=lambda s: str(s))
        fn = sympy.lambdify(syms, expr)
        out[name] = fn(*[cols64[str(s)] for s in syms]).astype(float)
    pd.DataFrame(out).to_parquet(f"{OUT}/f2_steps2_float64_golden.parquet", index=False)
    print(f"wrote {len(new_cols)} float64 columns")


if __name__ == "__main__":
    main()
