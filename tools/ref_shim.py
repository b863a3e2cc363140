"""Minimal stand-ins for numba/sklearn/pint so the REFERENCE's feateng.py can
run in this sandbox (no egress; only numpy/pandas/sympy are installed) to
produce golden fixtures. The shims preserve numerical semantics:
- numba.njit is an identity decorator (numpy ops on float32 arrays stay float32)
- numba.vectorize casts inputs/outputs to float32 like the compiled kernel
- sklearn.preprocessing.StandardScaler replicates ddof=0 standardization
Import this BEFORE importing autofeat modules.
"""
import sys
import types

import numpy as np


def _install():
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def njit(*args, **kwargs):
            if args and callable(args[0]):
                return args[0]
            return lambda f: f

        def vectorize(signatures, nopython=True):
            def deco(f):
                def wrapped(a, b):
                    a32 = np.asarray(a, dtype=np.float32)
                    b32 = np.asarray(b, dtype=np.float32)
                    with np.errstate(all="ignore"):
                        return np.asarray(f(a32, b32), dtype=np.float32)
                return wrapped
            return deco

        numba.njit = njit
        numba.vectorize = vectorize
        numba.TypingError = type("TypingError", (Exception,), {})
        sys.modules["numba"] = numba

    if "pint" not in sys.modules:
        pint = types.ModuleType("pint")
        pint.DimensionalityError = type("DimensionalityError", (Exception,), {})
        pint.OffsetUnitCalculusError = type("OffsetUnitCalculusError", (Exception,), {})
        pint.UnitRegistry = lambda **kw: None
        pint.UndefinedUnitError = type("UndefinedUnitError", (Exception,), {})
        pint.formatter = lambda *a, **kw: ""
        sys.modules["pint"] = pint

    if "sklearn" not in sys.modules:
        sklearn = types.ModuleType("sklearn")
        prep = types.ModuleType("sklearn.preprocessing")

        class StandardScaler:
            def __init__(self, with_mean=True, with_std=True):
                self.with_mean = with_mean
                self.with_std = with_std

            def fit_transform(self, X):
                X = np.asarray(X, dtype=np.float64)
                m = X.mean(axis=0) if self.with_mean else 0.0
                s = X.std(axis=0)  # ddof=0 like sklearn
                s = np.where(s == 0.0, 1.0, s)
                if not self.with_std:
                    s = 1.0
                return (X - m) / s

        class OneHotEncoder:
            def __init__(self, sparse_output=False, categories="auto"):
                pass

            def fit_transform(self, X):
                X = np.asarray(X).ravel()
                self.categories_ = [np.array(sorted(set(X), key=str))]
                cats = list(self.categories_[0])
                out = np.zeros((len(X), len(cats)))
                for i, v in enumerate(X):
                    out[i, cats.index(v)] = 1.0
                return out

        class PowerTransformer:
            def __init__(self, *a, **kw):
                raise NotImplementedError

        prep.StandardScaler = StandardScaler
        prep.OneHotEncoder = OneHotEncoder
        prep.PowerTransformer = PowerTransformer
        sklearn.preprocessing = prep
        sklearn.__path__ = []  # mark as package

        base = types.ModuleType("sklearn.base")
        class BaseEstimator: pass
        class ClassifierMixin: pass
        class RegressorMixin: pass
        base.BaseEstimator = BaseEstimator
        base.ClassifierMixin = ClassifierMixin
        base.RegressorMixin = RegressorMixin
        sklearn.base = base

        val = types.ModuleType("sklearn.utils.validation")

        def check_array(X, force_all_finite=True, dtype="numeric", **kw):
            X = np.asarray(X)
            if dtype not in (None,) and X.dtype.kind not in "OUS":
                X = X.astype(np.float64)
            if force_all_finite is True and X.dtype.kind == "f" and not np.isfinite(X).all():
                raise ValueError("Input contains NaN or infinity")
            return X

        def check_X_y(X, y, y_numeric=False, dtype="numeric", **kw):
            return check_array(X, dtype=dtype), np.asarray(y, dtype=float if y_numeric else None).ravel()

        def check_is_fitted(est, attrs=None):
            if attrs:
                for a in attrs:
                    if not hasattr(est, a):
                        raise ValueError(f"not fitted: {a}")

        val.check_array = check_array
        val.check_X_y = check_X_y
        val.check_is_fitted = check_is_fitted
        utils = types.ModuleType("sklearn.utils")
        utils.validation = val

        lm = types.ModuleType("sklearn.linear_model")
        lm.LassoLarsCV = None   # replaced by callers that need a solver
        lm.LogisticRegressionCV = None

        sys.modules["sklearn"] = sklearn
        sys.modules["sklearn.preprocessing"] = prep
        sys.modules["sklearn.base"] = base
        sys.modules["sklearn.utils"] = utils
        sys.modules["sklearn.utils.validation"] = val
        sys.modules["sklearn.linear_model"] = lm

    if "joblib" not in sys.modules:
        joblib = types.ModuleType("joblib")
        joblib.Parallel = lambda **kw: (lambda gen: [f(*a, **k) for f, a, k in gen])
        joblib.delayed = lambda f: (lambda *a, **k: (f, a, k))
        sys.modules["joblib"] = joblib


_install()
