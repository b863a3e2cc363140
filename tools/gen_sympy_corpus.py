#!/usr/bin/env python3
"""Generate a golden corpus of sympy canonicalization behavior.

Mimics the expression constructions performed by the reference's feateng
(transforms + combinations on real symbols, /root/reference/src/autofeat/
feateng.py:161-339) and records, for each construction, the operands (by
corpus index) and the canonical string sympy produces. The Scala FeatureExpr
IR replays the same DAG and must reproduce the names (ExprCorpusSpec).

Run: python3 tools/gen_sympy_corpus.py > src/test/resources/sympy_corpus.json
"""
import json
import sys

import sympy

TRANSFORMS = {
    "1/": lambda x: 1 / x,
    "exp": lambda x: sympy.exp(x),
    "exp-": lambda x: sympy.exp(-x),
    "log": lambda x: sympy.log(x),
    "abs": lambda x: sympy.Abs(x),
    "sqrt": lambda x: sympy.sqrt(x),
    "sin": lambda x: sympy.sin(x),
    "cos": lambda x: sympy.cos(x),
    "2^": lambda x: 2 ** x,
    "^2": lambda x: x ** 2,
    "^3": lambda x: x ** 3,
    "1+": lambda x: 1 + x,
    "1-": lambda x: 1 - x,
}
COMBOS = {
    "x+y": lambda x, y: x + y,
    "x*y": lambda x, y: x * y,
    "x-y": lambda x, y: x - y,
    "y-x": lambda x, y: y - x,
}
DEFAULT_T = ["1/", "exp", "log", "abs", "sqrt", "^2", "^3"]

def main():
    syms = sympy.symbols("x001 x002 x003", real=True)
    exprs = []            # corpus list of sympy exprs
    index = {}            # srepr -> idx (structural identity)
    entries = []

    def register(expr, op, args):
        # skip complex/infinite artifacts (log(-1), sqrt(-1), ...): the real
        # pipeline never transforms constant features (variance filter drops
        # them before they re-enter a transform wave)
        if expr.has(sympy.I, sympy.zoo, sympy.oo, sympy.nan, -sympy.oo, sympy.pi):
            return None
        key = sympy.srepr(expr)
        if key in index:
            idx = index[key]
        else:
            idx = len(exprs)
            exprs.append(expr)
            index[key] = idx
        entries.append({"op": op, "args": args, "idx": idx,
                        "name": str(expr), "isAdd": expr.func == sympy.core.add.Add})
        return idx

    for i, s in enumerate(syms):
        register(s, "var", [f"x{i+1:03d}".replace("x0", "x0")])
        # fix arg to actual name
        entries[-1]["args"] = [str(s)]

    # step 1: all transforms of symbols (full menu for coverage)
    pool = list(range(len(syms)))
    step1 = []
    for i in pool:
        for t, f in TRANSFORMS.items():
            step1.append(register(f(exprs[i]), t, [i]))

    # step 2: combos over (symbols + default-transform results), capped
    pool2 = sorted(set(pool + step1))[:24]
    step2 = []
    for a in range(len(pool2)):
        for b in range(a + 1, len(pool2)):
            for c, f in COMBOS.items():
                step2.append(register(f(exprs[pool2[a]], exprs[pool2[b]]), c,
                                      [pool2[a], pool2[b]]))

    # step 3: default transforms of a sample of step-2 results (nested cases)
    sample = sorted(set(step2))[::7][:60]
    for i in sample:
        for t in DEFAULT_T:
            register(TRANSFORMS[t](exprs[i]), t, [i])

    # targeted algebraic collision cases
    x, y = syms[0], syms[1]
    targeted = [
        ("1/", [index[sympy.srepr(1 / x)]]),                    # 1/(1/x) -> x
        ("^2", [index[sympy.srepr(sympy.sqrt(x))]]),            # sqrt(x)**2 -> x
        ("sqrt", [index[sympy.srepr(x ** 2)]]),                 # sqrt(x^2) -> |x|
        ("abs", [index[sympy.srepr(sympy.Abs(x))]]),            # ||x|| -> |x|
        ("log", [index[sympy.srepr(sympy.exp(x))]]),            # log(exp x) -> x
        ("exp", [index[sympy.srepr(sympy.log(x))]]),            # exp(log x) -> x
        ("^3", [index[sympy.srepr(x ** 2)]]),                   # (x^2)^3 -> x^6
        ("^2", [index[sympy.srepr(x ** 3)]]),                   # (x^3)^2 -> x^6
        ("sqrt", [index[sympy.srepr(sympy.Abs(x))]]),
        ("1/", [index[sympy.srepr(sympy.sqrt(x))]]),
        ("^2", [index[sympy.srepr(1 / x)]]),                    # (1/x)^2 -> x^-2
    ]
    for t, args in targeted:
        register(TRANSFORMS[t](exprs[args[0]]), t, args)
    combo_targeted = [
        ("x*y", x, 1 / x), ("x*y", x, x ** 2), ("x+y", x, x), ("x-y", x, x),
        ("x*y", sympy.sqrt(x), sympy.sqrt(x)), ("x-y", 1 + x, x),
        ("x+y", x - y, y), ("x*y", x / y, y), ("y-x", x, 1 + x),
        ("x*y", sympy.exp(x), sympy.exp(-x)), ("x+y", sympy.log(x), sympy.log(y)),
    ]
    for c, a, b in combo_targeted:
        ia = index[sympy.srepr(a)]
        ib = index[sympy.srepr(b)]
        register(COMBOS[c](exprs[ia], exprs[ib]), c, [ia, ib])

    for e in entries:
        args = ",".join(str(a) for a in e["args"])
        print(f"{e['op']}\t{args}\t{e['idx']}\t{int(e['isAdd'])}\t{e['name']}")

if __name__ == "__main__":
    main()
