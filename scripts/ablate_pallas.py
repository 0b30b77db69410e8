#!/usr/bin/env python
"""Re-measure the fused Pallas Cholesky under the round-5 config.

use_pallas=True was measured a tie at the bench shapes in round 1 (CLAUDE
notes), but every adopted lever since (Ozaki pair, predictor budget 0,
pcg_tol_cap, product recurrence, pcg_tol_floor) has shrunk the non-factor
share of the trip, and the per-trip floor at small m (~4 ms at m=192,
where FLOPs are trivial) looks like kernel-dispatch count — exactly what
the fused VMEM kernel removes (the blocked chol_inv recursion lowers to
hundreds of small ops).  This re-measures both settings at a small and
the headline shape.

Usage: python scripts/ablate_pallas.py [--m 1024 --k 8] [--pallas-only|--xla-only]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

spec = importlib.util.spec_from_file_location(
    "benchmod",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
benchmod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(benchmod)

import numpy as np
import jax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--m", type=int, default=1024)
    ap.add_argument("--n", type=int, default=0, help="0 = 2*m")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--density", type=float, default=0.15)
    ap.add_argument("--pallas-only", action="store_true")
    ap.add_argument("--xla-only", action="store_true")
    args = ap.parse_args()
    n = args.n or 2 * args.m

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache

    configure_cache(jax, backend)
    log(f"backend: {backend}")

    import madipm_tpu as mt

    models = benchmod.make_suite(k=args.k, n=n, m=args.m, density=args.density)

    base = dict(
        tol=1e-8,
        max_iter=300,
        regularization=mt.FixedRegularization(1e-8, -1e-8),
        print_level=mt.PrintLevel.ERROR,
        linear_solver=mt.LinearSolver.CHOLESKY_INV,
        factor_dtype="float32",
        refinement_steps=12,
        pcg_adaptive_tol=True,
        predictor_pcg_budget=0,
        pcg_tol_cap=1e-6,
        pcg_tol_floor=1e-8,
    )

    flags = [False, True]
    if args.pallas_only:
        flags = [True]
    if args.xla_only:
        flags = [False]
    results = {}
    for up in flags:
        opts = dict(base, use_pallas=up)
        iters, wall, stats = benchmod.bench_tpu(models, opts)
        solved = sum(s.success for s in stats)
        objs = [s.objective if s.success else np.nan for s in stats]
        results[up] = (iters / wall, solved, objs, iters)
        log(f"use_pallas={up}: {iters / wall:.1f} iter/s, "
            f"{solved}/{args.k} solved, {iters} total iters")

    ref_objs = results[flags[0]][2]
    for up in flags:
        rate, solved, objs, iters = results[up]
        with np.errstate(invalid="ignore"):
            gap = np.nanmax(
                np.abs(np.array(objs) - np.array(ref_objs))
                / np.maximum(1.0, np.abs(ref_objs))
            )
        print(f"pallas={int(up)}: {rate:8.1f} iter/s  {solved}/{args.k} solved  "
              f"{iters} iters  max_rel_obj_gap={gap:.2e}", flush=True)


if __name__ == "__main__":
    main()
