#!/usr/bin/env python
"""Ablate the corrector PCG tolerance FLOOR (round-5 perf experiment).

The round-5 trajectory profile (scripts/diag_trips.py) measured the last
~10 IPM iterations at ~5x the per-trip device cost of the early ones:
as mu falls to ~1e-10 the mu-adaptive corrector exit tolerance
``clip(0.01*mu, pcg_tol_floor, pcg_tol_cap)`` hits its historical 1e-13
floor exactly where the fp32-factor preconditioner is weakest, so the
fp64 PCG burns O(10) operator pairs per trip polishing digits the outer
iteration cannot use (inexact-Newton only needs ~0.01*tol relative to an
rhs that is itself shrinking).  This measures floor values against
iteration counts, solve rate, and objectives at the bench shapes, both
warm orders.

Usage: python scripts/ablate_tolfloor.py [--m 1024 --k 8 --floors 1e-13 1e-11 1e-10 1e-9]
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
    ap.add_argument("--floors", type=float, nargs="*",
                    default=[1e-13, 1e-11, 1e-10, 1e-9])
    ap.add_argument("--reverse", action="store_true",
                    help="run configs in reverse (warm-order control)")
    args = ap.parse_args()
    if not args.floors:
        ap.error("--floors needs at least one value")
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
    )

    floors = list(reversed(args.floors)) if args.reverse else list(args.floors)
    results = {}
    for floor in floors:
        opts = dict(base, pcg_tol_floor=floor)
        iters, wall, stats = benchmod.bench_tpu(models, opts)
        solved = sum(s.success for s in stats)
        objs = [s.objective if s.success else np.nan for s in stats]
        results[floor] = (iters / wall, solved, objs, iters)
        log(f"pcg_tol_floor={floor:g}: {iters / wall:.1f} iter/s, "
            f"{solved}/{args.k} solved, {iters} total iters")

    ref = next((f for f in floors if results[f][1] == args.k), floors[0])
    if results[ref][1] != args.k:
        log(f"WARNING: no floor solved {args.k}/{args.k}; gaps vs "
            f"partially-solved floor={ref:g} ({results[ref][1]}/{args.k})")
    ref_objs = results[ref][2]
    for floor in floors:
        rate, solved, objs, iters = results[floor]
        with np.errstate(invalid="ignore"):
            gap = np.nanmax(
                np.abs(np.array(objs) - np.array(ref_objs))
                / np.maximum(1.0, np.abs(ref_objs))
            )
        print(f"{floor:>8g}: {rate:8.1f} iter/s  {solved}/{args.k} solved  "
              f"{iters} iters  max_rel_obj_gap={gap:.2e}", flush=True)


if __name__ == "__main__":
    main()
