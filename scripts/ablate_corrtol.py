#!/usr/bin/env python
"""Ablate the corrector PCG tolerance cap (round-3 perf experiment).

With the adopted config (``predictor_pcg_budget=0``) the corrector solve is
the only remaining fp64 PCG.  Its mu-adaptive exit tolerance
``clip(0.01*mu, 1e-13, pcg_tol_cap)`` is UPPER-clamped at 1e-9, so every
early/mid IPM iteration (mu > 1e-7) solves its Newton system to 1e-9
relative even though inexact-Newton analysis only needs a residual well
under mu.  Raising the cap lets those iterations exit the PCG after the
initial factor-solve + residual check, shaving fp64 operator applications —
at the risk of more outer iterations or lost robustness on the perturbed
protocol.  This measures that trade at the bench shapes.

Usage: python scripts/ablate_corrtol.py [--m 1024 --n 2048 --k 8 --density 0.15]
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
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--density", type=float, default=0.15)
    ap.add_argument("--caps", type=float, nargs="*",
                    default=[1e-9, 1e-7, 1e-6, 1e-5])
    args = ap.parse_args()
    if not args.caps:
        ap.error("--caps needs at least one value")

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache
    configure_cache(jax, backend)
    log(f"backend: {backend}")

    import madipm_tpu as mt

    models = benchmod.make_suite(k=args.k, n=args.n, m=args.m, density=args.density)

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
    )

    results = {}
    for cap in args.caps:
        opts = dict(base, pcg_tol_cap=cap)
        iters, wall, stats = benchmod.bench_tpu(models, opts)
        solved = sum(s.success for s in stats)
        objs = [s.objective if s.success else np.nan for s in stats]
        results[cap] = (iters / wall, solved, objs, iters)
        log(f"pcg_tol_cap={cap:g}: {iters / wall:.1f} iter/s, "
            f"{solved}/{args.k} solved, {iters} total iters")

    # Reference objectives: the first FULLY-solved config (comparing
    # against a config with failures would propagate NaNs into every gap);
    # fall back to the first cap with a visible warning if none solved all.
    ref_cap = next(
        (c for c in args.caps if results[c][1] == args.k), args.caps[0]
    )
    if results[ref_cap][1] != args.k:
        log(f"WARNING: no cap solved {args.k}/{args.k}; gaps vs partially-"
            f"solved cap={ref_cap:g} ({results[ref_cap][1]}/{args.k})")
    ref_objs = results[ref_cap][2]
    for cap, (rate, solved, objs, iters) in results.items():
        with np.errstate(invalid="ignore"):
            gap = np.nanmax(
                np.abs(np.array(objs) - np.array(ref_objs))
                / np.maximum(1.0, np.abs(ref_objs))
            )
        print(f"{cap:>8g}: {rate:8.1f} iter/s  {solved}/{args.k} solved  "
              f"{iters} iters  max_rel_obj_gap={gap:.2e}", flush=True)


if __name__ == "__main__":
    main()
