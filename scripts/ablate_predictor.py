#!/usr/bin/env python
"""Ablate the predictor PCG budget (round-3 perf experiment).

The predictor (affine-scaling) solve only feeds centering heuristics —
mu_aff, sigma, the Mehrotra correction products — which need a few digits,
yet it currently runs a 6-iteration fp64 PCG budget like a real solve.
``predictor_pcg_budget=0`` applies the fp32 factor solve ONLY (no fp64
operator application, no residual check), saving ~2 fp64 A-applications
per iteration out of ~7.  This measures whether iteration counts / solve
rates survive at the bench shapes.

Usage: python scripts/ablate_predictor.py [--m 1024 --n 2048 --k 8 --density 0.15]
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
    args = ap.parse_args()

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
    )

    results = {}
    for budget in [None, 2, 0]:
        opts = dict(base)
        if budget is not None:
            opts["predictor_pcg_budget"] = budget
        iters, wall, stats = benchmod.bench_tpu(models, opts)
        solved = sum(s.success for s in stats)
        objs = [s.objective if s.success else np.nan for s in stats]
        results[str(budget)] = (iters / wall, solved, objs, iters)
        log(f"predictor_pcg_budget={budget}: {iters / wall:.1f} iter/s, "
            f"{solved}/{args.k} solved, {iters} total iters")

    ref_objs = results["None"][2]
    for budget, (rate, solved, objs, iters) in results.items():
        with np.errstate(invalid="ignore"):
            gap = np.nanmax(
                np.abs(np.array(objs) - np.array(ref_objs))
                / np.maximum(1.0, np.abs(ref_objs))
            )
        print(f"{budget:>6}: {rate:8.1f} iter/s  {solved}/{args.k} solved  "
              f"{iters} iters  max_rel_obj_gap={gap:.2e}", flush=True)


if __name__ == "__main__":
    main()
