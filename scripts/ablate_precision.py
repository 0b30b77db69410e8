#!/usr/bin/env python
"""Ablate `factor_precision` on the headline bench shape (one v5e chip).

The benchmarks set the GLOBAL matmul precision to "highest" so that every
fp64-critical contraction is exact — but that also forces the fp32 factor
(normal assembly + blocked inverse-Cholesky + every preconditioner
application) through 6-pass bf16 emulation.  The factor is only a PCG
preconditioner behind the exact fp64 operator, so "high" (3 passes) or
even "default" (1 pass) may preserve PCG iteration counts at a fraction
of the factor cost.  This script measures end-to-end iter/s and checks
objectives are unchanged.

Usage: python scripts/ablate_precision.py   (runs on the default backend)
"""

from __future__ import annotations

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
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache
    configure_cache(jax, backend)
    log(f"backend: {backend}")

    import madipm_tpu as mt

    k, n, m, density = 8, 2048, 1024, 0.15
    models = benchmod.make_suite(k=k, n=n, m=m, density=density)

    base = dict(
        tol=1e-8,
        max_iter=300,
        regularization=mt.FixedRegularization(1e-8, -1e-8),
        print_level=mt.PrintLevel.ERROR,
        linear_solver=mt.LinearSolver.CHOLESKY_INV,
        factor_dtype="float32",
        # Round-3 re-test at the CURRENT default budget (12, was 6 when
        # round 2 measured 0/8 for "high"/"default"): the budget, not the
        # tolerance rule, was what bound at the barrier floor — a weaker
        # 3-pass preconditioner might now converge within the doubled cap.
        refinement_steps=12,
        pcg_adaptive_tol=True,
        # Round-5 adopted solve config: preconditioner-only predictor,
        # loosened corrector rtol clamps (see ablate_tolfloor.py) -- the
        # weak-factor failure mode round 2/3 measured (budget-bound tail
        # grind) is exactly what the floor removes, so "high"/"default"
        # get a fresh chance here.
        predictor_pcg_budget=0,
        pcg_tol_cap=1e-6,
        pcg_tol_floor=float(os.environ.get("ABL_FLOOR", "1e-8")),
    )

    results = {}
    for prec in [None, "high", "default"]:
        opts = dict(base)
        if prec is not None:
            opts["factor_precision"] = prec
        iters, wall, stats = benchmod.bench_tpu(models, opts)
        solved = sum(s.success for s in stats)
        objs = [s.objective if s.success else np.nan for s in stats]
        results[str(prec)] = (iters / wall, solved, objs, iters)
        log(
            f"factor_precision={prec}: {iters / wall:.1f} iter/s, "
            f"{solved}/{k} solved, {iters} total iters"
        )

    ref_objs = results["None"][2]
    for prec, (rate, solved, objs, iters) in results.items():
        gap = np.nanmax(
            np.abs(np.array(objs) - np.array(ref_objs))
            / np.maximum(1.0, np.abs(ref_objs))
        )
        print(
            f"{prec:>8}: {rate:8.1f} iter/s  {solved}/{k} solved  "
            f"{iters} iters  max_rel_obj_gap_vs_highest={gap:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
