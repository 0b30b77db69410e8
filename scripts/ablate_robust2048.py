#!/usr/bin/env python
"""Root-cause the m=2048 solve-rate regression (round-2 re-measurement).

Round 1 recorded 86.2 iter/s 8/8 solved at m=2048/n=4096x8; the round-2
honest re-measurement got 37.9 iter/s with only 3/8 solved and many lanes
at max_iter.  Candidates: the mu_balance floor added in round 2, and the
PCG budget (refinement_steps=6) binding at the barrier floor (a CPU probe
on the m=1024 grinding instance solved in 21 iterations at budget 12 vs
111-iteration grind at 6).  This script sweeps both knobs at the m=2048
shape on hardware.
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

import jax


def main():
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache
    configure_cache(jax, backend)
    print(f"backend: {backend}", file=sys.stderr, flush=True)

    import madipm_tpu as mt

    models = benchmod.make_suite(k=8, n=4096, m=2048, density=0.10)
    variants = [
        ("mb=1e-2,rs=6 (current)", dict(mu_balance=1e-2, refinement_steps=6)),
        ("mb=0,rs=6 (round-1 cfg)", dict(mu_balance=0.0, refinement_steps=6)),
        ("mb=1e-2,rs=12", dict(mu_balance=1e-2, refinement_steps=12)),
        ("mb=0,rs=12", dict(mu_balance=0.0, refinement_steps=12)),
    ]
    for label, extra in variants:
        opts = dict(
            tol=1e-8, max_iter=300,
            regularization=mt.FixedRegularization(1e-8, -1e-8),
            print_level=mt.PrintLevel.ERROR,
            linear_solver=mt.LinearSolver.CHOLESKY_INV,
            factor_dtype="float32", pcg_adaptive_tol=True, **extra,
        )
        iters, wall, stats = benchmod.bench_tpu(models, opts)
        solved = sum(s.success for s in stats)
        print(
            f"{label}: {iters / wall:.1f} iter/s, {solved}/8 solved, "
            f"{iters} iters",
            flush=True,
        )


if __name__ == "__main__":
    main()
