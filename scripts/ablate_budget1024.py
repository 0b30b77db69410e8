#!/usr/bin/env python
"""PCG budget at the headline shape: does refinement_steps=12 remove the
rhs-perturbation iteration blow-up (runs 84/110-iteration lanes at budget
6) without costing healthy-lane throughput?  (A CPU probe of the grinding
instance solved in 21 iterations at budget 12 vs a 111-iteration grind at
6 — the budget, not the tolerance rule, binds at the barrier floor.)
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

    models = benchmod.make_suite(k=8, n=2048, m=1024, density=0.15)
    for rs in [6, 12]:
        opts = dict(
            tol=1e-8, max_iter=300,
            regularization=mt.FixedRegularization(1e-8, -1e-8),
            print_level=mt.PrintLevel.ERROR,
            linear_solver=mt.LinearSolver.CHOLESKY_INV,
            factor_dtype="float32", pcg_adaptive_tol=True,
            refinement_steps=rs,
        )
        iters, wall, stats = benchmod.bench_tpu(models, opts)
        solved = sum(s.success for s in stats)
        print(f"rs={rs}: {iters / wall:.1f} iter/s, {solved}/8 solved, {iters} iters", flush=True)


if __name__ == "__main__":
    main()
