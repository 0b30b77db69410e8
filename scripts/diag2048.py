"""Diagnose the m=2048 suite: per-instance status/iters/residuals on TPU
(with the acceptable-level exit now in)."""

import importlib.util
import json
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


def main():
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache
    configure_cache(jax, backend)

    import madipm_tpu as mt

    k, m, n, density = 8, 2048, 4096, 0.10
    models = benchmod.make_suite(k=k, n=n, m=m, density=density)
    opts = dict(
        tol=1e-8, max_iter=300,
        regularization=mt.FixedRegularization(1e-8, -1e-8),
        print_level=mt.PrintLevel.ERROR,
    )
    if backend != "cpu":
        opts.update(linear_solver=mt.LinearSolver.CHOLESKY_INV,
                    factor_dtype="float32", refinement_steps=6,
                    pcg_adaptive_tol=True)
    iters, wall, stats = benchmod.bench_tpu(models, opts)
    for i, s in enumerate(stats):
        print(json.dumps({
            "i": i, "status": s.status.name, "iter": s.iter,
            "obj": s.objective,
            "inf_pr": s.primal_feas, "inf_du": s.dual_feas,
            "inf_compl": s.complementarity,
        }), flush=True)


if __name__ == "__main__":
    main()
