"""Sweep suite sizes to pick the headline bench configuration.

Reuses bench.py's protocol (tol 1e-8, max_iter 300, FixedRegularization)
at several (k, m, n) points and reports iter/s + ratio vs serial HiGHS.
"""

import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

spec = importlib.util.spec_from_file_location(
    "benchmod", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
)
benchmod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(benchmod)

import jax
import numpy as np


def main():
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache
    configure_cache(jax, backend)
    print(f"backend: {backend}", file=sys.stderr, flush=True)

    import madipm_tpu as mt

    points = [
        (16, 192, 384, 0.3),
        (16, 512, 1024, 0.3),
        (8, 1024, 2048, 0.15),
    ]
    results = []
    for k, m, n, density in points:
        print(f"=== k={k} m={m} n={n} d={density}", file=sys.stderr, flush=True)
        models = benchmod.make_suite(k=k, n=n, m=m, density=density)
        opts = dict(
            tol=1e-8,
            max_iter=300,
            regularization=mt.FixedRegularization(1e-8, -1e-8),
            print_level=mt.PrintLevel.ERROR,
        )
        if backend != "cpu":
            opts["linear_solver"] = mt.LinearSolver.CHOLESKY_INV
            opts["factor_dtype"] = "float32"
            opts["refinement_steps"] = 6
            opts["pcg_adaptive_tol"] = True  # headline config (bench.py)
        try:
            iters, wall, stats = benchmod.bench_tpu(models, opts)
        except Exception as e:
            print(f"FAILED: {e}", file=sys.stderr, flush=True)
            continue
        solved = sum(s.success for s in stats)
        cpu_iters, cpu_time, cpu_objs = benchmod.bench_cpu_baseline(models)
        gap = 0.0
        for s, ro in zip(stats, cpu_objs):
            if s.success and np.isfinite(ro):
                gap = max(gap, abs(s.objective - ro) / max(1.0, abs(ro)))
        r = {
            "k": k, "m": m, "n": n, "density": density,
            "tpu_iters_per_s": round(iters / wall, 2),
            "tpu_wall_s": round(wall, 3),
            "solved": f"{solved}/{k}",
            "cpu_iters_per_s": round(cpu_iters / max(cpu_time, 1e-9), 2),
            "cpu_wall_s": round(cpu_time, 3),
            "ratio": round((iters / wall) / max(cpu_iters / max(cpu_time, 1e-9), 1e-9), 2),
            "max_rel_obj_gap": f"{gap:.2e}",
        }
        results.append(r)
        print(json.dumps(r), flush=True)

    print(json.dumps(results, indent=1), file=sys.stderr)


if __name__ == "__main__":
    main()
