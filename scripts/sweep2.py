"""Follow-up sweep: the m=2048 point (failed once on a tunnel hiccup) and a
use_pallas=True comparison at m=1024/m=2048."""

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
        (4, 2048, 4096, 0.08, False),
        (8, 1024, 2048, 0.15, True),
        (4, 2048, 4096, 0.08, True),
    ]
    for k, m, n, density, pallas in points:
        print(f"=== k={k} m={m} n={n} d={density} pallas={pallas}", file=sys.stderr, flush=True)
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
            opts["use_pallas"] = pallas
        try:
            iters, wall, stats = benchmod.bench_tpu(models, opts)
        except Exception as e:
            print(f"FAILED: {type(e).__name__}: {e}", file=sys.stderr, flush=True)
            continue
        solved = sum(s.success for s in stats)
        r = {
            "k": k, "m": m, "n": n, "pallas": pallas,
            "tpu_iters_per_s": round(iters / wall, 2),
            "tpu_wall_s": round(wall, 3),
            "solved": f"{solved}/{k}",
        }
        print(json.dumps(r), flush=True)
        if (k, m, pallas) == (4, 2048, False):
            cpu_iters, cpu_time, _ = benchmod.bench_cpu_baseline(models)
            print(json.dumps({
                "cpu_iters_per_s": round(cpu_iters / max(cpu_time, 1e-9), 3),
                "cpu_wall_s": round(cpu_time, 1),
                "ratio": round((iters / wall) / max(cpu_iters / max(cpu_time, 1e-9), 1e-9), 2),
            }), flush=True)


if __name__ == "__main__":
    main()
