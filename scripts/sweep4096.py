"""The m=4096 measurement point (post-Ozaki scaling frontier).

TPU: 2 instances (m=4096, n=8192, 5% dense) vmapped into one program
(k=4 exhausts the 16 GB v5e: fp64 A + two bf16 slice sets + while_loop
double buffering).
CPU baseline: HiGHS-IPM on ONE instance (serial HiGHS at this size runs
tens of minutes; iter/s extrapolates per-instance).
"""

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
    print(f"backend: {backend}", file=sys.stderr, flush=True)

    import madipm_tpu as mt

    # Round 1: k=4 exhausted the 16 GB v5e with the two-copy slice layout
    # (fp64 A + forward AND transposed bf16 slice sets + while_loop double
    # buffering).  Shared slices (ozaki_share_slices=True, round 2) drop
    # the transposed copy (~470 MB/instance); pass `k` (and optionally
    # `share`) on the command line: `sweep4096.py 4 share`.
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    share = "share" in sys.argv[2:]
    n, m, density = 8192, 4096, 0.05
    models = benchmod.make_suite(k=k, n=n, m=m, density=density)

    opts = dict(
        tol=1e-8,
        max_iter=300,
        regularization=mt.FixedRegularization(1e-8, -1e-8),
        print_level=mt.PrintLevel.ERROR,
        linear_solver=mt.LinearSolver.CHOLESKY_INV,
        factor_dtype="float32",
        refinement_steps=12,
        pcg_adaptive_tol=True,
    )
    if share:
        opts["ozaki_share_slices"] = True

    iters, wall, stats = benchmod.bench_tpu(models, opts)
    solved = sum(s.success for s in stats)
    print(
        f"tpu: {solved}/{k} solved, {iters} iters in {wall:.3f}s "
        f"-> {iters/wall:.2f} iter/s",
        file=sys.stderr, flush=True,
    )

    cpu_iters, cpu_time, cpu_objs = benchmod.bench_cpu_baseline(models[:1])
    cpu_rate = cpu_iters / max(cpu_time, 1e-9)
    print(
        f"cpu(highs-ipm, 1 instance): {cpu_iters} iters in {cpu_time:.1f}s "
        f"-> {cpu_rate:.3f} iter/s",
        file=sys.stderr, flush=True,
    )

    max_gap = 0.0
    for s, ref_obj in zip(stats[:1], cpu_objs):
        if s.success and np.isfinite(ref_obj):
            max_gap = max(max_gap, abs(s.objective - ref_obj) / max(1.0, abs(ref_obj)))

    out = {
        "metric": f"ipm_iterations_per_sec_batch{k}_m{m}_n{n}_{backend}",
        "value": round(iters / wall, 2),
        "unit": "iter/s",
        "vs_baseline": round((iters / wall) / cpu_rate, 2) if cpu_rate > 0 else None,
        "solve_rate": solved / k,
        "max_rel_obj_gap_1ref": max_gap,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
