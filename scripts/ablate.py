"""Ablation study at the bench.py headline shape: attribute per-iteration
cost and find the next perf lever.

Variants differ only in solver options; each reports wall s, total iters,
ms/IPM-iter, solve rate, and max |obj - base_obj| / max(1,|obj|) so that a
faster-but-sloppier variant is visible immediately.

Run on the real TPU: python scripts/ablate.py
"""

import importlib.util
import json
import os
import sys
import time

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

    k, n, m, density = 8, 2048, 1024, 0.15
    models = benchmod.make_suite(k=k, n=n, m=m, density=density)

    base_opts = dict(
        tol=1e-8,
        max_iter=300,
        regularization=mt.FixedRegularization(1e-8, -1e-8),
        print_level=mt.PrintLevel.ERROR,
        linear_solver=mt.LinearSolver.CHOLESKY_INV,
        factor_dtype="float32",
        refinement_steps=6,
    )

    # Post-Ozaki question set: with exact-operator applications now 15x
    # cheaper (ops/ozaki.py), which earlier conclusions flip?
    variants = {
        "base_oz_adaptive": dict(pcg_adaptive_tol=True),  # current headline config
        "oz_fixed_tol": {},  # does mu-adaptive tol still pay once matvecs are cheap?
        "oz_gondzio1": dict(pcg_adaptive_tol=True, max_ncorr=1),  # corrections now cheap
        "oz_gondzio2": dict(pcg_adaptive_tol=True, max_ncorr=2),
        "oz_r3": dict(pcg_adaptive_tol=True, refinement_steps=3),  # slimmer PCG budget
        "emulated_adaptive": dict(pcg_adaptive_tol=True, fp64_matvec="emulated"),  # pre-Ozaki baseline
    }

    base_objs = None
    results = {}
    for name, delta in variants.items():
        opts = dict(base_opts)
        opts.update(delta)
        try:
            iters, wall, stats = benchmod.bench_tpu(models, opts)
        except Exception as e:  # tunnel hiccup etc.
            print(f"{name}: FAILED {e!r}", file=sys.stderr, flush=True)
            continue
        solved = sum(s.success for s in stats)
        objs = np.array([s.objective for s in stats])
        if base_objs is None:
            base_objs = objs
        gap = float(
            np.nanmax(np.abs(objs - base_objs) / np.maximum(1.0, np.abs(base_objs)))
        )
        rec = dict(
            wall_s=round(wall, 3),
            iters=iters,
            ms_per_iter=round(1e3 * wall / max(iters, 1), 2),
            iter_per_s=round(iters / wall, 2),
            solved=f"{solved}/{k}",
            obj_gap_vs_base=f"{gap:.2e}",
        )
        results[name] = rec
        print(f"{name}: {rec}", file=sys.stderr, flush=True)

    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
