"""Isolate batch-vs-standalone iteration-count differences at bscale=1.0003.

bench run 3 shows instances 5 and 7 at 84/110 iterations inside the
vmapped batch, while scripts/diag_blowup.py (standalone, LOGGED driver)
converges instance 5 in 24.  This script solves the same instances
standalone through the FUSED driver (solve_device — the bench path) and
through the batch with k=1, separating vmap effects from driver effects.
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")

from bench import make_suite  # noqa: E402


def main():
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache
    configure_cache(jax, backend)
    print(f"backend={backend}", flush=True)

    from functools import partial
    import dataclasses as dc

    import madipm_tpu as mt
    from madipm_tpu.parallel.batch import bucket_pad
    from madipm_tpu.solver import driver
    from madipm_tpu.utils.options import load_options

    models = make_suite(k=8, n=2048, m=1024, density=0.15)
    opt = load_options(
        tol=1e-8, max_iter=300,
        regularization=mt.FixedRegularization(1e-8, -1e-8),
        print_level=mt.PrintLevel.ERROR,
        linear_solver=mt.LinearSolver.CHOLESKY_INV,
        factor_dtype="float32", refinement_steps=6, pcg_adaptive_tol=True,
    )
    cfg = driver.make_config(opt, is_qp=False)

    probs, _ = bucket_pad(models)
    bscale = 1.0003

    # batch of 8 (the bench path)
    def _solve_batch(probs_, s):
        p = dc.replace(probs_, b=probs_.b * s)
        return jax.vmap(partial(driver.solve_device, cfg))(p)

    _, _, stb = jax.jit(_solve_batch)(probs, bscale)
    print("batch8 k:", np.asarray(stb.k).tolist(), flush=True)

    # standalone fused per instance (5 and 7)
    for i in (5, 7):
        pi = jax.tree_util.tree_map(lambda a: a[i], probs)
        pi = dc.replace(pi, b=pi.b * bscale)
        _, _, st = jax.jit(partial(driver.solve_device, cfg))(pi)
        print(f"standalone fused inst{i}: k={int(st.k)} status={int(st.status)} "
              f"pr={float(st.inf_pr):.2e}", flush=True)


if __name__ == "__main__":
    main()
