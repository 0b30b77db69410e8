"""Diagnose the BENCH run-3 iteration blow-up (VERDICT.md weak #2).

bench.py run 3 scales every rhs by 1.0003; instance 5 (seed 1239) then
takes ~217 MPC iterations instead of ~21.  This script solves that one
instance in logged mode so the per-iteration table shows WHERE it grinds
(mu floor / alpha collapse / PCG accuracy ceiling).

Usage: python scripts/diag_blowup.py [bscale] [instance]
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")

from bench import make_suite  # noqa: E402


def main():
    bscale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0003
    inst = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache
    configure_cache(jax, backend)
    print(f"backend={backend} bscale={bscale} instance={inst}", flush=True)

    import madipm_tpu as mt

    models = make_suite(k=8, n=2048, m=1024, density=0.15)
    mdl = models[inst]
    mdl.lcon = mdl.lcon * bscale
    mdl.ucon = mdl.ucon * bscale

    opts = dict(
        tol=1e-8,
        max_iter=300,
        regularization=mt.FixedRegularization(1e-8, -1e-8),
        print_level=mt.PrintLevel.INFO,
    )
    if backend != "cpu":
        opts.update(
            linear_solver=mt.LinearSolver.CHOLESKY_INV,
            factor_dtype="float32",
            refinement_steps=6,
            pcg_adaptive_tol=True,
        )
    st = mt.madipm(mdl, **opts)
    print(f"status={st.status.name} iter={st.iter} obj={st.objective:.9e} "
          f"pr={st.primal_feas:.2e} du={st.dual_feas:.2e} "
          f"compl={st.complementarity:.2e}", flush=True)


if __name__ == "__main__":
    main()
