"""Dig into the stalled instance: is the inf_pr floor the PCG residual or
the dual-regularization term |del_c|*||dy||?  (See scripts/diag_blowup.py.)

Runs the solve to the stall, then performs ONE manual factorize+solve on the
stuck iterate and prints each residual component.
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")

from bench import make_suite  # noqa: E402


def main():
    bscale = 1.0003
    inst = 5
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache
    configure_cache(jax, backend)
    print(f"backend={backend}", flush=True)

    import jax.numpy as jnp

    import madipm_tpu as mt
    from madipm_tpu.ops import kkt as kkt_ops
    from madipm_tpu.solver import driver, kernels as K

    models = make_suite(k=8, n=2048, m=1024, density=0.15)
    mdl = models[inst]
    mdl.lcon = mdl.lcon * bscale
    mdl.ucon = mdl.ucon * bscale

    opts = dict(
        tol=1e-8,
        max_iter=120,
        regularization=mt.FixedRegularization(1e-8, -1e-8),
        print_level=mt.PrintLevel.ERROR,
        linear_solver=mt.LinearSolver.CHOLESKY_INV,
        factor_dtype="float32",
        refinement_steps=6,
        pcg_adaptive_tol=True,
    )
    solver = mt.MPCSolver(mdl, **opts)
    cfg = solver.cfg
    run = jax.jit(driver.solve_device, static_argnums=0)
    prob_s, scale, state = run(cfg, solver.prob)
    print(f"k={int(state.k)} status={int(state.status)} "
          f"inf_pr={float(state.inf_pr):.3e} inf_du={float(state.inf_du):.3e} "
          f"mu={float(state.mu):.3e}", flush=True)

    # One manual factorize+solve on the stuck iterate (corrector-style rhs).
    import dataclasses as dc

    prob = dc.replace(prob_s, lb=state.lb, ub=state.ub)
    if cfg.use_ozaki and hasattr(prob, "with_ozaki"):
        pass  # prob_s already carries slices from initialize
    x, y, zl, zu = state.x, state.y, state.zl, state.zu

    @jax.jit
    def probe():
        ax = prob.matvec(x)
        aty = prob.rmatvec(y)
        factors, del_w, del_c, ok = kkt_ops.factorize(
            cfg.kkt, prob, x, zl, zu, state.del_w, state.del_c
        )
        rhs = K.predictor_rhs(prob, x, y, zl, zu, ax, aty)
        out = {}
        for tag, budget, rtol in [
            ("default24", None, None),
            ("tight96", 96, 1e-15),
        ]:
            dx, dy = kkt_ops.solve_condensed(
                cfg.kkt, prob, factors, rhs.rx, rhs.rp,
                pcg_budget=budget, pcg_rtol=rtol,
            )
            adx = prob.matvec(dx)
            live = factors.live
            # regularized-system residual (what PCG controls)
            reg_res = jnp.max(jnp.abs(jnp.where(
                live, adx + factors.del_c * dy - rhs.rp, 0.0)))
            # true-system residual (what the IPM needs)
            true_res = jnp.max(jnp.abs(jnp.where(live, adx - rhs.rp, 0.0)))
            out[tag] = dict(
                reg_res=reg_res,
                true_res=true_res,
                dc_dy=jnp.abs(factors.del_c) * jnp.max(jnp.abs(dy)),
                dy_inf=jnp.max(jnp.abs(dy)),
                dx_inf=jnp.max(jnp.abs(dx)),
            )
        rp_inf = jnp.max(jnp.abs(jnp.where(prob.row_mask, rhs.rp, 0.0)))
        return out, del_c, rp_inf, jnp.max(jnp.abs(y))

    out, del_c, rp_inf, y_inf = probe()
    print(f"del_c={float(del_c):.3e} ||rp||={float(rp_inf):.3e} "
          f"||y||={float(y_inf):.3e}", flush=True)
    for tag, d in out.items():
        print(f"{tag}: " + " ".join(f"{k}={float(v):.3e}" for k, v in d.items()),
              flush=True)


if __name__ == "__main__":
    main()
