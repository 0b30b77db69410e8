"""Floor-free per-component timing of the IPM iteration (scan-chained).

scripts/profile_iter.py times one dispatch per component, which the
~32 ms axon-tunnel fetch floor dominates now that components cost
single-digit milliseconds.  Here each component is chained REPS times
inside one lax.scan program (output feeds the next trip's input), so the
fetch cost amortizes away: reported numbers are per-application.

Components at the bench shape (k=8, m=1024, n=2048, headline config):
  - full iteration        (driver.iteration)
  - factorize             (kkt.factorize incl. retry-loop structure)
  - corrector solve       (kkt.solve_condensed, full budget)
  - predictor solve       (kkt.solve_condensed, reduced budget)
  - one Ozaki A-pair      (S v = A(dinv * (A'v)))
"""

import dataclasses
import importlib.util
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

spec = importlib.util.spec_from_file_location(
    "benchmod",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
benchmod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(benchmod)

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, reps=5):
    fn(*args)
    sync(fn(*args))
    walls = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*args))
        walls.append(time.time() - t0)
    return float(np.median(walls))


REPS = int(os.environ.get("PROFILE_REPS", "20"))


def main():
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache
    configure_cache(jax, backend)
    print(f"backend: {backend}", file=sys.stderr, flush=True)

    import madipm_tpu as mt
    from madipm_tpu.parallel.batch import bucket_pad
    from madipm_tpu.solver import driver
    from madipm_tpu.ops import kkt as kkt_ops

    k = int(os.environ.get("PROFILE_K", "8"))
    m = int(os.environ.get("PROFILE_M", "1024"))
    n = int(os.environ.get("PROFILE_N", str(2 * m)))
    density = float(os.environ.get("PROFILE_DENSITY", "0.15"))
    models = benchmod.make_suite(k=k, n=n, m=m, density=density)
    opt = mt.load_options(
        tol=1e-8, max_iter=300,
        regularization=mt.FixedRegularization(1e-8, -1e-8),
        print_level=mt.PrintLevel.ERROR,
        linear_solver=mt.LinearSolver.CHOLESKY_INV,
        factor_dtype="float32", refinement_steps=12, pcg_adaptive_tol=True,
        predictor_pcg_budget=0, pcg_tol_cap=1e-6,
    )
    probs, _ = bucket_pad(models)
    cfg = driver.make_config(opt, is_qp=False)

    init = jax.jit(jax.vmap(partial(driver.initialize, cfg)))
    prob_s, scale, st0 = init(probs)
    step = jax.jit(jax.vmap(partial(driver.iteration, cfg)))
    st = st0
    for _ in range(5):
        st = step(prob_s, st)
    sync(st.x)

    results = {"shape": f"k{k}_m{m}_n{n}", "backend": backend, "reps": REPS}

    # --- full iteration, chained
    @jax.jit
    def iter_chain(p, s):
        def body(s_, _):
            s2 = jax.vmap(partial(driver.iteration, cfg))(p, s_)
            return s2._replace(k=s_.k), None  # freeze k: fixed trip behavior

        out, _ = jax.lax.scan(body, s, None, length=REPS)
        return out

    results["iteration_s"] = timeit(iter_chain, prob_s, st) / REPS

    # --- factorize, chained (perturb del_w so trips are not CSE'd)
    def fac1(p, s, dw):
        pp = dataclasses.replace(p, lb=s.lb, ub=s.ub)
        f, *_ = kkt_ops.factorize(cfg.kkt, pp, s.x, s.zl, s.zu, dw, s.del_c)
        return f

    @jax.jit
    def fac_chain(p, s):
        def body(dw, _):
            f = jax.vmap(fac1, in_axes=(0, 0, 0))(p, s, dw)
            bump = jnp.max(jnp.abs(f.L), axis=(1, 2)) * 1e-18
            return dw * (1.0 + 0e0) + bump, None

        out, _ = jax.lax.scan(body, s.del_w, None, length=REPS)
        return out

    results["factorize_s"] = timeit(fac_chain, prob_s, st) / REPS

    # --- solves, chained (solution feeds the next rhs)
    fac_v = jax.jit(jax.vmap(fac1, in_axes=(0, 0, 0)))
    factors = fac_v(prob_s, st, st.del_w)
    sync(factors.L)
    rx0 = st.zl - st.zu - 0.01 * jnp.sign(st.x)
    rp0 = jnp.zeros_like(st.y) + 0.001

    def solve_chain_fn(budget, rtol=None):
        @jax.jit
        def run(p, f, rx, rp):
            def body(c, _):
                rx_, rp_ = c
                dx, dy = jax.vmap(
                    lambda pi, fi, a, b: kkt_ops.solve_condensed(
                        cfg.kkt, pi, fi, a, b, pcg_budget=budget,
                        pcg_rtol=rtol,
                    )
                )(p, f, rx_, rp_)
                nx = jnp.maximum(jnp.max(jnp.abs(dx)), 1e-30)
                ny = jnp.maximum(jnp.max(jnp.abs(dy)), 1e-30)
                return (rx_ + dx / nx * 1e-3, rp_ + dy / ny * 1e-3), None

            out, _ = jax.lax.scan(body, (rx, rp), None, length=REPS)
            return out

        return run

    results["solve_corrector_s"] = (
        timeit(solve_chain_fn(None), prob_s, factors, rx0, rp0) / REPS
    )
    results["solve_corrector_rtol1e6_s"] = (
        timeit(solve_chain_fn(None, rtol=1e-6), prob_s, factors, rx0, rp0) / REPS
    )
    results["solve_predictor_s"] = (
        timeit(solve_chain_fn(0), prob_s, factors, rx0, rp0) / REPS
    )

    # --- one exact-operator pair (ozaki if enabled in cfg)
    @jax.jit
    def pair_chain(p, f, v):
        def body(vv, _):
            def one(pi, fi, vi):
                w = fi.dinv * pi.rmatvec(vi)
                return pi.matvec(w)

            o = jax.vmap(one)(p, f, vv)
            return o / jnp.maximum(jnp.max(jnp.abs(o)), 1e-30), None

        out, _ = jax.lax.scan(body, v, None, length=REPS)
        return out

    results["exact_pair_s"] = timeit(pair_chain, prob_s, factors, st.y) / REPS

    # --- glue components (the iteration minus factor/solves/pair):
    # termination check, step rule + apply, rhs builds, bound-dual
    # recovery.  Each chained REPS times like the above.
    from madipm_tpu.solver import kernels as KK

    @jax.jit
    def term_chain(p, s):
        def body(s_, _):
            ax = jax.vmap(lambda pi, xi: pi.matvec(xi))(p, s_.x)
            aty = jax.vmap(lambda pi, yi: pi.rmatvec(yi))(p, s_.y)
            s2 = jax.vmap(partial(driver.update_termination, cfg))(p, s_, ax, aty)
            return s2._replace(status=s_.status, x=s_.x * (1 + 1e-18)), None

        out, _ = jax.lax.scan(body, s, None, length=REPS)
        return out

    results["term_incl_pair_s"] = timeit(term_chain, prob_s, st) / REPS

    @jax.jit
    def ftb_chain(p, s):
        def body(v, _):
            dxv, dzlv, dzuv = v
            def one(pi, si, dxi, dzli, dzui):
                import dataclasses as dc
                pb = dc.replace(pi, lb=si.lb, ub=si.ub)
                return KK.mehrotra_adaptive_step(
                    pb, si.x, si.zl, si.zu, dxi, dzli, dzui, 0.995
                )
            ap, ad = jax.vmap(one)(p, s, dxv, dzlv, dzuv)
            scale_ = 1.0 + 1e-18 * ap[:, None] + 0e0 * ad[:, None]
            return (dxv * scale_, dzlv * scale_, dzuv * scale_), None

        out, _ = jax.lax.scan(body, (s.dx, s.dzl, s.dzu), None, length=REPS)
        return out

    results["ftb_mehrotra_s"] = timeit(ftb_chain, prob_s, st) / REPS

    ax0 = jax.vmap(lambda pi, xi: pi.matvec(xi))(prob_s, st.x)
    aty0 = jax.vmap(lambda pi, yi: pi.rmatvec(yi))(prob_s, st.y)

    @jax.jit
    def rhs_chain2(p, s, ax0, aty0):
        def body(v, _):
            ax, aty = v
            def one(pi, si, axi, atyi):
                import dataclasses as dc
                pb = dc.replace(pi, lb=si.lb, ub=si.ub)
                r = KK.predictor_rhs(pb, si.x, si.y, si.zl, si.zu, axi, atyi)
                r2 = KK.corrector_rhs(
                    pb, si.x, si.y, si.zl, si.zu, si.mu,
                    si.dx * si.dzl, si.dx * si.dzu, axi, atyi,
                )
                return r.rx + r2.rx, r.rp + r2.rp
            sx, sp = jax.vmap(one)(p, s, ax, aty)
            bump = 1e-18 * jnp.max(jnp.abs(sx))
            return (ax * (1.0 + bump), aty * (1.0 + bump)), None

        out, _ = jax.lax.scan(body, (ax0, aty0), None, length=REPS)
        return out

    results["rhs_builds_s"] = timeit(rhs_chain2, prob_s, st, ax0, aty0) / REPS

    # --- termination check alone (pair precomputed): isolates the glue part
    # of term_incl_pair_s from the A-applications.
    @jax.jit
    def term_only_chain(p, s, ax, aty):
        def body(s_, _):
            s2 = jax.vmap(partial(driver.update_termination, cfg))(p, s_, ax, aty)
            return s2._replace(status=s_.status, x=s_.x * (1 + 1e-18)), None

        out, _ = jax.lax.scan(body, s, None, length=REPS)
        return out

    results["term_only_s"] = timeit(term_only_chain, prob_s, st, ax0, aty0) / REPS

    # --- step phase alone (step rule + apply + boundary adjust + salvage
    # masking + state rebuild): the tail glue after the direction solves.
    @jax.jit
    def step_chain(p, s):
        def body(s_, _):
            s2 = jax.vmap(
                lambda pi, si: driver._step_phase(
                    cfg, pi, si, si.dx, si.dy, si.dzl, si.dzu, si.mu,
                    si.mu_curr, jnp.asarray(False), si.del_w, si.del_c,
                    si.reg_p, si.reg_d,
                )
            )(p, s_)
            return s2._replace(
                k=s_.k, x=s_.x, y=s_.y, zl=s_.zl, zu=s_.zu,
                lb=s_.lb, ub=s_.ub, status=s_.status,
                dx=s_.dx * (1 + 1e-18),
            ), None

        out, _ = jax.lax.scan(body, s, None, length=REPS)
        return out

    results["step_phase_s"] = timeit(step_chain, prob_s, st) / REPS

    # --- Mehrotra centering glue (affine FTB + mu_aff + correction products
    # + barrier): the glue between predictor and corrector solves.
    @jax.jit
    def center_chain(p, s):
        def body(v, _):
            dxv, dzlv, dzuv = v

            def one(pi, si, dxi, dzli, dzui):
                import dataclasses as dc
                pb = dc.replace(pi, lb=si.lb, ub=si.ub)
                ap, ad = KK.fraction_to_boundary(
                    pb, si.x, si.zl, si.zu, dxi, dzli, dzui, 1.0
                )
                mu_aff = KK.affine_complementarity_measure(
                    pb, si.x, si.zl, si.zu, dxi, dzli, dzui, ap, ad
                )
                cl, cu = KK.mehrotra_correction(pb, dxi, dzli, dzui)
                mu_new, mu_curr = KK.mehrotra_barrier(
                    pb, si.x, si.zl, si.zu, mu_aff, cfg.mu_min,
                    power=cfg.barrier_update.power,
                    sigma_min=cfg.barrier_update.sigma_min,
                    sigma_max=cfg.barrier_update.sigma_max,
                )
                return mu_new + jnp.max(cl) + jnp.max(cu)

            o = jax.vmap(one)(p, s, dxv, dzlv, dzuv)
            scale_ = 1.0 + 1e-18 * o[:, None]
            return (dxv * scale_, dzlv * scale_, dzuv * scale_), None

        out, _ = jax.lax.scan(body, (s.dx, s.dzl, s.dzu), None, length=REPS)
        return out

    results["centering_glue_s"] = timeit(center_chain, prob_s, st) / REPS

    # --- bound-dual recovery x2 (predictor + corrector tails)
    @jax.jit
    def recover_chain(p, s):
        def body(dxv, _):
            def one(pi, si, dxi):
                import dataclasses as dc
                pb = dc.replace(pi, lb=si.lb, ub=si.ub)
                r = KK.predictor_rhs(
                    pb, si.x, si.y, si.zl, si.zu,
                    jnp.zeros_like(si.y), jnp.zeros_like(si.x),
                )
                dzl, dzu = KK.recover_bound_duals(pb, si.x, si.zl, si.zu, r, dxi)
                return dzl + dzu

            o = jax.vmap(one)(p, s, dxv)
            return dxv + 1e-18 * o, None

        out, _ = jax.lax.scan(body, s.dx, None, length=REPS)
        return out

    results["recover_duals_s"] = timeit(recover_chain, prob_s, st) / REPS

    # --- full _loop_body with carried pair (termination + neutralization
    # masking + iteration + lane-discard tree_map): what one solve_device
    # inner trip actually costs; compare against iteration_s to price the
    # termination+discard wrapper.
    @jax.jit
    def loop_body_chain(p, s, ax, aty):
        def body(c, _):
            s_, ax_, aty_ = c
            s2, ax2, aty2 = jax.vmap(partial(driver._loop_body, cfg))(
                p, s_, ax_, aty_
            )
            s2 = s2._replace(k=s_.k, status=s_.status)
            return (s2, ax2, aty2), None

        out, _ = jax.lax.scan(body, (s, ax, aty), None, length=REPS)
        return out

    results["loop_body_s"] = timeit(loop_body_chain, prob_s, st, ax0, aty0) / REPS

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
