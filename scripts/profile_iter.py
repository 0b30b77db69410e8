"""Per-component timing of one IPM iteration at benchmark shapes.

Times, on the current backend (intended: the real TPU):
  - full fused iteration          (driver.iteration)
  - factorization only            (kkt.factorize, incl. retry loop)
  - one condensed solve           (kkt.solve_condensed, corrector budget)
  - predictor-budget solve        (kkt.solve_condensed, reduced PCG budget)

Each is jitted separately and synced with a host fetch (block_until_ready
lies through this environment's tunnel — see bench.py).  Guides where the
per-iteration time goes (factor vs PCG solves vs elementwise).
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
import jax.numpy as jnp


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, reps=5):
    fn(*args)  # compile
    sync(fn(*args))
    walls = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        walls.append(time.time() - t0)
    return float(np.median(walls))


def main():
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache
    configure_cache(jax, backend)
    print(f"backend: {backend}", file=sys.stderr, flush=True)

    import dataclasses
    from functools import partial

    import madipm_tpu as mt
    from madipm_tpu.parallel.batch import bucket_pad
    from madipm_tpu.solver import driver
    from madipm_tpu.ops import kkt as kkt_ops
    from madipm_tpu.utils.options import load_options

    k, m, n, density = 8, 1024, 2048, 0.15
    models = benchmod.make_suite(k=k, n=n, m=m, density=density)
    opts = dict(
        tol=1e-8, max_iter=300,
        regularization=mt.FixedRegularization(1e-8, -1e-8),
        print_level=mt.PrintLevel.ERROR,
    )
    if backend != "cpu":
        opts.update(linear_solver=mt.LinearSolver.CHOLESKY_INV,
                    factor_dtype="float32", refinement_steps=6)
    opt = load_options(**opts)
    probs, _ = bucket_pad(models)
    cfg = driver.make_config(opt, is_qp=False)

    init = jax.jit(jax.vmap(partial(driver.initialize, cfg)))
    prob_s, scale, st = init(probs)
    sync(st.x)

    # advance a few iterations so sigma is representative
    step = jax.jit(jax.vmap(partial(driver.iteration, cfg)))
    for _ in range(5):
        st = step(prob_s, st)
    sync(st.x)

    results = {"shape": f"k{k}_m{m}_n{n}", "backend": backend}

    results["iteration_s"] = timeit(lambda p, s: step(p, s), prob_s, st)

    def fac(p, s):
        pp = dataclasses.replace(p, lb=s.lb, ub=s.ub)
        return kkt_ops.factorize(cfg.kkt, pp, s.x, s.zl, s.zu, s.del_w, s.del_c)

    vfac = jax.jit(jax.vmap(fac))
    results["factorize_s"] = timeit(lambda p, s: vfac(p, s)[0].L, prob_s, st)

    factors, dw, dc, ok = vfac(prob_s, st)
    rx = st.zl - st.zu - 0.01 * jnp.sign(st.x)
    rp = jnp.zeros_like(st.y) + 0.001

    def solve_full(p, f, rx_, rp_):
        return kkt_ops.solve_condensed(cfg.kkt, p, f, rx_, rp_)

    vsolve = jax.jit(jax.vmap(partial(solve_full)))
    results["solve_full_s"] = timeit(lambda: vsolve(prob_s, factors, rx, rp))

    def solve_pred(p, f, rx_, rp_):
        return kkt_ops.solve_condensed(cfg.kkt, p, f, rx_, rp_, pcg_budget=6)

    vsolvep = jax.jit(jax.vmap(partial(solve_pred)))
    results["solve_pred_s"] = timeit(lambda: vsolvep(prob_s, factors, rx, rp))

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
