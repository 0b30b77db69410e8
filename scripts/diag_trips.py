"""Per-trip wall time along the REAL solve trajectory.

The round-5 chained profile showed the per-component costs at a fixed
early iterate summing to ~8 ms while the real per-trip average is ~19 ms
(m=1024/n=2048 x8).  Hypothesis: the corrector PCG trip count grows as mu
falls (rtol_corr = clip(0.01 mu, 1e-13, cap) tightens to ~1e-13 while the
fp32 preconditioner weakens), so LATE trips are several times the cost of
EARLY trips, and the max-over-lanes vmap semantics amplify it.

Method: drive the solve with the real _loop_body (carried-pair recurrence,
live status) in jitted CHUNKS of T trips; sync after each chunk.  Each
chunk pays the ~26 ms tunnel floor once; differences between chunks are
device time.  Reports per-chunk wall, mean mu, and active-lane count.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util

spec = importlib.util.spec_from_file_location(
    "benchmod",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
benchmod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(benchmod)

import numpy as np
import jax
import jax.numpy as jnp


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
    from madipm_tpu.utils.status import Status

    k = int(os.environ.get("PROFILE_K", "8"))
    m = int(os.environ.get("PROFILE_M", "1024"))
    n = int(os.environ.get("PROFILE_N", str(2 * m)))
    density = float(os.environ.get("PROFILE_DENSITY", "0.15"))
    T = int(os.environ.get("PROFILE_CHUNK", "3"))
    NCHUNK = int(os.environ.get("PROFILE_NCHUNK", "12"))

    models = benchmod.make_suite(k=k, n=n, m=m, density=density)
    opt = mt.load_options(
        tol=1e-8, max_iter=300,
        regularization=mt.FixedRegularization(1e-8, -1e-8),
        print_level=mt.PrintLevel.ERROR,
        linear_solver=mt.LinearSolver.CHOLESKY_INV,
        factor_dtype="float32", refinement_steps=12, pcg_adaptive_tol=True,
        predictor_pcg_budget=0, pcg_tol_cap=1e-6,
        pcg_tol_floor=float(os.environ.get("ABL_FLOOR", "1e-8")),
    )
    probs, _ = bucket_pad(models)
    cfg = driver.make_config(opt, is_qp=False)

    init = jax.jit(jax.vmap(partial(driver.initialize, cfg)))
    prob_s, scale, st = init(probs)

    @jax.jit
    def chunk(p, s, ax, aty):
        def body(c, _):
            s_, ax_, aty_ = c
            return jax.vmap(partial(driver._loop_body, cfg))(p, s_, ax_, aty_), None

        out, _ = jax.lax.scan(body, (s, ax, aty), None, length=T)
        return out

    pair = jax.jit(
        jax.vmap(lambda pi, xi, yi: (pi.matvec(xi), pi.rmatvec(yi)))
    )

    # materialize + warm up compile
    ax, aty = pair(prob_s, st.x, st.y)
    np.asarray(ax[0, 0])
    s2 = chunk(prob_s, st, ax, aty)
    np.asarray(s2[0].k[0])

    # fresh start (timed)
    prob_s, scale, st = init(probs)
    ax, aty = pair(prob_s, st.x, st.y)
    np.asarray(ax[0, 0])

    rows = []
    for c in range(NCHUNK):
        t0 = time.time()
        st, ax, aty = chunk(prob_s, st, ax, aty)
        kk = np.asarray(st.k)  # sync
        wall = time.time() - t0
        mu = np.asarray(st.mu)
        active = int(np.sum(np.asarray(st.status) == int(Status.REGULAR)))
        rows.append(
            dict(chunk=c, wall_ms=wall * 1e3, per_trip_ms=wall * 1e3 / T,
                 mean_k=float(kk.mean()), active=active,
                 mu_min=float(mu.min()), mu_max=float(mu.max()))
        )
        print(json.dumps(rows[-1]), flush=True)
        if active == 0:
            break

    print(json.dumps({"summary": rows}), flush=True)


if __name__ == "__main__":
    main()
