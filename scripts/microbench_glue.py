"""What does a ~1.3 ms glue component actually pay for?

The round-5 chained profile shows six per-iteration glue components
(termination, centering, FTB/step, rhs builds, bound-dual recovery x2)
each costing ~1.3 ms at k=8/m=1024/n=2048 — yet each touches only
~16k-element fp64 vectors (hundreds of KB).  This bench separates the
candidate cost models inside one lax.scan (amortizing the tunnel floor):

  - scan-carry floor: a no-op body carrying the FULL IPMState pytree
    (~30 arrays) — prices while_loop/scan carry materialization.
  - 1 / 10 / 40 chained fp64 multiplies on one [k,n] array — slope =
    per-elementwise-op cost, intercept = per-trip floor.
  - the same in fp32 — the fp64 emulation multiplier.
  - 8 masked fp64 reductions (the update_termination pattern).
  - fp64 divides (slack recurrences use them heavily).

Run on TPU:  python scripts/microbench_glue.py
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


REPS = int(os.environ.get("PROFILE_REPS", "50"))


def main():
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache

    configure_cache(jax, backend)
    print(f"backend: {backend}", file=sys.stderr, flush=True)

    k = int(os.environ.get("PROFILE_K", "8"))
    n = int(os.environ.get("PROFILE_N", "2048"))
    m = n // 2

    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.random((k, n)))
    x32 = x64.astype(jnp.float32)
    mask = jnp.asarray(rng.random((k, n)) < 0.7)

    results = {"shape": f"k{k}_n{n}", "backend": backend, "reps": REPS}

    def chain(body):
        @jax.jit
        def run(v):
            out, _ = jax.lax.scan(lambda c, _: (body(c), None), v, None, length=REPS)
            return out

        return run

    # --- no-op state-pytree carry (the scan/while carry floor)
    from madipm_tpu.solver.state import init_state

    st1 = init_state(n, m, jnp.float64)
    st = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (k,) + a.shape).copy(), st1
    )

    @jax.jit
    def carry_chain(s):
        def body(c, _):
            return jax.tree_util.tree_map(lambda a: a, c), None

        out, _ = jax.lax.scan(body, s, None, length=REPS)
        return out

    results["carry_noop_s"] = timeit(carry_chain, st) / REPS

    @jax.jit
    def carry_touch_chain(s):
        def body(c, _):
            return jax.tree_util.tree_map(
                lambda a: a * (1 + jnp.asarray(1e-18, a.dtype))
                if jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                c,
            ), None

        out, _ = jax.lax.scan(body, s, None, length=REPS)
        return out

    results["carry_touch_s"] = timeit(carry_touch_chain, st) / REPS

    # --- chained multiplies, fp64 vs fp32
    for nops in (1, 10, 40):
        def mul_body(v, nops=nops):
            for i in range(nops):
                v = v * (1.0 + 1e-18 * (i + 1))
            return v

        results[f"mul{nops}_f64_s"] = timeit(chain(mul_body), x64) / REPS
        results[f"mul{nops}_f32_s"] = timeit(chain(mul_body), x32) / REPS

    # --- divides
    def div_body(v):
        for i in range(10):
            v = v / (1.0 + 1e-18 * (i + 1))
        return v

    results["div10_f64_s"] = timeit(chain(div_body), x64) / REPS
    results["div10_f32_s"] = timeit(chain(div_body), x32) / REPS

    # --- masked reductions (the update_termination pattern): 8 independent
    # masked max/sum over [k,n], recombined into the carried array.
    def red_body(v):
        outs = []
        for i in range(4):
            outs.append(jnp.max(jnp.where(mask, jnp.abs(v) * (1.0 + 1e-18 * i), 0.0), axis=1))
            outs.append(jnp.sum(jnp.where(mask, v * (1.0 + 1e-18 * i), 0.0), axis=1))
        s = sum(outs)
        return v * (1.0 + 1e-18 * s[:, None])

    results["red8_f64_s"] = timeit(chain(red_body), x64) / REPS
    results["red8_f32_s"] = timeit(chain(red_body), x32) / REPS

    # --- one fused reduction over a single packed array (merged-reduction
    # candidate): same volume, 1 reduce instead of 8.
    def red1_body(v):
        s = jnp.max(jnp.abs(v), axis=1)
        return v * (1.0 + 1e-18 * s[:, None])

    results["red1_f64_s"] = timeit(chain(red1_body), x64) / REPS

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
