"""Microbenchmark: cost of the PCG building blocks at the bench shape.

Times, vmapped over the k=8 instance batch on the current backend:
  - fp64 normal-operator application  S v = A (dinv * (A' v))  (two fp64
    A-matvecs -- the PCG hot op)
  - the same operator in fp32
  - fp32 preconditioner application   W' (W v)  (two m x m fp32 matmuls)

Separates "fp64 emulation tax" from bandwidth so solve-path optimizations
target the right thing (see BASELINE.md / docs/design.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, reps=10):
    fn(*args)
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

    k, m, n = 8, 1024, 2048
    rng = np.random.default_rng(0)
    A64 = jnp.asarray(rng.standard_normal((k, m, n)))
    dinv = jnp.asarray(rng.random((k, n)) + 0.5)
    v = jnp.asarray(rng.standard_normal((k, m)))
    W32 = jnp.asarray(rng.standard_normal((k, m, m)), jnp.float32)
    A32 = A64.astype(jnp.float32)
    dinv32 = dinv.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    # materialize
    for x in (A64, dinv, v, W32, A32):
        sync(x)

    REPS = 50  # chained applications inside one program: amortizes the
    # axon-tunnel fetch latency (~30 ms/round trip) out of the measurement

    def chain(opfn):
        def run(*args):
            vv0 = args[-1]

            def body(vv, _):
                o = opfn(*args[:-1], vv)
                return o / jnp.maximum(jnp.max(jnp.abs(o)), 1e-30), None

            out, _ = jax.lax.scan(body, vv0, None, length=REPS)
            return out

        return jax.jit(run)

    def op64(A, d, vv):
        return jnp.einsum("kmn,kn->km", A, d * jnp.einsum("kmn,km->kn", A, vv))

    def precond(W, vv):
        y = jnp.einsum("kij,kj->ki", W, vv)
        return jnp.einsum("kji,kj->ki", W, y)

    @jax.jit
    def nullop(vv):
        return vv * 1.000001

    out = {
        "fetch_floor_s": timeit(nullop, v32),
        "matvec_pair_fp64_s": timeit(chain(op64), A64, dinv, v) / REPS,
        "matvec_pair_fp32_s": timeit(chain(op64), A32, dinv32, v32) / REPS,
        "precond_fp32_s": timeit(chain(precond), W32, v32) / REPS,
    }
    import json

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
