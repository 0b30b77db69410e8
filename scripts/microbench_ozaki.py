"""Microbenchmark + hardware validation of the Ozaki fp64 matvec.

Checks, on the current backend (intended: one real TPU chip):
  1. EXACTNESS of the scheme's core assumption — bf16 MXU contractions
     over 128-chunks of integer-valued slices accumulate without rounding
     (fp32 accumulator, partials <= 2^23) — by comparing against the
     NumPy fp64 reference at the bench shape.
  2. Throughput vs XLA's emulated-fp64 matvec pair (the quantity that
     dominates the IPM iteration; see BASELINE.md).

Timing protocol per CLAUDE.md: inputs materialized with a fetched
checksum, lax.scan chains to amortize the ~32 ms tunnel round trip.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, reps=8):
    fn(*args)
    sync(fn(*args))
    walls = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*args))
        walls.append(time.time() - t0)
    return float(np.median(walls))


def main():
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache
    configure_cache(jax, backend)
    print(f"backend: {backend}", file=sys.stderr, flush=True)

    from madipm_tpu.ops import ozaki

    k, m, n = 8, 1024, 2048
    rng = np.random.default_rng(0)
    A = rng.standard_normal((k, m, n)) * np.exp(rng.uniform(-4, 4, (k, m, 1)))
    x = rng.standard_normal((k, n)) * np.exp(rng.uniform(-6, 6, (k, n)))
    dinv = rng.random((k, n)) + 1e-6
    v = rng.standard_normal((k, m))

    Aj = jnp.asarray(A)
    xj = jnp.asarray(x)
    dj = jnp.asarray(dinv)
    vj = jnp.asarray(v)

    slice_b = jax.jit(jax.vmap(ozaki.slice_matrix))
    smA = slice_b(Aj)
    smAT = slice_b(jnp.swapaxes(Aj, 1, 2))
    for t in (Aj, xj, dj, vj, smA.slices, smAT.slices):
        sync(t)

    # --- accuracy on hardware
    mv = jax.jit(jax.vmap(ozaki.matvec))
    y = np.asarray(mv(smA, xj))
    y_ref = np.einsum("kmn,kn->km", A, x)
    scale = np.max(np.abs(A), axis=2) * np.max(np.abs(x), axis=1, keepdims=True) * n
    err = float(np.max(np.abs(y - y_ref) / scale))
    print(f"scaled matvec error on {backend}: {err:.3e} (bound 2^-44=5.7e-14)",
          file=sys.stderr, flush=True)

    REPS = 50

    def chain(opfn):
        def run(*args):
            vv0 = args[-1]

            def body(vv, _):
                o = opfn(*args[:-1], vv)
                return o / jnp.maximum(jnp.max(jnp.abs(o)), 1e-30), None

            out, _ = jax.lax.scan(body, vv0, None, length=REPS)
            return out

        return jax.jit(run)

    # fp64 emulated normal-operator pair (the current hot op)
    def pair_emulated(Ak, d, vv):
        return jnp.einsum("kmn,kn->km", Ak, d * jnp.einsum("kmn,km->kn", Ak, vv))

    # ozaki pair: S v = A (dinv * (A' v))
    def pair_ozaki(sa, sat, d, vv):
        w = d * jax.vmap(ozaki.matvec)(sat, vv)
        return jax.vmap(ozaki.matvec)(sa, w)

    # int8 variant (s8 x s8 -> s32 MXU path: claimed 2x bf16 rate and
    # 8 B/entry HBM vs bf16's 14 B/entry — verify here before trusting)
    slice_i8 = jax.jit(jax.vmap(ozaki.slice_matrix_i8))
    smA8 = slice_i8(Aj)
    smAT8 = slice_i8(jnp.swapaxes(Aj, 1, 2))
    for t in (smA8.slices, smAT8.slices):
        sync(t)
    y8 = np.asarray(jax.jit(jax.vmap(ozaki.matvec_i8))(smA8, xj))
    err8 = float(np.max(np.abs(y8 - y_ref) / scale))
    print(f"scaled i8 matvec error on {backend}: {err8:.3e}",
          file=sys.stderr, flush=True)

    def pair_i8(sa, sat, d, vv):
        w = d * jax.vmap(ozaki.matvec_i8)(sat, vv)
        return jax.vmap(ozaki.matvec_i8)(sa, w)

    out = {
        "backend": backend,
        "scaled_err": err,
        "scaled_err_i8": err8,
        "pair_fp64_emulated_s": timeit(chain(pair_emulated), Aj, dj, vj) / REPS,
        "pair_ozaki_s": timeit(chain(pair_ozaki), smA, smAT, dj, vj) / REPS,
        "pair_ozaki_i8_s": timeit(chain(pair_i8), smA8, smAT8, dj, vj) / REPS,
    }
    out["speedup"] = out["pair_fp64_emulated_s"] / out["pair_ozaki_s"]
    out["speedup_i8"] = out["pair_fp64_emulated_s"] / out["pair_ozaki_i8_s"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
