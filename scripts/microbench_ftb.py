#!/usr/bin/env python
"""Microbench step-length kernels (round 4): what makes one
mehrotra_adaptive_step cost 1.27 ms — fp64-emulated argmin reductions,
the gathers, or the elementwise ratio math?

Chained-scan timing like profile_iter_chained (amortizes the tunnel
floor).  Variants at the bench shape (k=8, n=2048 fp64):
  - argmin4_f64: four separate fp64 argmin reductions + value gathers
  - argmin4_f32: same, argmin on an fp32 downcast (value gathered fp64)
  - min4_f64 / min4_f32: value-only min reductions (fraction_to_boundary
    needs no indices)
  - stacked_min_f32: one (4, n) stacked fp32 min reduce
"""

import importlib.util
import json
import os
import sys
import time

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


REPS = 50


def main():
    jax.config.update("jax_enable_x64", True)
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache
    configure_cache(jax, backend)
    print(f"backend: {backend}", file=sys.stderr, flush=True)

    k, n = 8, 2048
    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.normal(size=(k, 4, n)) ** 2 + 0.1, jnp.float64)
    M = jnp.asarray(rng.random(size=(k, 4, n)) > 0.3)
    sync(V)

    results = {"shape": f"k{k}_n{n}", "backend": backend, "reps": REPS}
    BIG = 1e30

    def chain(step):
        @jax.jit
        def run(Vb):
            def body(Vc, _):
                out = jax.vmap(step)(Vc, M)
                bump = 1e-18 * jnp.max(out)
                return Vc * (1.0 + bump), None

            out, _ = jax.lax.scan(body, Vb, None, length=REPS)
            return out

        return run

    def argmin4_f64(v, m):
        outs = []
        for j in range(4):
            w = jnp.where(m[j], v[j], BIG)
            i = jnp.argmin(w)
            outs.append(jnp.minimum(1.0, w[i]))
        return jnp.stack(outs).sum()

    def argmin4_f32(v, m):
        outs = []
        for j in range(4):
            w = jnp.where(m[j], v[j], BIG)
            i = jnp.argmin(w.astype(jnp.float32))
            outs.append(jnp.minimum(1.0, w[i]))
        return jnp.stack(outs).sum()

    def min4_f64(v, m):
        w = jnp.where(m, v, BIG)
        return jnp.minimum(1.0, w.min(axis=1)).sum()

    def min4_f32(v, m):
        w = jnp.where(m, v, BIG).astype(jnp.float32)
        return jnp.minimum(1.0, w.min(axis=1)).sum().astype(jnp.float64)

    def seqmin4_f64(v, m):
        outs = []
        for j in range(4):
            w = jnp.where(m[j], v[j], BIG)
            outs.append(jnp.minimum(1.0, w.min()))
        return jnp.stack(outs).sum()

    for name, f in [
        ("argmin4_f64", argmin4_f64),
        ("argmin4_f32", argmin4_f32),
        ("min4_stacked_f64", min4_f64),
        ("min4_stacked_f32", min4_f32),
        ("min4_separate_f64", seqmin4_f64),
    ]:
        results[name + "_s"] = timeit(chain(f), V) / REPS
        print(name, results[name + "_s"], file=sys.stderr, flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
