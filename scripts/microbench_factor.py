#!/usr/bin/env python
"""Microbench the factor phase pieces at the bench shape (round 4).

factorize() measured 5.45 ms/iter at m=1024/n=2048 k=8 while the analytic
MXU work (6-pass assembly 2m^2n + ~12 m^3 inverse-chol build) is ~1.5 ms —
this breaks the gap down: normal-matrix assembly, chol_inv at several
base-case sizes (the recursion's 16x16 masked eliminations are ~m/base
SEQUENTIAL tiny-op chains — latency, not FLOPs), and the full factorize.

Each component is chained REPS times inside one lax.scan (input perturbed
per trip so nothing is CSE'd) — amortizes the ~32 ms tunnel fetch floor.
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


REPS = 20


def main():
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache
    configure_cache(jax, backend)
    print(f"backend: {backend}", file=sys.stderr, flush=True)

    from madipm_tpu.ops import block_chol

    k, m = 8, 1024
    rng = np.random.default_rng(0)
    # SPD batch like a normal matrix: A D A' + shift
    B = rng.normal(size=(k, m, 2 * m)).astype(np.float32)
    S = np.einsum("kij,klj->kil", B, B) / (2 * m) + 1e-3 * np.eye(m, dtype=np.float32)
    S = jnp.asarray(S, jnp.float32)
    sync(S)

    results = {"shape": f"k{k}_m{m}", "backend": backend, "reps": REPS}

    for base in (8, 16, 32, 64, 128):
        @jax.jit
        def chain(Sb, base=base):
            def body(Sc, _):
                L, W = jax.vmap(partial(block_chol.chol_inv, base=base))(Sc)
                bump = 1e-18 * jnp.max(jnp.abs(W))
                return Sc * (1.0 + bump), None

            out, _ = jax.lax.scan(body, Sb, None, length=REPS)
            return out

        key = f"chol_inv_base{base}_s"
        try:
            results[key] = timeit(chain, S) / REPS
        except Exception as e:  # noqa: BLE001
            results[key] = f"ERROR {type(e).__name__}"
        print(f"{key}: {results[key]}", file=sys.stderr, flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
