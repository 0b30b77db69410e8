"""Microbench: ELL SpMV cost by dtype on TPU (VERDICT.md item 4 scoping).

The dense-path measurement (scripts/microbench_matvec.py) showed emulated
fp64 is 24x fp32 for MATMUL-shaped work (MXU-bound).  The sparse path's
SpMV is gather + elementwise multiply + lane reduction — a different cost
model (gather/VPU-bound), so the fp64 penalty must be measured, not
assumed, before investing in an integer-slice scheme for ELL.

Variants timed (matvec + rmatvec pair, chained via lax.scan to amortize
the ~32 ms tunnel round-trip floor):
  fp64    — emulated double-word arithmetic on the gathered lanes
  fp32    — same op in fp32 (the lower bound a slicing scheme could reach)
  i8x49   — exact Ozaki-style: 7x7 integer slice pairs in fp32 lanes
            (what a "sparse ozaki" would cost; only worth building if
            fp64/fp32 ratio >> 49/pair-count economics)
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
from jax import lax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache
    configure_cache(jax, backend)
    log(f"backend={backend}")

    m, n, K = 2048, 4096, 64
    rng = np.random.default_rng(0)
    A_val = rng.standard_normal((m, K))
    A_col = rng.integers(0, n, size=(m, K)).astype(np.int32)
    x = rng.standard_normal(n)

    def spmv(val, col, v):
        return jnp.sum(val * v[col], axis=1)

    def run(dtype, label):
        val = jnp.asarray(A_val, dtype)
        col = jnp.asarray(A_col)
        v0 = jnp.asarray(x, dtype)

        def chain(v):
            def body(carry, _):
                y = spmv(val, col, jnp.resize(carry, (n,)))
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30), None

            out, _ = lax.scan(body, jnp.resize(v, (m,))[:m], None, length=50)
            return out

        # simpler: time y = A x repeatedly with x re-derived from y via resize
        cf = jax.jit(chain)
        r = np.asarray(cf(v0[:m]))  # compile+run
        t0 = time.time()
        r = np.asarray(cf(v0[:m]))
        dt = (time.time() - t0) / 50
        log(f"{label}: {dt * 1e3:.3f} ms per SpMV")
        return dt

    t64 = run(jnp.float64, "fp64 emulated")
    t32 = run(jnp.float32, "fp32")
    log(f"fp64/fp32 ratio: {t64 / t32:.1f}x  "
        f"(a 49-pass exact slicing breaks even only above 49x; "
        f"a 3-pass float-float above ~3x)")


if __name__ == "__main__":
    main()
