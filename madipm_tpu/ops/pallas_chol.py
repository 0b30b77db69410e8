"""Pallas fused blocked Cholesky kernel.

The cuDSS-replacement factorization (BASELINE.md north star: "Pallas
Cholesky/LDL^T factorization replacing cuDSS") as a single TPU kernel: the
whole (padded) normal matrix lives in VMEM for the duration of the
factorization — no HBM round-trips between panel steps, unlike the XLA
``lax.linalg.cholesky`` lowering which streams blocks through HBM.

Algorithm: right-looking blocked Cholesky with 128-wide panels; each
diagonal block is factored by the matmul-only recursion of
ops/block_chol.py (which also yields the block inverse, so the panel
"triangular solve" is a plain MXU matmul).  Fits problems up to
N ~ 1500 (fp32) in 16 MB VMEM; callers fall back to the plain-JAX
recursion above that.

A batched variant factors a stack of same-size matrices with one kernel
launch (grid over the batch dimension) — the vmapped-IPM sweep pattern
(parallel/batch.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_chol import chol_inv

_BLOCK = 128
#: largest N the VMEM-resident kernel accepts (2 buffers * N^2 * 4B < 16MB)
MAX_VMEM_N = 1280


def _chol_kernel(s_ref, l_ref, nblocks: int, block: int):
    n = s_ref.shape[-1]
    # Work in l_ref: start from S, overwrite with L (strict upper zeroed).
    l_ref[...] = s_ref[...]
    for k in range(nblocks):
        j0, j1 = k * block, (k + 1) * block
        skk = l_ref[j0:j1, j0:j1]
        lkk, wkk = chol_inv(skk)  # static matmul recursion, inlined
        l_ref[j0:j1, j0:j1] = lkk
        if j1 < n:
            panel = l_ref[j1:, j0:j1]
            lp = jnp.dot(panel, wkk.T, preferred_element_type=panel.dtype)
            l_ref[j1:, j0:j1] = lp
            # Trailing SYRK update on the MXU.
            l_ref[j1:, j1:] = l_ref[j1:, j1:] - jnp.dot(
                lp, lp.T, preferred_element_type=lp.dtype
            )
    # Zero the strict upper triangle.
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    l_ref[...] = jnp.where(rows >= cols, l_ref[...], 0.0)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def pallas_cholesky(S: jax.Array, block: int = _BLOCK, interpret: bool = False):
    """Lower Cholesky factor of SPD ``S`` via one fused VMEM-resident kernel.

    ``S`` may be (N, N) or batched (B, N, N); N must be a multiple of
    ``block`` (the solver pads to lane multiples anyway).  NaNs in the
    output signal an indefinite matrix, matching ``jnp.linalg.cholesky``
    failure semantics (feeds the regularization retry loop,
    reference src/linear_solver.jl:6-17).
    """
    batched = S.ndim == 3
    n = S.shape[-1]
    if n % block != 0:
        raise ValueError(f"N={n} must be a multiple of block={block}")
    if n > MAX_VMEM_N:
        raise ValueError(
            f"N={n} exceeds the VMEM-resident limit {MAX_VMEM_N}; use "
            "ops.block_chol.chol_inv for larger systems"
        )
    nblocks = n // block
    kernel = functools.partial(_chol_kernel, nblocks=nblocks, block=block)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(S.shape[-2:], S.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    if batched:
        # vmap adds a leading grid dimension over instances — one kernel
        # launch factors the whole stack (the batched-sweep pattern).
        return jax.vmap(call)(S)
    return call(S)
