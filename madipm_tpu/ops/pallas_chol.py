"""Pallas fused blocked Cholesky kernels.

The cuDSS-replacement factorization (BASELINE.md north star: "Pallas
Cholesky/LDL^T factorization replacing cuDSS") as a single TPU kernel: the
whole (padded) normal matrix lives in VMEM for the duration of the
factorization — no HBM round-trips between panel steps, and no per-op XLA
dispatch overhead.  The plain-JAX recursion in ops/block_chol.py lowers to
~1000 tiny XLA ops for a 256x256 factorization; at ~5-10 us dispatch each
that is ~10 ms of pure overhead per IPM iteration.  Fusing the whole
factorization into one kernel removes it.

Two kernels:

- :func:`pallas_cholesky` — lower Cholesky factor L (right-looking blocked,
  128-wide panels; diagonal blocks via the matmul-only recursion of
  ops/block_chol.py, which also yields the block inverse so the panel
  "triangular solve" is a plain MXU matmul).
- :func:`pallas_chol_inv` — (L, L^-1) in one kernel: the factorization
  sweep above, then a blocked lower-triangular inversion
  (Linv[i,k] = -Wii @ sum_j L[i,j] @ Linv[j,k]) entirely in VMEM.  L^-1 is
  what the solver wants: every subsequent back-solve is two MXU matmuls
  (ops/block_chol.chol_inv_solve), with no sequential triangular solves.

Batched (B, N, N) inputs map to a grid over instances — one kernel launch
factors the whole vmapped-IPM stack (parallel/batch.py).

Constraints: N multiple of the 128 panel; VMEM residency caps N (~1280 at
fp32 for the 2-buffer inverse kernel in 16 MB); all index vectors are int32
(64-bit vectors are unrepresentable in TPU VectorLayout — bare
``jnp.arange`` under x64 crashes the backend compiler).  Failure semantics:
NaNs in the output signal an indefinite matrix, matching
``jnp.linalg.cholesky`` (feeds the regularization retry loop, reference
src/linear_solver.jl:6-17).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_chol import chol_inv

_BLOCK = 128
#: largest N the VMEM-resident factor-only kernel accepts
MAX_VMEM_N = 1280
#: largest N for the (L, Linv) kernel (3 resident buffers)
MAX_VMEM_N_INV = 1024
#: largest N when an outer vmap maps instances onto the batch grid — the
#: pipelined grid double-buffers the block windows, so the per-instance
#: budget is tighter (measured: N=1024 x batch exceeds the 16 MB scoped
#: VMEM limit by ~4 MB)
MAX_VMEM_N_INV_BATCHED = 768


class _Lead0:
    """View of a (1, N, N) block ref as (N, N): every index gets a leading 0.

    Batched inputs are mapped to a Pallas grid over the batch dimension
    (NOT jax.vmap of the kernel: under jax_enable_x64 the vmap batching
    rule emits i64 index scalars that Mosaic cannot legalize).  The grid
    BlockSpec then hands the kernel (1, N, N) refs; this adapter keeps the
    kernel body written in plain 2-D indexing.
    """

    def __init__(self, ref):
        self._ref = ref

    @property
    def shape(self):
        return self._ref.shape[1:]

    @property
    def dtype(self):
        return self._ref.dtype

    def _idx(self, idx):
        if idx is Ellipsis:
            return (0, Ellipsis)
        if isinstance(idx, tuple):
            return (0,) + idx
        return (0, idx)

    def __getitem__(self, idx):
        return self._ref[self._idx(idx)]

    def __setitem__(self, idx, val):
        self._ref[self._idx(idx)] = val


def _as2d(ref):
    return _Lead0(ref) if len(ref.shape) == 3 else ref


def _factor_sweep(l_ref, nblocks: int, block: int, winv_blocks: list):
    """Right-looking blocked Cholesky in-place in ``l_ref``; appends each
    diagonal block's inverse to ``winv_blocks`` (traced values)."""
    n = l_ref.shape[-1]
    for k in range(nblocks):
        j0, j1 = k * block, (k + 1) * block
        skk = l_ref[j0:j1, j0:j1]
        lkk, wkk = chol_inv(skk)  # static matmul recursion, inlined
        winv_blocks.append(wkk)
        l_ref[j0:j1, j0:j1] = lkk
        if j1 < n:
            panel = l_ref[j1:, j0:j1]
            lp = jnp.dot(panel, wkk.T, preferred_element_type=panel.dtype)
            l_ref[j1:, j0:j1] = lp
            # Trailing SYRK update on the MXU.
            l_ref[j1:, j1:] = l_ref[j1:, j1:] - jnp.dot(
                lp, lp.T, preferred_element_type=lp.dtype
            )


def _zero_upper(l_ref):
    n = l_ref.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    l_ref[...] = jnp.where(rows >= cols, l_ref[...], 0.0)


def _chol_kernel(s_ref, l_ref, nblocks: int, block: int):
    s_ref, l_ref = _as2d(s_ref), _as2d(l_ref)
    l_ref[...] = s_ref[...]
    _factor_sweep(l_ref, nblocks, block, [])
    _zero_upper(l_ref)


def _chol_inv_kernel(s_ref, l_ref, w_ref, nblocks: int, block: int):
    s_ref, l_ref, w_ref = _as2d(s_ref), _as2d(l_ref), _as2d(w_ref)
    l_ref[...] = s_ref[...]
    winv: list = []
    _factor_sweep(l_ref, nblocks, block, winv)
    _zero_upper(l_ref)
    # Blocked lower-triangular inversion, column block by column block:
    #   Linv[k,k] = Wkk
    #   Linv[i,k] = -Wii @ (sum_{k<=j<i} L[i,j] @ Linv[j,k]),  i > k
    # ~nb^3/6 MXU matmuls, all VMEM-resident.
    w_ref[...] = jnp.zeros(w_ref.shape, w_ref.dtype)
    for k in range(nblocks):
        k0, k1 = k * block, (k + 1) * block
        w_ref[k0:k1, k0:k1] = winv[k]
        for i in range(k + 1, nblocks):
            i0, i1 = i * block, (i + 1) * block
            acc = jnp.dot(
                l_ref[i0:i1, k0:i0], w_ref[k0:i0, k0:k1],
                preferred_element_type=w_ref.dtype,
            )
            w_ref[i0:i1, k0:k1] = -jnp.dot(
                winv[i], acc, preferred_element_type=w_ref.dtype
            )


def _call(kernel, S, n_out: int, interpret: bool):
    n = S.shape[-1]
    if S.ndim == 3:
        # Explicit grid over the batch: one kernel launch factors the whole
        # stack, each program instance owning one (1, N, N) block.  The
        # index map is int32-cast: under jax_enable_x64 an uncast map
        # traces to i64 scalars, which Mosaic fails to legalize
        # ("func.return (i32, i64, i64)").
        b = S.shape[0]
        spec = pl.BlockSpec(
            (1, n, n),
            lambda i: (jnp.int32(i), jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=(b,),
            out_shape=[jax.ShapeDtypeStruct(S.shape, S.dtype)] * n_out,
            in_specs=[spec],
            out_specs=[spec] * n_out,
            interpret=interpret,
        )(S)
    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(S.shape[-2:], S.dtype)] * n_out,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out,
        interpret=interpret,
    )
    return call(S)


def _batchable(kernel_for, n_out: int, block: int, interpret: bool, fallback=None):
    """Wrap _call in jax.custom_batching.custom_vmap so a solver-level
    ``jax.vmap`` (parallel/batch.py vmaps the whole solve) lowers to the
    explicit batch grid instead of pallas_call's built-in batching rule
    (which emits i64 index scalars under x64 — unlowerable by Mosaic).

    When the per-instance size exceeds the tighter batched VMEM budget
    (the pipelined grid double-buffers its block windows), the rule lowers
    through ``fallback`` (the plain-XLA recursion) instead of OOMing
    scoped VMEM at compile time."""

    @jax.custom_batching.custom_vmap
    def fn(S):
        return tuple(_call(kernel_for(S.shape[-1]), S, n_out, interpret))

    @fn.def_vmap
    def _vmap_rule(axis_size, in_batched, S):  # noqa: ANN001
        if fallback is not None and S.shape[-1] > MAX_VMEM_N_INV_BATCHED:
            out = tuple(jax.vmap(fallback)(S))
        else:
            out = tuple(_call(kernel_for(S.shape[-1]), S, n_out, interpret))
        return out, tuple([True] * n_out)

    return fn


def _validate(n, block, cap):
    if n % block != 0:
        raise ValueError(f"N={n} must be a multiple of block={block}")
    if n > cap:
        raise ValueError(
            f"N={n} exceeds the VMEM-resident limit {cap}; use "
            "ops.block_chol.chol_inv for larger systems"
        )


def pallas_cholesky(S: jax.Array, block: int = _BLOCK, interpret: bool = False):
    """Lower Cholesky factor of SPD ``S`` ((N,N) or (B,N,N))."""
    _validate(S.shape[-1], block, MAX_VMEM_N)
    kfor = lambda n: functools.partial(_chol_kernel, nblocks=n // block, block=block)
    if S.ndim == 3:
        return _call(kfor(S.shape[-1]), S, 1, interpret)[0]

    def _fb(s):
        L, _W = chol_inv(s)
        return (L,)

    return _batchable(kfor, 1, block, interpret, fallback=_fb)(S)[0]


def pallas_chol_inv(S: jax.Array, block: int = _BLOCK, interpret: bool = False):
    """(L, L^-1) of SPD ``S`` ((N,N) or (B,N,N)) in one fused kernel.

    Drop-in accelerated replacement for ops/block_chol.chol_inv on sizes
    that fit VMEM; the solver's factorize path dispatches here
    automatically (ops/kkt.py).  2-D inputs go through a custom_vmap
    wrapper so an outer ``jax.vmap`` (the batched-sweep path) maps onto the
    batch grid.
    """
    _validate(S.shape[-1], block, MAX_VMEM_N_INV)
    kfor = lambda n: functools.partial(_chol_inv_kernel, nblocks=n // block, block=block)
    if S.ndim == 3:
        return _call(kfor(S.shape[-1]), S, 2, interpret)
    return _batchable(kfor, 2, block, interpret, fallback=chol_inv)(S)
