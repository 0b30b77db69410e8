"""KKT-system formulations.

Functional (stateless) analogue of the reference's KKT abstraction layer
(reference: src/KKT/normalkkt.jl plus the MadNLP SparseKKTSystem /
ScaledSparseKKTSystem family selected via ``IPMOptions.kkt_system``,
src/utils.jl:71,110).  Two formulations:

- **NORMAL** (LP only, like the reference's ``NormalKKTSystem``,
  src/KKT/normalkkt.jl:29-140): condense the augmented system onto the dual
  block and factorize the SPD normal matrix ``S = A Sigma^-1 A' - del_c I``
  of size m.  On TPU the assembly is one big MXU matmul
  ``(A * dinv) @ A.T`` instead of the reference's row-intersection sparse
  kernel (ext/MadIPMCUDAExt/cuda_wrapper.jl:108-234).

- **AUGMENTED** (K2, LP+QP, like MadNLP's SparseKKTSystem): factorize the
  quasi-definite matrix ``[Sigma+Q, A'; A, del_c I]`` with unpivoted LDL'
  (or LU fallback).

Both consume the *condensed* right-hand side (rx, rp) produced by the solver
kernels and return (dx, dy); bound-multiplier recovery (the reference's
``finish_aug_solve!``) lives in solver/kernels.py.

Padding/masking contract (see models/qp.py): fixed and padded columns are
excluded by zeroing their ``dinv`` / KKT rows+cols and pinning the diagonal
to 1; padded constraint rows likewise.  This keeps every factorization
nonsingular with static shapes — the TPU replacement for the reference's
index-set views.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..models.qp import DeviceQP
from ..utils.options import KKTSystem, LinearSolver
from . import linalg


@dataclasses.dataclass(frozen=True)
class KKTConfig:
    """Static configuration of the per-iteration linear solve."""

    kind: KKTSystem
    linear_solver: LinearSolver
    factor_dtype: jnp.dtype
    refinement_steps: int = 2
    max_factor_trials: int = 3  # reference: src/linear_solver.jl:7


class NormalFactors(NamedTuple):
    L: jax.Array  # Cholesky factor of S (factor dtype)
    S: jax.Array  # normal matrix in residual dtype (for refinement matvec)
    dinv: jax.Array  # Sigma^-1 with fixed/padded columns zeroed


class AugmentedFactors(NamedTuple):
    Lfac: jax.Array  # LDL: unit-lower L; LU: packed LU
    dfac: jax.Array  # LDL: diagonal d; LU: pivot indices
    K: jax.Array  # augmented matrix in residual dtype
    sigma: jax.Array


# ---------------------------------------------------------------------------
# Sigma (barrier diagonal)
# ---------------------------------------------------------------------------


def build_sigma(prob: DeviceQP, x, zl, zu, del_w):
    """Sigma = del_w + Zl (X - Xl)^-1 + Zu (Xu - X)^-1 on free columns.

    Matches ``set_aug_diagonal_reg!`` (reference: src/kernels.jl:124-136):
    pr_diag = reg - l_lower/l_diag - u_lower/u_diag with l_diag = xl - x < 0.
    Non-free (fixed/padded) columns are pinned to 1.
    """
    has_lb, has_ub, free = prob.has_lb, prob.has_ub, prob.free_mask
    sl = jnp.where(has_lb, x - prob.lb, 1.0)
    su = jnp.where(has_ub, prob.ub - x, 1.0)
    sigma = del_w + jnp.where(has_lb, zl / sl, 0.0) + jnp.where(has_ub, zu / su, 0.0)
    return jnp.where(free, sigma, 1.0)


# ---------------------------------------------------------------------------
# Factorization (with the reference's regularization-bump retry loop)
# ---------------------------------------------------------------------------


def _assemble_normal(prob: DeviceQP, sigma, del_c):
    """S = A Sigma^-1 A' - del_c I with padded rows pinned to identity."""
    free = prob.free_mask
    dinv = jnp.where(free, 1.0 / sigma, 0.0)
    # One MXU matmul: (m,n) * (n,) -> (m,n) @ (n,m)
    S = jnp.dot(prob.A * dinv[None, :], prob.A.T, preferred_element_type=prob.A.dtype)
    diag_add = jnp.where(prob.row_mask, -del_c, 1.0 - jnp.diagonal(S))
    S = S + jnp.diag(diag_add)
    return S, dinv


def _assemble_augmented(prob: DeviceQP, sigma, del_c):
    """K = [Sigma+Q, A'; A, del_c I], masked columns/rows pinned."""
    free = prob.free_mask
    A_eff = prob.A * free[None, :]
    n, m = prob.n, prob.m
    H = jnp.diag(sigma)
    if prob.Q is not None:
        Qm = prob.Q * free[None, :] * free[:, None]
        H = H + Qm
    du = jnp.where(prob.row_mask, del_c, 1.0)
    # del_c == 0 with padded rows already pinned; live rows keep del_c (may be 0:
    # the augmented matrix stays nonsingular if A has full row rank).
    K = jnp.block([[H, A_eff.T], [A_eff, jnp.diag(du)]])
    return K


def factorize(cfg: KKTConfig, prob: DeviceQP, x, zl, zu, del_w, del_c):
    """Factorize the KKT system, bumping regularization x100 on failure.

    Mirrors ``factorize_regularized_system!`` (reference:
    src/linear_solver.jl:6-17): up to ``max_factor_trials`` attempts, each
    multiplying (del_w, del_c) by 100.  Returns (factors, del_w, del_c, ok).
    """
    rdtype = prob.A.dtype

    def attempt(dw, dc):
        sigma = build_sigma(prob, x, zl, zu, dw)
        if cfg.kind == KKTSystem.NORMAL:
            S, dinv = _assemble_normal(prob, sigma, dc)
            L = linalg.cholesky_factor(S, dtype=cfg.factor_dtype)
            ok = linalg.cholesky_is_ok(L)
            return NormalFactors(L=L, S=S, dinv=dinv), ok
        else:
            K = _assemble_augmented(prob, sigma, dc)
            if cfg.linear_solver == LinearSolver.LU:
                lu, piv = linalg.lu_factor(K, dtype=cfg.factor_dtype)
                ok = linalg.lu_is_ok(lu)
                return AugmentedFactors(Lfac=lu, dfac=piv, K=K, sigma=sigma), ok
            else:  # LDL
                L, d = linalg.ldl_factor(K, dtype=cfg.factor_dtype)
                ok = linalg.ldl_is_ok(L, d)
                return AugmentedFactors(Lfac=L, dfac=d, K=K, sigma=sigma), ok

    factors0, ok0 = attempt(del_w, del_c)

    def cond(carry):
        trial, dw, dc, _, ok = carry
        return (~ok) & (trial < cfg.max_factor_trials)

    def body(carry):
        trial, dw, dc, _, _ = carry
        dw = dw * 100.0
        dc = dc * 100.0
        f, ok = attempt(dw, dc)
        return (trial + 1, dw, dc, f, ok)

    trial, del_w, del_c, factors, ok = lax.while_loop(
        cond, body, (jnp.asarray(1), jnp.asarray(del_w, rdtype), jnp.asarray(del_c, rdtype), factors0, ok0)
    )
    return factors, del_w, del_c, ok


# ---------------------------------------------------------------------------
# Condensed solve
# ---------------------------------------------------------------------------


def solve_condensed(cfg: KKTConfig, prob: DeviceQP, factors, rx, rp):
    """Solve [Sigma+Q, A'; A, del_c][dx; dy] = [rx; rp].

    NORMAL path mirrors the reference's condensation stack
    (src/KKT/normalkkt.jl:196-219): r2 = A Sigma^-1 rx - rp, SPD solve for
    dy, back-substitute dx = Sigma^-1 (rx - A' dy).  Low-precision factor
    solves are wrapped in fp64 iterative refinement (ops/linalg.refine),
    replacing the reference's residual check + SolveException
    (src/linear_solver.jl:28-43) with active correction.
    """
    A = prob.A
    if isinstance(factors, NormalFactors):
        dinv = factors.dinv
        r1 = dinv * rx
        r2 = jnp.dot(A, r1, preferred_element_type=rx.dtype) - rp
        r2 = jnp.where(prob.row_mask, r2, 0.0)

        solve_fn = lambda b: linalg.cholesky_solve(factors.L, b)
        matvec = lambda v: jnp.dot(factors.S, v, preferred_element_type=rx.dtype)
        dy = linalg.refine(solve_fn, matvec, r2, cfg.refinement_steps)
        dy = jnp.where(prob.row_mask, dy, 0.0)

        dx = dinv * (rx - jnp.dot(A.T, dy, preferred_element_type=rx.dtype))
        return dx, dy
    else:
        n = prob.n
        rhs = jnp.concatenate([jnp.where(prob.free_mask, rx, 0.0), jnp.where(prob.row_mask, rp, 0.0)])
        if cfg.linear_solver == LinearSolver.LU:
            solve_fn = lambda b: linalg.lu_solve(factors.Lfac, factors.dfac, b)
        else:
            solve_fn = lambda b: linalg.ldl_solve(factors.Lfac, factors.dfac, b)
        matvec = lambda v: jnp.dot(factors.K, v, preferred_element_type=rx.dtype)
        sol = linalg.refine(solve_fn, matvec, rhs, cfg.refinement_steps)
        dx = jnp.where(prob.free_mask, sol[:n], 0.0)
        dy = jnp.where(prob.row_mask, sol[n:], 0.0)
        return dx, dy
