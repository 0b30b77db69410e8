"""Ruiz equilibration scaling.

Equivalent of the reference's ``scale_qp`` (reference: scripts/common.jl:46-100),
which calls HSL ``mc77`` (inf-norm Ruiz equilibration).  Here the iteration is
implemented directly (no Fortran): alternately divide rows and columns by the
square roots of their infinity norms until both are ~1.  Fully vectorized;
a pure-JAX dense variant is provided for on-device scaling of batched
problems.

Scaled data matches the reference convention exactly
(scripts/common.jl:65-99):

    A_s[i,j] = A[i,j] / (Dr[i] * Dc[j]),  H_s[i,j] = H[i,j] / (Dc[i] * Dc[j])
    c_s = c ./ Dc, lvar_s = lvar .* Dc, lcon_s = lcon ./ Dr,  x_hat = Dc .* x

Postsolve maps a scaled solution back: x = x_hat / Dc, y = y_hat / Dr,
zl = zl_hat * Dc, zu = zu_hat * Dc.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from .qp import QuadraticModel


@dataclasses.dataclass
class RuizScaling:
    Dr: np.ndarray  # [m]
    Dc: np.ndarray  # [n]

    def unscale_solution(self, x=None, y=None, zl=None, zu=None):
        out = []
        if x is not None:
            out.append(np.asarray(x) / self.Dc)
        if y is not None:
            out.append(np.asarray(y) / self.Dr)
        if zl is not None:
            out.append(np.asarray(zl) * self.Dc)
        if zu is not None:
            out.append(np.asarray(zu) * self.Dc)
        return tuple(out) if len(out) > 1 else out[0]


def ruiz_factors(A: sp.spmatrix, max_iter: int = 20, tol: float = 1e-2):
    """Inf-norm Ruiz equilibration factors (mc77 job=0 analogue)."""
    m, n = A.shape
    Dr = np.ones(m)
    Dc = np.ones(n)
    if m == 0 or n == 0 or A.nnz == 0:
        return Dr, Dc  # nothing to equilibrate (fully presolved problems)
    B = A.tocsr(copy=True).astype(np.float64)
    for _ in range(max_iter):
        Babs = abs(B)
        r = np.sqrt(Babs.max(axis=1).toarray().ravel())
        c = np.sqrt(Babs.max(axis=0).toarray().ravel())
        r[r == 0] = 1.0
        c[c == 0] = 1.0
        if max(np.abs(r * r - 1).max(initial=0), np.abs(c * c - 1).max(initial=0)) < tol:
            break
        B = sp.diags(1.0 / r) @ B @ sp.diags(1.0 / c)
        Dr *= r
        Dc *= c
    return Dr, Dc


def scale_qp(qp: QuadraticModel, max_iter: int = 20):
    """Ruiz-equilibrate a QP (reference scale_qp, scripts/common.jl:57-100).

    Returns (scaled_model, RuizScaling).
    """
    Dr, Dc = ruiz_factors(qp.A, max_iter=max_iter)
    A_s = sp.diags(1.0 / Dr) @ qp.A @ sp.diags(1.0 / Dc)
    Q_s = None
    if qp.Q is not None:
        Q_s = sp.diags(1.0 / Dc) @ qp.Q @ sp.diags(1.0 / Dc)
    scaled = QuadraticModel(
        c=qp.c / Dc,
        A=A_s.tocsr(),
        lcon=qp.lcon / Dr,
        ucon=qp.ucon / Dr,
        lvar=qp.lvar * Dc,
        uvar=qp.uvar * Dc,
        Q=None if Q_s is None else Q_s.tocsr(),
        c0=qp.c0,
        x0=qp.x0 * Dc,
        y0=qp.y0 / Dr,
        name=qp.name,
        minimize=qp.minimize,
    )
    return scaled, RuizScaling(Dr=Dr, Dc=Dc)


def ruiz_scale_dense(A: jnp.ndarray, max_iter: int = 10):
    """Pure-JAX dense Ruiz sweep (for batched on-device pipelines).

    Returns (A_scaled, dr, dc) with A_scaled = A / (dr[:, None] * dc[None, :]).
    jit/vmap-compatible: fixed iteration count, no data-dependent control flow.
    """
    m, n = A.shape
    dr = jnp.ones((m,), A.dtype)
    dc = jnp.ones((n,), A.dtype)
    B = A
    for _ in range(max_iter):
        r = jnp.sqrt(jnp.maximum(jnp.max(jnp.abs(B), axis=1), 1e-30))
        r = jnp.where(r < 1e-15, 1.0, r)
        B = B / r[:, None]
        dr = dr * r
        c = jnp.sqrt(jnp.maximum(jnp.max(jnp.abs(B), axis=0), 1e-30))
        c = jnp.where(c < 1e-15, 1.0, c)
        B = B / c[None, :]
        dc = dc * c
    return B, dr, dc
