"""Presolve pass.

Equivalent of the reference's ``presolve_qp`` (reference: src/utils.jl:319-343),
which delegates to QuadraticModels.presolve.  Implements the same class of
reductions natively:

- empty rows (0 = b: drop if consistent, else infeasible),
- singleton rows (a_ij x_j ~ b_i: fold into the bounds of x_j, drop the row),
- fixed variables (lvar == uvar: substitute into b and the objective),
- empty columns (variable in no constraint: pin to the bound selected by the
  gradient sign, detect unboundedness),
- bound conflicts (lvar > uvar: infeasible).

Returns ``(model, flag, Postsolve)``; ``flag=False`` means presolve fully
resolved the problem (solved / infeasible / unbounded — matching the
reference's flag semantics) and ``Postsolve.status`` says which.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import scipy.sparse as sp

from ..utils.status import Status
from .qp import INF, QuadraticModel


@dataclasses.dataclass
class Postsolve:
    """Maps a reduced-space solution back to the original variables/rows."""

    n_orig: int
    m_orig: int
    keep_cols: np.ndarray  # indices of surviving variables
    keep_rows: np.ndarray  # indices of surviving rows
    fixed_vals: np.ndarray  # [n_orig] values for eliminated variables (0 elsewhere)
    fixed_mask: np.ndarray  # [n_orig] bool
    status: Optional[Status] = None  # set when presolve resolved the problem

    def x(self, x_red: np.ndarray) -> np.ndarray:
        out = self.fixed_vals.copy()
        out[self.keep_cols] = x_red
        return out

    def y(self, y_red: np.ndarray) -> np.ndarray:
        out = np.zeros(self.m_orig)
        out[self.keep_rows] = y_red
        return out


def presolve_qp(qp: QuadraticModel, max_passes: int = 5):
    """Run presolve reductions; see module docstring.

    Returns (reduced_model, flag, Postsolve).
    """
    n0, m0 = qp.nvar, qp.ncon
    lvar = qp.lvar.copy()
    uvar = qp.uvar.copy()
    lcon = qp.lcon.copy()
    ucon = qp.ucon.copy()
    c = qp.c.copy()
    c0 = qp.c0
    A = qp.A.tocsc(copy=True)
    Q = qp.Q.tocsc(copy=True) if qp.Q is not None else None

    col_alive = np.ones(n0, dtype=bool)
    row_alive = np.ones(m0, dtype=bool)
    fixed_vals = np.zeros(n0)
    fixed_mask = np.zeros(n0, dtype=bool)

    def make_post(status=None):
        return Postsolve(
            n_orig=n0,
            m_orig=m0,
            keep_cols=np.flatnonzero(col_alive),
            keep_rows=np.flatnonzero(row_alive),
            fixed_vals=fixed_vals,
            fixed_mask=fixed_mask,
            status=status,
        )

    def fail(status):
        return qp, False, make_post(status)

    tol = 1e-12
    for _ in range(max_passes):
        changed = False

        # Bound conflicts
        bad = col_alive & (lvar > uvar + tol)
        if bad.any():
            return fail(Status.PRESOLVE_INFEASIBLE)

        # Fix variables with equal bounds: move their column into the rhs.
        fix = col_alive & (np.abs(uvar - lvar) <= tol)
        if fix.any():
            idx = np.flatnonzero(fix)
            vals = 0.5 * (lvar[idx] + uvar[idx])
            contrib = A[:, idx] @ vals
            lcon = np.where(np.isfinite(lcon), lcon - contrib, lcon)
            ucon = np.where(np.isfinite(ucon), ucon - contrib, ucon)
            c0 = c0 + float(c[idx] @ vals)
            if Q is not None:
                qcol = Q[:, idx] @ vals
                c = c + np.asarray(qcol).ravel()
                c0 = c0 - 0.5 * float(vals @ np.asarray(Q[np.ix_(idx, idx)].todense()) @ vals)
                Q = Q.tolil()
                Q[:, idx] = 0.0
                Q[idx, :] = 0.0
                Q = Q.tocsc()
            A = A.tolil()
            A[:, idx] = 0.0
            A = A.tocsc()
            fixed_vals[idx] = vals
            fixed_mask[idx] = True
            col_alive[idx] = False
            c[idx] = 0.0
            changed = True

        Ac = A.tocsr()
        row_nnz = np.diff(Ac.indptr)

        # Empty rows
        empty = row_alive & (row_nnz == 0)
        if empty.any():
            idx = np.flatnonzero(empty)
            viol = (lcon[idx] > tol * 0 + 1e-9) | (ucon[idx] < -1e-9)
            if viol.any():
                return fail(Status.PRESOLVE_INFEASIBLE)
            row_alive[idx] = False
            changed = True

        # Singleton rows -> bounds
        single = row_alive & (row_nnz == 1)
        if single.any():
            for i in np.flatnonzero(single):
                j = Ac.indices[Ac.indptr[i]]
                aij = Ac.data[Ac.indptr[i]]
                if abs(aij) < tol:
                    continue
                lo, hi = lcon[i] / aij, ucon[i] / aij
                if aij < 0:
                    lo, hi = hi, lo
                lvar[j] = max(lvar[j], lo) if np.isfinite(lo) else lvar[j]
                uvar[j] = min(uvar[j], hi) if np.isfinite(hi) else uvar[j]
                row_alive[i] = False
                changed = True
            if (lvar > uvar + 1e-9).any():
                return fail(Status.PRESOLVE_INFEASIBLE)

        # Empty columns (objective-only variables)
        col_nnz = np.diff(A.indptr)
        qdiag_zero = (
            np.ones(n0, dtype=bool) if Q is None else (abs(Q).sum(axis=0).A1 <= tol)
        )
        empty_col = col_alive & (col_nnz == 0) & qdiag_zero
        if empty_col.any():
            idx = np.flatnonzero(empty_col)
            for j in idx:
                if c[j] > tol:
                    if not np.isfinite(lvar[j]):
                        return fail(Status.PRESOLVE_UNBOUNDED)
                    v = lvar[j]
                elif c[j] < -tol:
                    if not np.isfinite(uvar[j]):
                        return fail(Status.PRESOLVE_UNBOUNDED)
                    v = uvar[j]
                else:
                    v = np.clip(0.0, lvar[j], uvar[j])
                fixed_vals[j] = v
                fixed_mask[j] = True
                c0 += c[j] * v
                c[j] = 0.0
                col_alive[j] = False
            changed = True

        if not changed:
            break

    keep_cols = np.flatnonzero(col_alive)
    keep_rows = np.flatnonzero(row_alive)

    if keep_cols.size == 0:
        # Fully solved by presolve.
        post = make_post(Status.PRESOLVE_SOLVED)
        return qp, False, post

    A_red = A[:, keep_cols][keep_rows, :]
    Q_red = None
    if Q is not None:
        Q_red = Q[:, keep_cols][keep_cols, :]
        if Q_red.nnz == 0:
            Q_red = None

    reduced = QuadraticModel(
        c=c[keep_cols],
        A=A_red.tocsr(),
        lcon=lcon[keep_rows],
        ucon=ucon[keep_rows],
        lvar=lvar[keep_cols],
        uvar=uvar[keep_cols],
        Q=Q_red.tocsr() if Q_red is not None else None,
        c0=c0,
        x0=qp.x0[keep_cols],
        y0=qp.y0[keep_rows],
        name=qp.name,
        minimize=qp.minimize,
    )
    return reduced, True, make_post()
