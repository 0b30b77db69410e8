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
    """Maps a reduced-space solution back to the original variables/rows.

    Dual mapping (:meth:`duals`) reverses each reduction's effect on the
    multipliers — the role QuadraticModels.postsolve plays for the
    reference (consumed via src/utils.jl:327-343; stationarity convention
    ``c + Qx + A'y - zl + zu = 0`` as in src/kernels.jl:403-430):

    - dropped empty rows get y = 0 (their A'-column is zero);
    - a singleton row folded into a variable bound reclaims the bound
      multiplier: if x_j ended active at the bound the ROW introduced,
      the row dual is ``y_i = -zl_j / a_ij`` (lower) / ``zu_j / a_ij``
      (upper) and the variable-bound dual is zeroed;
    - eliminated (fixed / empty) columns recover their reduced cost from
      original-data stationarity: ``r_j = c_j + (Qx)_j + (A'y)_j``,
      split as ``zl_j = max(r_j, 0)``, ``zu_j = max(-r_j, 0)`` (both
      bounds active at a fixed variable, so any split is valid; empty
      columns sit at the bound their gradient sign selected).
    """

    n_orig: int
    m_orig: int
    keep_cols: np.ndarray  # indices of surviving variables
    keep_rows: np.ndarray  # indices of surviving rows
    fixed_vals: np.ndarray  # [n_orig] values for eliminated variables (0 elsewhere)
    fixed_mask: np.ndarray  # [n_orig] bool
    status: Optional[Status] = None  # set when presolve resolved the problem
    #: singleton-row folds: (row, col, a_ij, lo, hi, tight_lo, tight_hi)
    #: where lo/hi are the bound candidates the row imposed on x_col and
    #: tight_* say whether they strictly tightened the variable's bound.
    singleton_rows: list = dataclasses.field(default_factory=list)
    #: the pre-reduction model (original data for dual stationarity).
    qp_orig: Optional[QuadraticModel] = None

    def x(self, x_red: np.ndarray) -> np.ndarray:
        out = self.fixed_vals.copy()
        out[self.keep_cols] = x_red
        return out

    def y(self, y_red: np.ndarray) -> np.ndarray:
        out = np.zeros(self.m_orig)
        out[self.keep_rows] = y_red
        return out

    def duals(self, x_full, y_red, zl_red, zu_red, tol: float = 1e-7):
        """Map reduced duals (y, zl, zu) back to the original space; see
        class docstring.  ``x_full`` is the already-postsolved primal."""
        y = self.y(np.asarray(y_red))
        zl = np.zeros(self.n_orig)
        zu = np.zeros(self.n_orig)
        zl[self.keep_cols] = np.asarray(zl_red)
        zu[self.keep_cols] = np.asarray(zu_red)

        # Singleton rows (reverse order: later folds saw earlier bounds).
        for i, j, aij, lo, hi, tight_lo, tight_hi in reversed(self.singleton_rows):
            xs = abs(x_full[j]) + 1.0
            if tight_lo and np.isfinite(lo) and abs(x_full[j] - lo) <= tol * xs and zl[j] > 0:
                y[i] = -zl[j] / aij
                zl[j] = 0.0
            elif tight_hi and np.isfinite(hi) and abs(x_full[j] - hi) <= tol * xs and zu[j] > 0:
                y[i] = zu[j] / aij
                zu[j] = 0.0

        # Eliminated columns: reduced cost from original-data stationarity.
        if self.fixed_mask.any() and self.qp_orig is not None:
            idx = np.flatnonzero(self.fixed_mask)
            qp = self.qp_orig
            r = qp.c[idx] + np.asarray(qp.A[:, idx].T @ y).ravel()
            if qp.Q is not None:
                r = r + np.asarray(qp.Q[idx, :] @ x_full).ravel()
            zl[idx] = np.maximum(r, 0.0)
            zu[idx] = np.maximum(-r, 0.0)
        return y, zl, zu


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

    singleton_rows: list = []

    def make_post(status=None):
        return Postsolve(
            n_orig=n0,
            m_orig=m0,
            keep_cols=np.flatnonzero(col_alive),
            keep_rows=np.flatnonzero(row_alive),
            fixed_vals=fixed_vals,
            fixed_mask=fixed_mask,
            status=status,
            singleton_rows=singleton_rows,
            qp_orig=qp,
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
                tight_lo = np.isfinite(lo) and lo > lvar[j]
                tight_hi = np.isfinite(hi) and hi < uvar[j]
                singleton_rows.append(
                    (int(i), int(j), float(aij), float(lo), float(hi),
                     bool(tight_lo), bool(tight_hi))
                )
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
