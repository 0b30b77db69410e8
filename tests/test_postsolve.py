"""Dual postsolve through presolve + Ruiz + standard form (VERDICT.md item 6).

The returned (y, zl, zu) must satisfy stationarity of the ORIGINAL model
    r = c + Q x + A' y - zl + zu  ~  0          (src/kernels.jl:403-430)
with zl, zu >= 0 and complementarity against the original bounds, after
every layer of transformation has been undone.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import madipm_tpu as mt
from madipm_tpu.models.presolve import presolve_qp
from madipm_tpu.models.qp import QuadraticModel, standard_form
from madipm_tpu.models.scale import scale_qp


def _check_kkt(qp, x, y, zl, zu, tol=1e-6):
    """Stationarity + sign + complementarity of the original model."""
    r = qp.c + qp.A.T @ y - zl + zu
    if qp.Q is not None:
        r = r + qp.Q @ x
    scale = max(1.0, np.abs(qp.c).max())
    assert np.max(np.abs(r)) <= tol * scale, f"stationarity {np.max(np.abs(r)):.2e}"
    assert np.all(zl >= -tol) and np.all(zu >= -tol)
    # Complementarity vs original bounds
    sl = np.where(np.isfinite(qp.lvar), x - qp.lvar, 1.0)
    su = np.where(np.isfinite(qp.uvar), qp.uvar - x, 1.0)
    assert np.max(np.abs(sl * zl)) <= 1e-4 * scale
    assert np.max(np.abs(su * zu)) <= 1e-4 * scale


def _solve_pipeline(qp0, **options):
    """presolve -> Ruiz -> standard form -> solve -> full postsolve,
    mirroring frontends.from_mps."""
    qp, flag, post = presolve_qp(qp0)
    assert flag
    qp, ruiz = scale_qp(qp)
    qp, sf_map = standard_form(qp, return_map=True)
    stats = mt.madipm(qp, print_level=mt.PrintLevel.ERROR, **options)
    assert stats.success
    x = sf_map.x(stats.solution)
    y, zl, zu = sf_map.duals(
        stats.multipliers, stats.multipliers_L, stats.multipliers_U
    )
    x, y, zl, zu = ruiz.unscale_solution(x=x, y=y, zl=zl, zu=zu)
    x = post.x(x)
    y, zl, zu = post.duals(x, y, zl, zu)
    return x, y, zl, zu


class TestStandardFormDuals:
    def test_range_bound_moved_ub(self, rng):
        # Variable with BOTH finite bounds, optimum at the (moved) upper
        # bound: zu must be reclaimed from the extra row's dual.
        qp = QuadraticModel(
            c=np.array([-1.0, 1.0]),
            A=sp.csr_matrix(np.array([[1.0, 1.0]])),
            lcon=np.array([-np.inf]),
            ucon=np.array([10.0]),
            lvar=np.array([0.0, 0.0]),
            uvar=np.array([2.0, np.inf]),  # x0 range-bounded; max pushes to ub
        )
        std, m = standard_form(qp, return_map=True)
        stats = mt.madipm(std, print_level=mt.PrintLevel.ERROR)
        assert stats.success
        x = m.x(stats.solution)
        y, zl, zu = m.duals(
            stats.multipliers, stats.multipliers_L, stats.multipliers_U
        )
        assert abs(x[0] - 2.0) < 1e-6  # at the moved upper bound
        _check_kkt(qp, x, y, zl, zu)
        assert zu[0] > 0.5  # reduced cost of the active ub (c0 = -1)

    def test_inequality_row_dual_passthrough(self, rng):
        # Active <= row: its dual must survive the slack reformulation.
        qp = QuadraticModel(
            c=np.array([-1.0, -2.0]),
            A=sp.csr_matrix(np.array([[1.0, 1.0], [1.0, 3.0]])),
            lcon=np.array([-np.inf, -np.inf]),
            ucon=np.array([4.0, 6.0]),
            lvar=np.zeros(2),
            uvar=np.full(2, np.inf),
        )
        std, m = standard_form(qp, return_map=True)
        stats = mt.madipm(std, print_level=mt.PrintLevel.ERROR)
        assert stats.success
        x = m.x(stats.solution)
        y, zl, zu = m.duals(
            stats.multipliers, stats.multipliers_L, stats.multipliers_U
        )
        _check_kkt(qp, x, y, zl, zu)


class TestPresolveDuals:
    def test_singleton_row_attribution(self):
        # Row 1 is a singleton (x1 <= 1.5) that binds at the optimum: its
        # dual must be reclaimed from x1's (tightened) bound multiplier.
        qp = QuadraticModel(
            c=np.array([1.0, -2.0]),
            A=sp.csr_matrix(np.array([[1.0, 1.0], [0.0, 2.0]])),
            lcon=np.array([3.0, -np.inf]),
            ucon=np.array([3.0, 3.0]),  # row 1: 2*x1 <= 3 -> x1 <= 1.5
            lvar=np.zeros(2),
            uvar=np.full(2, np.inf),
        )
        x, y, zl, zu = _solve_pipeline(qp)
        assert abs(x[1] - 1.5) < 1e-6  # optimum at the singleton bound
        _check_kkt(qp, x, y, zl, zu)
        assert zu[1] <= 1e-7  # moved OFF the variable, onto the row
        # stationarity: x0: 1 + y0 = 0; x1: -2 + y0 + 2 y1 = 0 -> y1 = 1.5
        assert abs(y[1] - 1.5) < 1e-5

    def test_fixed_variable_reduced_cost(self):
        qp = QuadraticModel(
            c=np.array([1.0, 2.0, 3.0]),
            A=sp.csr_matrix(np.array([[1.0, 1.0, 1.0]])),
            lcon=np.array([4.0]),
            ucon=np.array([4.0]),
            lvar=np.array([0.0, 1.0, 0.0]),
            uvar=np.array([np.inf, 1.0, np.inf]),  # x1 fixed at 1
        )
        x, y, zl, zu = _solve_pipeline(qp)
        assert abs(x[1] - 1.0) < 1e-9
        _check_kkt(qp, x, y, zl, zu)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_pipeline_kkt(self, seed):
        # Random LP with redundant structure exercising every reduction at
        # once, checked for original-model KKT conditions to 1e-6.
        rng = np.random.default_rng(seed)
        m, n = 12, 24
        A = rng.standard_normal((m, n)) * (rng.random((m, n)) < 0.5)
        A[np.abs(A).sum(1) == 0, 0] = 1.0
        xstar = rng.random(n) + 0.5
        lvar = np.zeros(n)
        uvar = np.full(n, np.inf)
        uvar[: n // 4] = xstar[: n // 4] + rng.random(n // 4)  # range bounds
        lvar[2] = uvar[2] = xstar[2]  # fixed variable
        # singleton row + empty row appended
        A_full = np.vstack([A, np.zeros(n), np.zeros(n)])
        A_full[m, 5] = 1.0
        b = A @ xstar
        lcon = np.concatenate([b, [-np.inf], [0.0]])
        ucon = np.concatenate([b, [xstar[5] + 0.3], [0.0]])
        qp = QuadraticModel(
            c=rng.random(n) + 0.1,
            A=sp.csr_matrix(A_full),
            lcon=lcon,
            ucon=ucon,
            lvar=lvar,
            uvar=uvar,
        )
        x, y, zl, zu = _solve_pipeline(qp)
        _check_kkt(qp, x, y, zl, zu)

    def test_qp_pipeline_kkt(self):
        rng = np.random.default_rng(7)
        m, n = 6, 12
        A = rng.standard_normal((m, n))
        xstar = rng.random(n) + 0.5
        P = rng.standard_normal((n, n // 2)) / np.sqrt(n)
        Q = P @ P.T + 0.5 * np.eye(n)
        lvar = np.zeros(n)
        uvar = np.full(n, np.inf)
        lvar[0] = uvar[0] = 1.0  # fixed
        qp = QuadraticModel(
            c=rng.standard_normal(n),
            A=sp.csr_matrix(A),
            lcon=A @ xstar,
            ucon=A @ xstar,
            lvar=lvar,
            uvar=uvar,
            Q=sp.csr_matrix(Q),
        )
        x, y, zl, zu = _solve_pipeline(qp)
        _check_kkt(qp, x, y, zl, zu)


class TestFromMpsDuals:
    def test_fixture_stationarity(self, rng):
        import os

        path = os.path.join(os.path.dirname(__file__), "data", "simple.mps")
        from madipm_tpu.frontends import from_mps
        from madipm_tpu.models.mps import read_mps

        stats = from_mps(path, print_level=mt.PrintLevel.ERROR)
        assert stats.success
        qp = read_mps(path)
        sign = 1.0 if qp.minimize else -1.0
        qp_min = QuadraticModel(
            c=sign * qp.c, A=qp.A, lcon=qp.lcon, ucon=qp.ucon,
            lvar=qp.lvar, uvar=qp.uvar,
            Q=None if qp.Q is None else sign * qp.Q, c0=sign * qp.c0,
        )
        _check_kkt(
            qp_min, stats.solution, stats.multipliers,
            stats.multipliers_L, stats.multipliers_U,
        )
