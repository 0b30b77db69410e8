"""Algebraic modeling front-end tests (reference analogue: the JuMP/MOI
wrapper and its conformance suite, ext/MadIPMMathOptInterfaceExt/ +
test/MOI_wrapper.jl — variables/bounds/starts, affine and quadratic
constraints/objectives, sense handling, solution/dual getters)."""

import numpy as np
import pytest
import scipy.sparse as sp

import madipm_tpu as mt
from madipm_tpu.modeling import AffExpr, QuadExpr

OPTS = dict(print_level=mt.PrintLevel.ERROR)


class TestExpressions:
    def test_affine_algebra(self):
        m = mt.Model()
        x = m.add_variables(3)
        e = 2.0 * x[0] + x[1] - 0.5 * x[2] + 4.0
        assert isinstance(e, AffExpr)
        assert e.coefs == {0: 2.0, 1: 1.0, 2: -0.5}
        assert e.const == 4.0
        e2 = 1.0 - e
        assert e2.coefs[0] == -2.0 and e2.const == -3.0
        e3 = (e + e2) / 2.0
        assert all(abs(v) < 1e-15 for v in e3.coefs.values())

    def test_quadratic_product(self):
        m = mt.Model()
        x = m.add_variables(2)
        q = (x[0] + x[1]) * (x[0] - x[1]) + 3.0 * x[0]
        assert isinstance(q, QuadExpr)
        assert q.quad[(0, 0)] == 1.0
        assert q.quad[(1, 1)] == -1.0
        assert q.quad.get((0, 1), 0.0) == 0.0
        assert q.aff.coefs[0] == 3.0

    def test_vector_matmul(self):
        m = mt.Model()
        x = m.add_variables(4)
        c = np.array([1.0, 0.0, 2.0, 0.0])
        e = c @ x
        assert isinstance(e, AffExpr)
        assert e.coefs == {0: 1.0, 2: 2.0}
        A = np.arange(8, dtype=float).reshape(2, 4)
        me = A @ x
        assert me.M.shape == (2, 4)

    def test_value_of_expressions(self):
        m = mt.Model()
        x = m.add_variables(2, lb=0.0)
        m.add_constraint(x[0] + x[1] == 1.0)
        m.minimize(x[0] + 2.0 * x[1])
        m.optimize(**OPTS)
        assert m.value(x[0]) == pytest.approx(1.0, abs=1e-6)
        assert m.value(3.0 * x[0] + x[1] - 1.0) == pytest.approx(2.0, abs=1e-5)
        assert m.value(x[0] * x[0]) == pytest.approx(1.0, abs=1e-5)


class TestModelLP:
    def test_simple_lp(self):
        # min x1 + x2, x1 + x2 = 1, x >= 0  (the reference's simple_lp fixture,
        # test/runtests.jl:29-60)
        m = mt.Model("simple")
        x = m.add_variables(2, lb=0.0, name="x")
        con = m.add_constraint(x[0] + x[1] == 1.0)
        m.minimize(x[0] + x[1])
        st = m.optimize(**OPTS)
        assert st.success
        assert m.objective_value() == pytest.approx(1.0, abs=1e-7)
        # shadow price of the equality row: d(obj)/d(rhs) = 1
        assert m.dual(con) == pytest.approx(1.0, abs=1e-6)
        assert m.solve_time() >= 0.0
        assert m.termination_status() == mt.Status.SOLVE_SUCCEEDED

    def test_vectorized_lp_matches_scipy(self, rng):
        from scipy.optimize import linprog

        n, meq = 20, 6
        A = rng.standard_normal((meq, n))
        xstar = rng.random(n) + 0.5
        b = A @ xstar
        c = rng.random(n) + 0.1

        m = mt.Model()
        x = m.add_variables(n, lb=0.0)
        m.add_constraint(A @ x == b)
        m.minimize(c @ x)
        st = m.optimize(**OPTS)
        ref = linprog(c, A_eq=A, b_eq=b, bounds=[(0, None)] * n, method="highs")
        assert st.success and ref.status == 0
        assert m.objective_value() == pytest.approx(ref.fun, rel=1e-6)
        # vectorized accessors
        assert m.value(x).shape == (n,)
        assert np.allclose(m.value(A @ x), b, atol=1e-6)
        assert m.reduced_costs().shape == (n,)

    def test_maximize(self):
        m = mt.Model()
        x = m.add_variables(2, lb=0.0, ub=2.0)
        m.add_constraint(x[0] + x[1] <= 3.0)
        m.maximize(x[0] + 2.0 * x[1])
        st = m.optimize(**OPTS)
        assert st.success
        assert m.objective_value() == pytest.approx(5.0, abs=1e-6)
        assert m.value(x[1]) == pytest.approx(2.0, abs=1e-6)

    def test_inequalities_and_ranged(self):
        m = mt.Model()
        x = m.add_variables(2, lb=0.0)
        m.add_constraint(x[0] + x[1] >= 1.0)
        m.add_constraint(2.0 * x[0] + x[1] <= 4.0)
        m.minimize(x[0] + 3.0 * x[1])
        st = m.optimize(**OPTS)
        assert st.success
        assert m.objective_value() == pytest.approx(1.0, abs=1e-6)

    def test_sparse_constraint_matrix(self, rng):
        n = 30
        A = sp.random(8, n, density=0.3, random_state=7, format="csr")
        A = A + sp.csr_matrix((np.ones(8), (np.arange(8), np.arange(8))), shape=(8, n))
        xstar = rng.random(n) + 0.5
        b = A @ xstar
        from madipm_tpu.modeling import matmul

        m = mt.Model()
        x = m.add_variables(n, lb=0.0)
        m.add_constraint(matmul(A, x) == b)  # scipy.sparse needs the helper
        m.minimize(np.ones(n) @ x)
        assert m.optimize(**OPTS).success

    def test_scalar_constraints_and_var_block_ops(self):
        m = mt.Model()
        x = m.add_variables(3, lb=0.0)
        m.add_constraint(x.sum() == 2.0)
        m.add_constraint(x >= 0.1)  # elementwise vector constraint
        m.minimize(x[0] + 2.0 * x[1] + 3.0 * x[2])
        st = m.optimize(**OPTS)
        assert st.success
        v = m.value(x)
        assert np.all(v >= 0.1 - 1e-7)
        assert m.objective_value() == pytest.approx(1.8 + 0.1 * (2 + 3) - 0.2 + 0.2, abs=1e-5) or True
        # exact: x = [1.8, 0.1, 0.1] -> 1.8 + 0.2 + 0.3 = 2.3
        assert m.objective_value() == pytest.approx(2.3, abs=1e-5)

    def test_warm_start_and_bounds_setters(self):
        m = mt.Model()
        v = m.add_variable(lb=0.0, name="v")
        w = m.add_variable(name="w")
        m.set_lower_bound(w, 0.0)
        m.set_upper_bound(w, 1.0)
        m.set_start_value(v, 0.4)
        m.add_constraint(v + w == 1.0)
        m.minimize(v + 2.0 * w)
        st = m.optimize(**OPTS)
        assert st.success
        assert m.value(v) == pytest.approx(1.0, abs=1e-6)


class TestModelQP:
    def test_quadratic_objective(self):
        # min x^2 + y^2  s.t. x + y = 1 -> x = y = 1/2, obj = 1/2
        m = mt.Model()
        x = m.add_variables(2, lb=-10.0, ub=10.0)
        m.add_constraint(x[0] + x[1] == 1.0)
        m.minimize(x[0] * x[0] + x[1] * x[1])
        st = m.optimize(**OPTS)
        assert st.success
        assert m.objective_value() == pytest.approx(0.5, abs=1e-6)
        assert m.value(x[0]) == pytest.approx(0.5, abs=1e-5)

    def test_cross_terms_match_scipy(self):
        # min 1/2 x'Px + q'x with P = [[2,0.5],[0.5,1]]: modeled as polynomial
        P = np.array([[2.0, 0.5], [0.5, 1.0]])
        q = np.array([-1.0, -2.0])
        m = mt.Model()
        x = m.add_variables(2, lb=0.0, ub=10.0)
        m.minimize(
            0.5 * (P[0, 0] * x[0] * x[0] + P[1, 1] * x[1] * x[1])
            + P[0, 1] * x[0] * x[1]
            + q @ x
        )
        st = m.optimize(**OPTS)
        assert st.success
        # unconstrained optimum solve(P, -q) = [0, 2]: x0 sits ON its lower
        # bound with zero reduced cost (degenerate), so the IPM leaves it at
        # O(sqrt(mu)) — compare at the matching tolerance
        xref = np.linalg.solve(P, -q)
        assert np.allclose(m.value(x), xref, atol=2e-4)
        fref = 0.5 * xref @ P @ xref + q @ xref
        assert m.objective_value() == pytest.approx(fref, abs=1e-6)


class TestErrors:
    def test_requires_solve(self):
        m = mt.Model()
        m.add_variables(1)
        with pytest.raises(RuntimeError):
            m.objective_value()

    def test_bad_constraint_type(self):
        m = mt.Model()
        m.add_variables(1)
        with pytest.raises(TypeError):
            m.add_constraint("x <= 1")

    def test_infeasible_status(self):
        m = mt.Model()
        x = m.add_variables(2, lb=0.0)
        m.add_constraint(x[0] + x[1] == -1.0)
        m.minimize(x.sum())
        st = m.optimize(**OPTS)
        assert not st.success
