"""Tests of the problem layer: MPS reader, Ruiz scaling, presolve,
standard-form / slack-form transformations.

Reference analogues: import_mps (scripts/common.jl:21-36), scale_qp
(scripts/common.jl:57-100), presolve_qp + standard_form_qp tests
(test/runtests.jl:154-164).
"""

import gzip
import os

import numpy as np
import pytest

import madipm_tpu as mt
from madipm_tpu.models.mps import parse_mps, read_mps
from madipm_tpu.models.presolve import presolve_qp
from madipm_tpu.models.scale import ruiz_scale_dense, scale_qp

DATA = os.path.join(os.path.dirname(__file__), "data")


class TestMPSReader:
    def test_parse_simple(self):
        qp = read_mps(os.path.join(DATA, "simple.mps"))
        assert qp.name == "SIMPLE"
        assert qp.nvar == 3 and qp.ncon == 4
        x_names_obj = qp.c
        assert np.allclose(x_names_obj, [1.0, 2.0, 3.0])
        assert qp.c0 == -1.0  # objective RHS enters negated
        # Row types
        assert qp.lcon[0] == qp.ucon[0] == 10.0  # E
        assert qp.ucon[1] == 15.0 and qp.lcon[1] == -np.inf  # L
        assert qp.lcon[2] == 5.0 and qp.ucon[2] == np.inf  # G
        # Ranged L row: [ucon - |R|, ucon]
        assert qp.ucon[3] == 8.0 and qp.lcon[3] == 2.0
        # Bounds
        assert qp.lvar[0] == 0.0 and qp.uvar[0] == 6.0
        assert qp.lvar[1] == -2.0 and qp.uvar[1] == np.inf
        assert qp.lvar[2] == -np.inf and qp.uvar[2] == np.inf
        # Matrix entries
        A = qp.A.toarray()
        assert np.allclose(A[0], [1, 1, 0])
        assert np.allclose(A[3], [1, -1, 1])

    def test_gzip_roundtrip(self, tmp_path):
        src = open(os.path.join(DATA, "simple.mps"), "rb").read()
        gz = tmp_path / "simple.mps.gz"
        gz.write_bytes(gzip.compress(src))
        qp = read_mps(str(gz))
        assert qp.nvar == 3 and qp.ncon == 4

    def test_solve_parsed_lp(self):
        qp = read_mps(os.path.join(DATA, "simple.mps"))
        stats = mt.madipm(qp, print_level=mt.PrintLevel.ERROR)
        assert stats.success
        from scipy.optimize import linprog

        bounds = [(0, 6), (-2, None), (None, None)]
        res = linprog(
            qp.c,
            A_ub=np.vstack([qp.A.toarray()[1], -qp.A.toarray()[2],
                            qp.A.toarray()[3], -qp.A.toarray()[3]]),
            b_ub=[15.0, -5.0, 8.0, -2.0],
            A_eq=qp.A.toarray()[:1],
            b_eq=[10.0],
            bounds=bounds,
            method="highs",
        )
        assert stats.objective == pytest.approx(res.fun + qp.c0, abs=1e-6)

    def test_parse_qps(self):
        qp = read_mps(os.path.join(DATA, "simple_qp.qps"))
        assert qp.is_qp
        Q = qp.Q.toarray()
        assert np.allclose(Q, [[2.0, -1.0], [-1.0, 4.0]])  # symmetrized
        stats = mt.madipm(qp, print_level=mt.PrintLevel.ERROR)
        assert stats.success
        # Optimum of min -2x-6y + 1/2(2x^2-2xy+4y^2) s.t. x+y<=2, x,y>=0
        # (verified with scipy.optimize.minimize): x=(0.75, 1.25), obj=-6.25.
        assert np.allclose(stats.solution, [0.75, 1.25], atol=1e-5)
        assert stats.objective == pytest.approx(-6.25, abs=1e-6)

    def test_integer_relaxation(self):
        text = """NAME T
ROWS
 N obj
 G c1
COLUMNS
    MARKER    'MARKER'    'INTORG'
    x  obj  1.0  c1  1.0
    MARKER    'MARKER'    'INTEND'
    y  obj  1.0  c1  1.0
RHS
    rhs c1 1.5
ENDATA
"""
        qp = parse_mps(text.splitlines())
        assert qp._integer_cols == [0]
        stats = mt.madipm(qp, print_level=mt.PrintLevel.ERROR)
        assert stats.success
        assert stats.objective == pytest.approx(1.5, abs=1e-6)  # LP relaxation


class TestRuiz:
    def test_equilibrates(self, rng):
        A = rng.standard_normal((20, 30)) * np.exp(rng.uniform(-5, 5, (20, 1)))
        import scipy.sparse as sp

        qp = mt.from_dense(
            c=rng.random(30), A=A, lcon=np.zeros(20), ucon=np.zeros(20),
            lvar=np.zeros(30), uvar=np.full(30, np.inf),
        )
        scaled, sc = scale_qp(qp)
        As = abs(scaled.A.toarray())
        assert As.max(axis=1).max() < 3.0
        assert As.max(axis=1).min() > 0.3
        # Reconstruction: A = Dr * A_s * Dc
        rec = sc.Dr[:, None] * scaled.A.toarray() * sc.Dc[None, :]
        assert np.allclose(rec, A)

    def test_solution_invariance(self, rng):
        from tests.conftest import random_lp, scipy_linprog

        c, A, b, lvar, uvar = random_lp(rng, 25, 8, seed=31)
        A = A * np.exp(rng.uniform(-3, 3, (8, 1)))  # badly scaled rows
        b = A @ (rng.random(25) + 0.5)
        qp = mt.from_dense(c=c, A=A, lcon=b, ucon=b, lvar=lvar, uvar=uvar)
        scaled, sc = scale_qp(qp)
        stats = mt.madipm(scaled, print_level=mt.PrintLevel.ERROR)
        assert stats.success
        x = sc.unscale_solution(x=stats.solution)
        ref = scipy_linprog(c, A, b, lvar, uvar)
        assert c @ x == pytest.approx(ref.fun, abs=1e-5)
        assert np.allclose(A @ x, b, atol=1e-6)

    def test_dense_jax_ruiz(self, rng):
        import jax.numpy as jnp

        A = jnp.asarray(rng.standard_normal((16, 24)) * 100.0)
        B, dr, dc = ruiz_scale_dense(A)
        assert float(jnp.max(jnp.abs(B))) < 3.0
        rec = dr[:, None] * B * dc[None, :]
        assert np.allclose(np.asarray(rec), np.asarray(A), rtol=1e-10)


class TestPresolve:
    def test_flag_true_simple(self):
        # The reference's QuadraticModels presolve leaves this 2-var LP
        # intact (flag=true); the round-3 reduction set here is stronger —
        # duplicate-column merge + singleton row solve it outright — so the
        # contract to pin is correctness of the fully-presolved answer.
        from tests.test_solver import simple_lp

        qp = simple_lp()
        red, flag, post = presolve_qp(qp)
        if flag:
            return  # weaker reduction path: nothing more to check
        assert post.status == mt.Status.PRESOLVE_SOLVED
        x = post.x(np.zeros(0))
        assert np.allclose(qp.A @ x, [1.0]) and x.min() >= -1e-12
        assert qp.obj(x) == pytest.approx(1.0, abs=1e-9)
        y, zl, zu = post.duals(x, np.zeros(0), np.zeros(0), np.zeros(0))
        assert np.allclose(qp.c + qp.A.T @ y - zl + zu, 0.0, atol=1e-9)

    def test_fixed_variable_elimination(self):
        qp = mt.from_dense(
            c=[1.0, 2.0, 3.0],
            A=[[1.0, 1.0, 1.0], [0.0, 1.0, -1.0]],
            lcon=[4.0, 0.0],
            ucon=[4.0, 1.0],
            lvar=[2.0, 0.0, 0.0],
            uvar=[2.0, np.inf, np.inf],
        )
        red, flag, post = presolve_qp(qp)
        assert flag
        assert red.nvar == 2  # x1 eliminated
        stats = mt.madipm(red, print_level=mt.PrintLevel.ERROR)
        assert stats.success
        x_full = post.x(stats.solution)
        assert x_full[0] == 2.0
        assert x_full[1] + x_full[2] == pytest.approx(2.0, abs=1e-6)

    def test_cascading_full_solve(self):
        # Fixed variable triggers singleton cascades that solve the whole
        # problem: flag=False + PRESOLVE_SOLVED (reference flag semantics,
        # src/utils.jl:338-342).
        qp = mt.from_dense(
            c=[1.0, 2.0, 3.0],
            A=[[1.0, 1.0, 0.0], [0.0, 1.0, 1.0]],
            lcon=[4.0, 5.0],
            ucon=[4.0, 5.0],
            lvar=[2.0, 0.0, 0.0],
            uvar=[2.0, np.inf, np.inf],
        )
        red, flag, post = presolve_qp(qp)
        assert not flag
        assert post.status == mt.Status.PRESOLVE_SOLVED
        x_full = post.x(np.zeros(0)) if post.keep_cols.size == 0 else post.fixed_vals
        assert np.allclose(x_full, [2.0, 2.0, 3.0])
        assert np.allclose(qp.A @ x_full, [4.0, 5.0])

    def test_singleton_row(self):
        qp = mt.from_dense(
            c=[1.0, 1.0],
            A=[[2.0, 0.0], [1.0, 1.0]],
            lcon=[-np.inf, 3.0],
            ucon=[4.0, 3.0],
            lvar=[0.0, 0.0],
            uvar=[np.inf, np.inf],
        )
        red, flag, post = presolve_qp(qp)
        # The singleton row is folded into x0 <= 2 ...
        assert len(post.singleton_rows) == 1
        i, j, aij, lo, hi, tight_lo, tight_hi = post.singleton_rows[0]
        assert (i, j) == (0, 0) and hi == 2.0 and tight_hi
        # ... after which the round-3 reduction set (implied-free singleton
        # column + empty column) solves the model outright.
        assert not flag
        assert post.status == mt.Status.PRESOLVE_SOLVED
        x = post.x(np.zeros(0))
        assert np.allclose(x, [0.0, 3.0])
        y, zl, zu = post.duals(x, np.zeros(0), np.zeros(0), np.zeros(0))
        assert np.allclose(qp.c + qp.A.T @ y - zl + zu, 0.0, atol=1e-9)

    def test_infeasible_bounds(self):
        qp = mt.from_dense(
            c=[1.0], A=[[1.0]], lcon=[0.0], ucon=[1.0], lvar=[3.0], uvar=[2.0]
        )
        red, flag, post = presolve_qp(qp)
        assert not flag
        assert post.status == mt.Status.PRESOLVE_INFEASIBLE

    def test_unbounded_empty_column(self):
        qp = mt.from_dense(
            c=[0.0, -1.0], A=[[1.0, 0.0]], lcon=[1.0], ucon=[1.0],
            lvar=[0.0, 0.0], uvar=[np.inf, np.inf],
        )
        red, flag, post = presolve_qp(qp)
        assert not flag
        assert post.status == mt.Status.PRESOLVE_UNBOUNDED


class TestGenerators:
    """Structured suite generators (models/generators.py): the Netlib /
    MIPLIB-relaxation / Maros-Meszaros structural families the reference
    benchmarks on (scripts/benchmarks_cpu.jl:61-70), reproduced since the
    archives are not redistributable."""

    def test_transport_solves_and_matches_highs(self):
        from scipy.optimize import linprog

        from madipm_tpu.models.generators import transportation_lp

        mdl = transportation_lp(6, 9, seed=1)
        st = mt.madipm(mdl, print_level=mt.PrintLevel.ERROR)
        assert st.success
        ref = linprog(mdl.c, A_eq=mdl.A.toarray(), b_eq=mdl.lcon,
                      bounds=[(0, None)] * mdl.nvar, method="highs")
        assert st.objective == pytest.approx(ref.fun, rel=1e-7)

    def test_netflow_solves_and_matches_highs(self):
        from scipy.optimize import linprog

        from madipm_tpu.models.generators import min_cost_flow_lp

        mdl = min_cost_flow_lp(40, 4, seed=2)
        st = mt.madipm(mdl, print_level=mt.PrintLevel.ERROR)
        assert st.success
        ref = linprog(mdl.c, A_eq=mdl.A.toarray(), b_eq=mdl.lcon,
                      bounds=list(zip(mdl.lvar, mdl.uvar)), method="highs")
        assert ref.status == 0
        assert st.objective == pytest.approx(ref.fun, rel=1e-6)

    def test_staircase_solves_and_matches_highs(self):
        from scipy.optimize import linprog

        from madipm_tpu.models.generators import staircase_lp

        mdl = staircase_lp(6, 6, 3, seed=3)
        st = mt.madipm(mdl, print_level=mt.PrintLevel.ERROR)
        assert st.success
        bounds = [
            (l if np.isfinite(l) else None, u if np.isfinite(u) else None)
            for l, u in zip(mdl.lvar, mdl.uvar)
        ]
        ref = linprog(mdl.c, A_eq=mdl.A.toarray(), b_eq=mdl.lcon,
                      bounds=bounds, method="highs")
        assert ref.status == 0
        assert st.objective == pytest.approx(ref.fun, rel=1e-6)

    def test_portfolio_qp_kkt(self):
        from madipm_tpu.models.generators import portfolio_qp

        mdl = portfolio_qp(30, 6, seed=4)
        st = mt.madipm(mdl, print_level=mt.PrintLevel.ERROR)
        assert st.success
        x = st.solution
        assert np.isclose(x.sum(), 1.0, atol=1e-7)
        assert np.all(x >= -1e-8)
        # stationarity: c + Qx + A'y - zl + zu = 0 on the interior part
        g = mdl.c + mdl.Q @ x + mdl.A.T @ st.multipliers
        interior = (x > 1e-5) & (x < np.asarray(mdl.uvar) - 1e-5)
        assert np.max(np.abs(g[interior])) < 1e-6

    def test_structured_suite_batched(self):
        from madipm_tpu.models.generators import structured_suite
        from madipm_tpu.parallel.batch import madipm_batch

        models = [m for m in structured_suite(1) if not m.is_qp][:4]
        res = madipm_batch(models, print_level=mt.PrintLevel.ERROR)
        assert all(s.success for s in res)
