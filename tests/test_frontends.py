"""Front-end and checkpoint tests (reference analogue: the MOI wrapper
conformance suite, test/MOI_wrapper.jl, exercised here through the
scipy/qpsolvers-style entry points)."""

import os

import numpy as np
import pytest

import madipm_tpu as mt
from madipm_tpu.frontends import from_mps, solve_linprog, solve_qp
from madipm_tpu.utils.checkpoint import load_state, resume, save_state

DATA = os.path.join(os.path.dirname(__file__), "data")
OPTS = dict(print_level=mt.PrintLevel.ERROR)


class TestLinprogFrontend:
    def test_matches_scipy(self, rng):
        from scipy.optimize import linprog

        c = rng.random(12)
        A_ub = rng.standard_normal((5, 12))
        b_ub = A_ub @ (rng.random(12) + 0.2) + 0.5
        A_eq = rng.standard_normal((2, 12))
        b_eq = A_eq @ (rng.random(12) + 0.2)
        bounds = [(0, None)] * 12
        ours = solve_linprog(c, A_ub, b_ub, A_eq, b_eq, bounds, **OPTS)
        ref = linprog(c, A_ub=A_ub, b_ub=b_ub, A_eq=A_eq, b_eq=b_eq, bounds=bounds, method="highs")
        assert ours.success == (ref.status == 0)
        if ours.success:
            assert ours.fun == pytest.approx(ref.fun, abs=1e-6)
            assert np.all(ours.slack >= -1e-7)
            assert np.allclose(ours.con, 0.0, atol=1e-7)

    def test_infeasible_status_code(self):
        res = solve_linprog(
            [1.0, 1.0], A_eq=[[1.0, 1.0]], b_eq=[-1.0], bounds=[(0, None)] * 2, **OPTS
        )
        assert not res.success
        assert res.x is None

    def test_no_constraints(self):
        res = solve_linprog([1.0], bounds=[(2.0, 5.0)], **OPTS)
        assert res.success
        assert res.fun == pytest.approx(2.0, abs=1e-6)


class TestQPFrontend:
    def test_qpsolvers_convention(self):
        # min 1/2 x'Ix - [1,1]'x s.t. x1+x2 <= 1 -> x = (0.5, 0.5)
        stats = solve_qp(
            P=np.eye(2), q=[-1.0, -1.0], G=[[1.0, 1.0]], h=[1.0], **OPTS
        )
        assert stats.success
        assert np.allclose(stats.solution, [0.5, 0.5], atol=1e-6)


class TestFromMPS:
    def test_full_pipeline(self):
        direct = mt.madipm(
            __import__("madipm_tpu.models.mps", fromlist=["read_mps"]).read_mps(
                os.path.join(DATA, "simple.mps")
            ),
            **OPTS,
        )
        piped = from_mps(os.path.join(DATA, "simple.mps"), **OPTS)
        assert piped.success
        assert piped.objective == pytest.approx(direct.objective, abs=1e-6)
        # Solution mapped back to original variables
        assert piped.solution.shape == (3,)

    def test_qps_pipeline(self):
        piped = from_mps(os.path.join(DATA, "simple_qp.qps"), **OPTS)
        assert piped.success
        assert piped.objective == pytest.approx(-6.25, abs=1e-6)


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path, rng):
        from tests.conftest import random_lp

        c, A, b, lvar, uvar = random_lp(rng, 30, 10, seed=77)
        qp = mt.from_dense(c=c, A=A, lcon=b, ucon=b, lvar=lvar, uvar=uvar)
        solver = mt.MPCSolver(qp, **OPTS)
        stats = solver.solve()
        assert stats.success

        # Save the terminal state, reload, resume: should terminate in O(1)
        # iterations at the same objective.
        import jax
        from functools import partial
        from madipm_tpu.solver import driver

        prob_s, scale, st = jax.jit(partial(driver.initialize, solver.cfg))(solver.prob)
        path = str(tmp_path / "ckpt.npz")
        save_state(path, st)
        st2 = load_state(path)
        for f in st._fields:
            assert np.allclose(
                np.asarray(getattr(st, f)), np.asarray(getattr(st2, f)), equal_nan=True
            ), f

    def test_resume_from_checkpoint(self, tmp_path, rng):
        from tests.conftest import random_lp

        c, A, b, lvar, uvar = random_lp(rng, 30, 10, seed=78)
        qp = mt.from_dense(c=c, A=A, lcon=b, ucon=b, lvar=lvar, uvar=uvar)
        solver = mt.MPCSolver(qp, **OPTS)
        ref_stats = solver.solve()
        assert ref_stats.success

        # Run a few iterations manually, checkpoint, resume to completion.
        import jax
        from functools import partial
        from madipm_tpu.solver import driver

        prob_s, scale, st = jax.jit(partial(driver.initialize, solver.cfg))(solver.prob)
        step = jax.jit(partial(driver.iteration, solver.cfg))
        for _ in range(3):
            st = step(prob_s, st)
        path = str(tmp_path / "mid.npz")
        save_state(path, st)

        st_loaded = load_state(path)
        stats = resume(solver, st_loaded)
        assert stats.success
        assert stats.objective == pytest.approx(ref_stats.objective, abs=1e-7)
        assert stats.iter >= 3  # counter carried through the checkpoint

    def test_resume_detects_infeasibility(self, tmp_path):
        # An INFEASIBLE LP checkpointed mid-grind and resumed must still
        # classify INFEASIBLE_PROBLEM_DETECTED: resume() re-evaluates the
        # least-squares certificate every CERT_PERIOD iterations exactly
        # like solve_device (round-2 fix: the old resume loop never
        # refreshed ls_cert, so the stall classifier's gate stayed shut and
        # the solve ground to max_iter).
        import jax
        from functools import partial
        from madipm_tpu.solver import driver

        qp = mt.from_dense(
            c=[1.0, 1.0], A=[[1.0, 0.0], [1.0, 0.0]],
            lcon=[1.0, 3.0], ucon=[1.0, 3.0],  # x0 = 1 AND x0 = 3
            lvar=[0.0, 0.0], uvar=[np.inf, np.inf],
        )
        solver = mt.MPCSolver(qp, max_iter=500, **OPTS)
        prob_s, scale, st = jax.jit(partial(driver.initialize, solver.cfg))(solver.prob)
        step = jax.jit(partial(driver.iteration, solver.cfg))
        for _ in range(5):
            st = step(prob_s, st)
        path = str(tmp_path / "infeas.npz")
        save_state(path, st)

        stats = resume(solver, load_state(path))
        assert stats.status == mt.Status.INFEASIBLE_PROBLEM_DETECTED
        assert stats.iter < 400  # classified, not ground to max_iter
