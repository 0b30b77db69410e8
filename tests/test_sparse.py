"""Sparse device-path tests (reference analogue: coo_to_csr +
build_normal_system + assemble_normal_system! unit behavior,
src/utils.jl:158-308, and the CUSPARSE SpMV operator,
ext/MadIPMCUDAExt/cuda_wrapper.jl:43-94 — validated here against scipy and
against the dense device path)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import madipm_tpu as mt
from madipm_tpu.models.qp import slack_form
from madipm_tpu.models.sparse import SparseDeviceQP, pad_sparse_to_device

from conftest import random_lp, scipy_linprog

OPTS = dict(print_level=mt.PrintLevel.ERROR)


def make_sparse_lp(rng, n, m, density=0.05):
    A = sp.random(m, n, density=density, random_state=rng, format="csr")
    A = A + sp.diags(np.ones(m), 0, shape=(m, n), format="csr")  # full row rank-ish
    xstar = rng.random(n) + 0.5
    b = A @ xstar
    c = rng.random(n) + 0.1
    return mt.QuadraticModel(
        c=c, A=A, lcon=b, ucon=b, lvar=np.zeros(n), uvar=np.full(n, np.inf)
    )


class TestSparseOperators:
    def setup_method(self):
        rng = np.random.default_rng(3)
        self.qp = make_sparse_lp(rng, n=300, m=90, density=0.04)
        self.prob = pad_sparse_to_device(slack_form(self.qp))
        self.A = self.qp.A

    def test_matvec_matches_scipy(self):
        n_pad = self.prob.n
        x = np.zeros(n_pad)
        x[: self.A.shape[1]] = np.random.default_rng(0).standard_normal(self.A.shape[1])
        got = np.asarray(self.prob.matvec(jnp.asarray(x)))
        want = self.A @ x[: self.A.shape[1]]
        assert np.allclose(got[: self.A.shape[0]], want, atol=1e-12)
        assert np.allclose(got[self.A.shape[0]:], 0.0)

    def test_rmatvec_matches_scipy(self):
        m_pad = self.prob.m
        y = np.zeros(m_pad)
        y[: self.A.shape[0]] = np.random.default_rng(1).standard_normal(self.A.shape[0])
        got = np.asarray(self.prob.rmatvec(jnp.asarray(y)))
        want = self.A.T @ y[: self.A.shape[0]]
        assert np.allclose(got[: self.A.shape[1]], want, atol=1e-12)

    def test_row_inf_norm(self):
        got = np.asarray(self.prob.row_inf_norm())
        want = np.abs(self.A).max(axis=1).toarray().ravel()
        assert np.allclose(got[: self.A.shape[0]], want)

    def test_assemble_normal_matches_dense(self):
        rng = np.random.default_rng(2)
        dinv = rng.random(self.prob.n)
        S = np.asarray(self.prob.assemble_normal_matrix(jnp.asarray(dinv), jnp.float64))
        m = self.A.shape[0]
        Ad = self.A.toarray()
        want = Ad @ np.diag(dinv[: self.A.shape[1]]) @ Ad.T
        assert np.allclose(S[:m, :m], want, atol=1e-10)
        # padded rows/cols stay zero (pinning happens in the KKT layer)
        assert np.allclose(S[m:, :], 0.0) and np.allclose(S[:, m:], 0.0)

    def test_scale_rows_consistent(self):
        rng = np.random.default_rng(4)
        cs = rng.random(self.prob.m) + 0.5
        scaled = self.prob.scale_rows(jnp.asarray(cs))
        x = rng.standard_normal(self.prob.n)
        got = np.asarray(scaled.matvec(jnp.asarray(x)))
        want = np.asarray(self.prob.matvec(jnp.asarray(x))) * cs
        assert np.allclose(got, want, atol=1e-12)
        gr = np.asarray(scaled.rmatvec(jnp.asarray(np.ones(self.prob.m))))
        wr = np.asarray(self.prob.rmatvec(jnp.asarray(cs)))
        assert np.allclose(gr, wr, atol=1e-12)

    def test_dense_A_raises(self):
        with pytest.raises(NotImplementedError):
            _ = self.prob.dense_A


class TestSparseSolve:
    def test_matches_dense_path_and_highs(self, rng):
        qp = make_sparse_lp(rng, n=400, m=120, density=0.03)
        st_sparse = mt.madipm(qp, sparse=True, **OPTS)
        st_dense = mt.madipm(qp, sparse=False, **OPTS)
        assert st_sparse.success and st_dense.success
        assert st_sparse.objective == pytest.approx(st_dense.objective, rel=1e-7)
        from scipy.optimize import linprog

        bounds = [(0, None)] * qp.nvar
        ref = linprog(qp.c, A_eq=qp.A.toarray(), b_eq=qp.lcon, bounds=bounds, method="highs")
        assert ref.status == 0
        assert st_sparse.objective == pytest.approx(ref.fun, rel=1e-6)
        assert st_sparse.primal_feas < 1e-7

    def test_with_upper_bounds_and_inequalities(self, rng):
        c, A, b, lvar, uvar = random_lp(rng, n=150, m=40, density=0.1)
        A = sp.csr_matrix(A)
        # make some rows inequalities
        lcon = b.copy()
        ucon = b.copy()
        ucon[:10] = b[:10] + 1.0
        qp = mt.QuadraticModel(c=c, A=A, lcon=lcon, ucon=ucon, lvar=lvar, uvar=uvar)
        st = mt.madipm(qp, sparse=True, **OPTS)
        ref = mt.madipm(qp, sparse=False, **OPTS)
        assert st.success and ref.success
        assert st.objective == pytest.approx(ref.objective, rel=1e-6)

    def test_sparse_qp_auto_condensed(self, rng):
        # sparse QPs auto-route through the K1 CONDENSED system
        qp = mt.from_dense(
            c=[0.0, 0.0], A=[[1.0, 1.0]], lcon=[1.0], ucon=[1.0],
            lvar=[-1.0, -1.0], uvar=[2.0, 2.0], Q=[[2.0, 0.0], [0.0, 2.0]],
        )
        st = mt.madipm(qp, sparse=True, **OPTS)
        assert st.success
        assert np.allclose(st.solution, [0.5, 0.5], atol=1e-6)

    def test_large_n_smoke(self, rng):
        # tall sparse LP: n >> m, the regime the sparse path exists for
        qp = make_sparse_lp(rng, n=3000, m=128, density=0.01)
        st = mt.madipm(qp, sparse=True, **OPTS)
        assert st.success
        from scipy.optimize import linprog

        ref = linprog(
            qp.c, A_eq=qp.A.toarray(), b_eq=qp.lcon,
            bounds=[(0, None)] * qp.nvar, method="highs",
        )
        assert st.objective == pytest.approx(ref.fun, rel=1e-6)

    def test_empty_rows_pinned(self):
        # a structurally empty row must not break the sparse assembly
        A = sp.csr_matrix(np.array([[1.0, 1.0, 0.0], [0.0, 0.0, 0.0]]))
        qp = mt.QuadraticModel(
            c=[1.0, 1.0, 1.0], A=A, lcon=[1.0, 0.0], ucon=[1.0, 0.0],
            lvar=np.zeros(3), uvar=np.full(3, np.inf),
        )
        st = mt.madipm(qp, sparse=True, **OPTS)
        assert st.success
        assert st.objective == pytest.approx(1.0, abs=1e-7)


class TestNativePattern:
    def test_native_matches_python(self):
        from madipm_tpu.models import native as native_mod
        from madipm_tpu.models.sparse import (
            NormalPattern, _to_ell, build_normal_pattern,
        )

        if not native_mod.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(9)
        A = sp.random(37, 120, density=0.08, random_state=13, format="csr")
        A = A + sp.diags(np.ones(37), 0, shape=(37, 120), format="csr")
        A.sort_indices()
        mp = 64
        val, idx, ell_pos = _to_ell(A, mp, 128)
        py = build_normal_pattern(A, ell_pos, mp)
        pa, pb, pc, sid, slo, sup = native_mod.native_normal_pattern(
            A.indptr, A.indices, A.shape[0], A.shape[1], val.shape[1], mp
        )
        nat = NormalPattern(pa, pb, pc, sid, slo, sup)
        # identical unique destinations
        assert np.array_equal(py.s_low, nat.s_low)
        assert np.array_equal(py.s_up, nat.s_up)
        assert py.pair_a.size == nat.pair_a.size
        # same assembled matrix for a random diagonal
        dinv = np.random.default_rng(1).random(128)
        flat = val.reshape(-1)

        def assemble(p):
            contrib = flat[p.pair_a] * flat[p.pair_b] * dinv[p.pair_col]
            snz = np.zeros(p.s_low.size)
            np.add.at(snz, p.seg_id, contrib)
            S = np.zeros(mp * mp)
            S[p.s_low] = snz
            S[p.s_up] = snz
            return S.reshape(mp, mp)

        assert np.allclose(assemble(py), assemble(nat), atol=1e-12)


class TestBatchedSparse:
    def test_batched_matches_serial(self):
        from madipm_tpu.parallel.batch import madipm_batch

        rng = np.random.default_rng(33)
        # deliberately different shapes AND sparsity patterns per instance
        models = [
            make_sparse_lp(rng, n=200 + 40 * i, m=50 + 10 * i, density=0.03 + 0.01 * i)
            for i in range(4)
        ]
        batched = madipm_batch(models, sparse=True, **OPTS)
        for mdl, bs in zip(models, batched):
            ss = mt.madipm(mdl, sparse=True, **OPTS)
            assert bs.success and ss.success
            assert bs.objective == pytest.approx(ss.objective, rel=1e-7), mdl.name

    def test_batched_sparse_sharded(self):
        import jax
        from madipm_tpu.parallel.batch import madipm_batch
        from madipm_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(7)
        models = [make_sparse_lp(rng, n=160, m=40, density=0.05) for _ in range(8)]
        mesh = make_mesh(len(jax.devices()))
        batched = madipm_batch(models, mesh=mesh, sparse=True, **OPTS)
        assert all(b.success for b in batched)


def make_sparse_qp(rng, n, m, density=0.05, q_density=0.02):
    """Random convex sparse QP: SPD Q = B'B + I with sparse B, equality rows."""
    A = sp.random(m, n, density=density, random_state=rng, format="csr")
    A = A + sp.diags(np.ones(m), 0, shape=(m, n), format="csr")
    B = sp.random(n, n, density=q_density, random_state=rng, format="csr")
    Q = (B.T @ B + sp.eye(n)).tocsr()
    xstar = rng.random(n) + 0.5
    b = A @ xstar
    c = rng.standard_normal(n)
    return mt.QuadraticModel(
        c=c, A=A, lcon=b, ucon=b, lvar=np.zeros(n), uvar=np.full(n, np.inf), Q=Q
    )


class TestSparseQP:
    """Sparse QPs through the K1 CONDENSED system (the reference's sparse-QP
    capability is SparseKKTSystem+cuDSS, src/utils.jl:110; here the same
    pair-list assembly builds A'A and Q scatters into the condensed matrix)."""

    def test_qp_differential_vs_dense(self):
        rng = np.random.default_rng(11)
        qp = make_sparse_qp(rng, n=180, m=60)
        s_dense = mt.madipm(qp, sparse=False, **OPTS)
        s_sparse = mt.madipm(qp, sparse=True, **OPTS)
        assert s_dense.success and s_sparse.success
        assert s_sparse.objective == pytest.approx(s_dense.objective, rel=1e-6)
        assert np.allclose(s_sparse.solution, s_dense.solution, atol=1e-5)
        # identical iteration path (same formulation would differ only by
        # assembly rounding)
        assert abs(s_sparse.iter - s_dense.iter) <= 2

    def test_qp_bounded_and_ranged(self):
        rng = np.random.default_rng(12)
        n, m = 120, 40
        A = sp.random(m, n, density=0.06, random_state=rng, format="csr")
        A = A + sp.diags(np.ones(m), 0, shape=(m, n), format="csr")
        B = sp.random(n, n, density=0.02, random_state=rng, format="csr")
        Q = (B.T @ B + sp.eye(n)).tocsr()
        xstar = rng.random(n) + 0.5
        uvar = np.full(n, np.inf)
        uvar[::3] = xstar[::3] + 0.25  # finite upper bounds, feasible at xstar
        qp = mt.QuadraticModel(
            c=rng.standard_normal(n), A=A, lcon=A @ xstar, ucon=A @ xstar,
            lvar=np.zeros(n), uvar=uvar, Q=Q,
        )
        s_dense = mt.madipm(qp, sparse=False, **OPTS)
        s_sparse = mt.madipm(qp, sparse=True, **OPTS)
        assert s_dense.success and s_sparse.success
        assert s_sparse.objective == pytest.approx(s_dense.objective, rel=1e-6)

    def test_condensed_assembly_matches_dense(self):
        """C = Sigma + Q + gamma A'A: sparse pattern assembly == dense matmul."""
        from madipm_tpu.models.qp import pad_to_device
        from madipm_tpu.ops.kkt import _assemble_condensed

        rng = np.random.default_rng(13)
        qp = make_sparse_qp(rng, n=96, m=32)
        sm = slack_form(qp)
        pd = pad_to_device(sm)
        ps = pad_sparse_to_device(sm, kkt="condensed")
        sigma = jnp.asarray(1.0 + np.random.default_rng(1).random(pd.n))
        Cd, gd, lived = _assemble_condensed(pd, sigma, -1e-8, jnp.float64)
        Cs, gs, lives = _assemble_condensed(ps, sigma, -1e-8, jnp.float64)
        assert np.allclose(np.asarray(lived), np.asarray(lives))
        assert float(gd) == pytest.approx(float(gs))
        assert np.allclose(np.asarray(Cd), np.asarray(Cs), atol=1e-9 * max(1.0, float(jnp.max(jnp.abs(Cd)))))

    def test_qmatvec_matches_scipy(self):
        rng = np.random.default_rng(14)
        qp = make_sparse_qp(rng, n=150, m=50)
        sm = slack_form(qp)
        ps = pad_sparse_to_device(sm, kkt="condensed")
        x = np.zeros(ps.n)
        x[: sm.nvar] = rng.standard_normal(sm.nvar)
        got = np.asarray(ps.qmatvec(jnp.asarray(x)))[: sm.nvar]
        want = sm.Q @ x[: sm.nvar]
        assert np.allclose(got, want, atol=1e-12)

    def test_sparse_lp_condensed(self):
        """LPs also run sparse through K1 when requested."""
        rng = np.random.default_rng(15)
        lp = make_sparse_lp(rng, n=200, m=60)
        s_norm = mt.madipm(lp, sparse=True, **OPTS)
        s_k1 = mt.madipm(lp, sparse=True, kkt_system=mt.KKTSystem.CONDENSED, **OPTS)
        assert s_norm.success and s_k1.success
        assert s_k1.objective == pytest.approx(s_norm.objective, abs=1e-5)

    def test_sparse_qp_rejects_augmented(self):
        rng = np.random.default_rng(16)
        qp = make_sparse_qp(rng, n=60, m=20)
        with pytest.raises(ValueError, match="CONDENSED"):
            mt.MPCSolver(qp, sparse=True, kkt_system=mt.KKTSystem.AUGMENTED)

    def test_missing_condensed_pattern_raises(self):
        rng = np.random.default_rng(17)
        lp = make_sparse_lp(rng, n=80, m=24)
        ps = pad_sparse_to_device(slack_form(lp), kkt="normal")
        with pytest.raises(NotImplementedError, match="condensed"):
            ps.assemble_ata(jnp.ones(ps.m), jnp.float64)


class TestBatchedSparseQP:
    def test_batched_sparse_qp_matches_serial(self):
        from madipm_tpu.parallel.batch import madipm_batch

        rng = np.random.default_rng(41)
        models = [
            make_sparse_qp(rng, n=120 + 30 * i, m=36 + 8 * i, density=0.05)
            for i in range(3)
        ]
        batched = madipm_batch(models, sparse=True, **OPTS)
        for mdl, bs in zip(models, batched):
            ss = mt.madipm(mdl, sparse=True, **OPTS)
            assert bs.success and ss.success
            assert bs.objective == pytest.approx(ss.objective, rel=1e-6)

    def test_mixed_lp_qp_bucket(self):
        """An LP in a QP bucket rides along with an explicit zero Q."""
        from madipm_tpu.parallel.batch import madipm_batch

        rng = np.random.default_rng(42)
        models = [
            make_sparse_qp(rng, n=100, m=30),
            make_sparse_lp(rng, n=140, m=40),
        ]
        batched = madipm_batch(models, sparse=True, **OPTS)
        for mdl, bs in zip(models, batched):
            ss = mt.madipm(mdl, **OPTS)
            assert bs.success and ss.success
            assert bs.objective == pytest.approx(ss.objective, rel=1e-6)
