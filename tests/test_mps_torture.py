"""MPS parser torture corpus (VERDICT.md item 9).

Each fixture in tests/data/torture/ exercises one classic MPS quirk
(RANGES on E rows both signs, negative-UP lower-bound drop, duplicate
entries summing, OBJSENSE, free N rows, omitted bound-set names,
QUADOBJ vs QMATRIX) and carries a HAND-COMPUTED optimum in its header
comment.  Every file is:

1. parsed by the Python parser and checked against the hand optimum by
   solving with our IPM through the full from_mps pipeline,
2. cross-checked against scipy HiGHS on the parsed model (LPs), and
3. differentially parsed by the C++ parser (native/mps_native.cpp),
   asserting model equality field by field.

The reference's ingestion role is QPSReader.jl (scripts/common.jl:21-36).
"""

import os

import numpy as np
import pytest

import madipm_tpu as mt
from madipm_tpu.frontends import from_mps
from madipm_tpu.models.mps import parse_mps, read_mps

DATA = os.path.join(os.path.dirname(__file__), "data", "torture")

#: (filename, hand-computed optimum)
CASES = [
    ("ranges_all.mps", 4.0),
    ("neg_up.mps", -5.0),
    ("dup_entries.mps", 6.0),
    ("objsense_max.mps", 2.0),
    ("free_rows.mps", 1.0),
    ("bounds_noname.mps", -5.0),
    ("quadobj.qps", -1.0 / 3.0),
    ("qmatrix.qps", -1.0 / 3.0),
    # FIXED-format fixtures (column-anchored names with embedded spaces,
    # $ comments, markers, blank bound-set fields) — parseable ONLY by the
    # fixed path; read_mps must auto-detect (round-3, VERDICT #5).
    ("fixed_spaces.mps", 3.5),
    ("fixed_marker.mps", -5.0),
]


def _path(fn):
    return os.path.join(DATA, fn)


class TestHandOptima:
    @pytest.mark.parametrize("fn,opt", CASES)
    def test_solve_matches_hand_value(self, fn, opt):
        stats = from_mps(_path(fn), print_level=mt.PrintLevel.ERROR)
        assert stats.success, stats.status
        assert abs(stats.objective - opt) <= 1e-6 * max(1.0, abs(opt)), (
            f"{fn}: got {stats.objective}, hand value {opt}"
        )

    @pytest.mark.parametrize("fn,opt", [c for c in CASES if c[0].endswith(".mps")])
    def test_scipy_highs_agrees(self, fn, opt):
        """The PARSED model solved by an independent solver must hit the
        hand value — this validates parsing, not our IPM."""
        from scipy.optimize import linprog

        qp = read_mps(_path(fn), use_native=False)
        sign = 1.0 if qp.minimize else -1.0
        # two-sided rows -> split for linprog
        A = qp.A.toarray()
        A_ub, b_ub = [], []
        A_eq, b_eq = [], []
        for i in range(qp.ncon):
            lo, hi = qp.lcon[i], qp.ucon[i]
            if lo == hi:
                A_eq.append(A[i])
                b_eq.append(lo)
            else:
                if np.isfinite(hi):
                    A_ub.append(A[i])
                    b_ub.append(hi)
                if np.isfinite(lo):
                    A_ub.append(-A[i])
                    b_ub.append(-lo)
        bounds = [
            (l if np.isfinite(l) else None, u if np.isfinite(u) else None)
            for l, u in zip(qp.lvar, qp.uvar)
        ]
        res = linprog(
            sign * qp.c,
            A_ub=np.array(A_ub) if A_ub else None,
            b_ub=np.array(b_ub) if b_ub else None,
            A_eq=np.array(A_eq) if A_eq else None,
            b_eq=np.array(b_eq) if b_eq else None,
            bounds=bounds,
            method="highs",
        )
        assert res.status == 0, res.message
        val = sign * (res.fun + sign * qp.c0)
        assert abs(val - opt) <= 1e-7 * max(1.0, abs(opt)), (
            f"{fn}: HiGHS on parsed model gives {val}, hand value {opt}"
        )


class TestNativeDifferential:
    @pytest.mark.parametrize("fn", [c[0] for c in CASES])
    def test_cpp_matches_python(self, fn):
        from madipm_tpu.models.native import available

        if not available():
            pytest.skip("native parser not built")
        py = read_mps(_path(fn), use_native=False)
        cc = read_mps(_path(fn), use_native=True)
        assert py.nvar == cc.nvar and py.ncon == cc.ncon
        np.testing.assert_allclose(py.c, cc.c, atol=0)
        np.testing.assert_allclose(py.lvar, cc.lvar, atol=0)
        np.testing.assert_allclose(py.uvar, cc.uvar, atol=0)
        np.testing.assert_allclose(py.lcon, cc.lcon, atol=0)
        np.testing.assert_allclose(py.ucon, cc.ucon, atol=0)
        np.testing.assert_allclose(
            py.A.toarray(), cc.A.toarray(), atol=0
        )
        assert (py.Q is None) == (cc.Q is None)
        if py.Q is not None:
            np.testing.assert_allclose(py.Q.toarray(), cc.Q.toarray(), atol=0)
        assert py.c0 == cc.c0
        assert py.minimize == cc.minimize


class TestParsedDetails:
    """Direct assertions on the parsed structures (independent of solving)."""

    def test_ranges_e_both_signs(self):
        qp = read_mps(_path("ranges_all.mps"), use_native=False)
        i = {n: k for k, n in enumerate(["R1", "R2", "R3", "R4"])}
        np.testing.assert_allclose(qp.lcon[i["R1"]], 4.0)
        np.testing.assert_allclose(qp.ucon[i["R1"]], 6.0)  # E, rng > 0
        np.testing.assert_allclose(qp.lcon[i["R2"]], 1.0)
        np.testing.assert_allclose(qp.ucon[i["R2"]], 4.0)  # G
        np.testing.assert_allclose(qp.lcon[i["R3"]], 3.0)
        np.testing.assert_allclose(qp.ucon[i["R3"]], 5.0)  # L
        np.testing.assert_allclose(qp.lcon[i["R4"]], -3.0)  # E, rng < 0
        np.testing.assert_allclose(qp.ucon[i["R4"]], -2.0)

    def test_neg_up_drops_lower(self):
        qp = read_mps(_path("neg_up.mps"), use_native=False)
        assert qp.lvar[0] == -np.inf and qp.uvar[0] == -1.0
        assert qp.lvar[1] == -2.0 and qp.uvar[1] == -1.0  # explicit LO kept

    def test_duplicates_sum(self):
        qp = read_mps(_path("dup_entries.mps"), use_native=False)
        np.testing.assert_allclose(qp.c[0], 3.0)
        np.testing.assert_allclose(qp.A.toarray()[0, 0], 1.0)

    def test_free_rows_dropped(self):
        qp = read_mps(_path("free_rows.mps"), use_native=False)
        assert qp.ncon == 1  # FREE row gone
        np.testing.assert_allclose(qp.A.toarray(), [[1.0]])

    def test_objsense_and_constant(self):
        qp = read_mps(_path("objsense_max.mps"), use_native=False)
        assert not qp.minimize
        np.testing.assert_allclose(qp.c0, -5.0)

    def test_quadobj_equals_qmatrix(self):
        a = read_mps(_path("quadobj.qps"), use_native=False)
        b = read_mps(_path("qmatrix.qps"), use_native=False)
        np.testing.assert_allclose(a.Q.toarray(), b.Q.toarray())
        np.testing.assert_allclose(a.Q.toarray(), [[2.0, 1.0], [1.0, 2.0]])


class TestFixedFormat:
    """Fixed-format auto-detection and field semantics (round-3)."""

    @pytest.mark.parametrize("fn,nv,nc", [
        ("fixed_spaces.mps", 2, 2),
        ("fixed_marker.mps", 2, 1),
    ])
    @pytest.mark.parametrize("use_native", [False, True])
    def test_autodetect_resolves_all_refs(self, fn, nv, nc, use_native):
        if use_native:
            from madipm_tpu.models.native import available

            if not available():
                pytest.skip("native parser not built")
        qp = read_mps(_path(fn), use_native=use_native)
        assert qp.nvar == nv and qp.ncon == nc
        assert getattr(qp, "_n_unknown_refs", 0) == 0

    def test_embedded_space_names_and_obj_rhs(self):
        qp = read_mps(_path("fixed_spaces.mps"), use_native=False)
        # RHS on the objective row enters as c0 = -(-1.5)
        assert qp.c0 == 1.5
        assert np.allclose(qp.c, [1.0, 3.0])
        assert qp.uvar[0] == 5.0

    def test_marker_relaxation_and_blank_set(self):
        qp = read_mps(_path("fixed_marker.mps"), use_native=False)
        assert qp._integer_cols == [0]  # INTORG region, relaxed
        assert qp.uvar[0] == 2.0  # blank bound-set field still parsed
        assert qp.ucon[0] == 3.0  # field-3 $ comment line was ignored


class TestRoundtripFuzz:
    """Writer <-> parser property fuzz (scripts/fuzz_mps_roundtrip.py runs
    the 500-model version; this keeps a 40-model smoke in CI)."""

    def test_fuzz_40(self):
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
        from fuzz_mps_roundtrip import compare, random_model

        from madipm_tpu.models.mps import read_mps as _read, write_mps
        from madipm_tpu.models.native import available

        rng = np.random.default_rng(42)
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "f.mps")
            for it in range(40):
                qp, _ = random_model(rng)
                write_mps(qp, p)
                compare(qp, _read(p, use_native=False), f"iter {it} py")
                if available():
                    compare(qp, _read(p, use_native=True), f"iter {it} cc")
