"""Parity tests of the native (C++) ingestion kernels vs the Python reference
implementations (native/mps_native.cpp via madipm_tpu/models/native.py)."""

import os

import numpy as np
import pytest

from madipm_tpu.models import native
from madipm_tpu.models.mps import read_mps

DATA = os.path.join(os.path.dirname(__file__), "data")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _models_equal(a, b):
    assert a.nvar == b.nvar and a.ncon == b.ncon
    assert np.allclose(a.c, b.c)
    assert np.allclose(a.A.toarray(), b.A.toarray())
    assert np.allclose(a.lvar, b.lvar)
    assert np.allclose(a.uvar, b.uvar)
    assert np.allclose(a.lcon, b.lcon)
    assert np.allclose(a.ucon, b.ucon)
    assert a.c0 == b.c0
    assert (a.Q is None) == (b.Q is None)
    if a.Q is not None:
        assert np.allclose(a.Q.toarray(), b.Q.toarray())
    assert a.minimize == b.minimize
    assert getattr(a, "_integer_cols", []) == getattr(b, "_integer_cols", [])


@pytest.mark.parametrize("fname", ["simple.mps", "simple_qp.qps"])
def test_parser_parity(fname):
    path = os.path.join(DATA, fname)
    nat = read_mps(path, use_native=True)
    py = read_mps(path, use_native=False)
    _models_equal(nat, py)


def test_parser_parity_synthetic_bounds():
    text = """NAME BNDT
ROWS
 N obj
 L r1
 G r2
 E r3
COLUMNS
    x  obj  1.0  r1  2.0
    x  r2  1.0  r3  1.0
    y  obj  -1.0  r1  1.0
    z  r3  4.0
RHS
    rhs r1 10.0 r2 -2.0
    rhs r3 3.0 obj 7.0
RANGES
    rng r1 4.0
BOUNDS
 UP bnd x 5.0
 MI bnd y
 UP bnd y -1.0
 FX bnd z 2.5
ENDATA
"""
    from madipm_tpu.models.mps import parse_mps

    py = parse_mps(text.splitlines())
    nat = native.native_parse_mps(text)
    _models_equal(nat, py)


def test_coo_to_csr_matches_scipy(rng):
    import scipy.sparse as sp

    Ai = rng.integers(0, 40, 300).astype(np.int32)
    Aj = rng.integers(0, 60, 300).astype(np.int32)
    Ax = rng.standard_normal(300)
    Bp, Bj, Bx = native.native_coo_to_csr(40, Ai, Aj, Ax)
    ours = sp.csr_matrix((Bx, Bj, Bp), shape=(40, 60))
    ref = sp.csr_matrix((Ax, (Ai, Aj)), shape=(40, 60))
    assert abs(ours - ref).max() < 1e-14


def test_solve_native_parsed_model():
    import madipm_tpu as mt

    qp = read_mps(os.path.join(DATA, "simple.mps"), use_native=True)
    stats = mt.madipm(qp, print_level=mt.PrintLevel.ERROR)
    assert stats.success
