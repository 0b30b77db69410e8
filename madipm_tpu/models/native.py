"""ctypes bindings for the native (C++) ingestion kernels.

Loads ``native/libmadipm_native.so`` (built by ``make -C native``) and
exposes:

- :func:`native_parse_mps` — fast MPS/QPS text parser (same semantics as
  the pure-Python models/mps.py, which remains the reference and fallback),
- :func:`native_coo_to_csr` — counting-sort COO->CSR (reference
  coo_to_csr, src/utils.jl:158-207).

If the library is missing or fails to build, ``AVAILABLE`` is False and
callers fall back to the Python paths transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_LIB_DIR, "libmadipm_native.so"))

_lib: Optional[ctypes.CDLL] = None


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_LIB_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_LIB_DIR, "mps_native.cpp")
    stale = (
        os.path.exists(_LIB_PATH)
        and os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    )
    if (not os.path.exists(_LIB_PATH) or stale) and not _try_build():
        if not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.mps_parse.restype = ctypes.c_void_p
    lib.mps_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    if hasattr(lib, "mps_parse2"):
        lib.mps_parse2.restype = ctypes.c_void_p
        lib.mps_parse2.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32]
        lib.mps_unknown_refs.restype = ctypes.c_int64
        lib.mps_unknown_refs.argtypes = [ctypes.c_void_p]
    lib.mps_dims.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_int64)
    ] * 4 + [ctypes.POINTER(ctypes.c_int32)]
    lib.mps_free.argtypes = [ctypes.c_void_p]
    lib.mps_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 11 + [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int64,
    ]
    lib.coo_to_csr.argtypes = [ctypes.c_int64, ctypes.c_int64] + [ctypes.c_void_p] * 6
    lib.normal_pattern_build.restype = ctypes.c_void_p
    lib.normal_pattern_build.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.normal_pattern_dims.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.normal_pattern_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
    lib.normal_pattern_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def native_parse_mps(text: str, name: str = "mps", fixed: bool = False):
    """Parse MPS text with the C++ parser; returns a QuadraticModel.

    ``fixed=True`` uses column-anchored fields (classic fixed MPS; names
    may contain embedded spaces).  Requires a library built from the
    current source (mps_parse2); older builds fall back to free-format.
    Raises RuntimeError if the native library is unavailable.
    """
    import scipy.sparse as sp

    from .qp import QuadraticModel

    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available; use models.mps.parse_mps")

    raw = text.encode()
    if hasattr(lib, "mps_parse2"):
        h = lib.mps_parse2(raw, len(raw), 1 if fixed else 0)
    else:
        if fixed:
            raise RuntimeError("native library too old for fixed-format MPS")
        h = lib.mps_parse(raw, len(raw))
    n_unknown = 0
    if not h:
        raise RuntimeError("native MPS parse failed")
    try:
        if hasattr(lib, "mps_unknown_refs"):
            n_unknown = int(lib.mps_unknown_refs(ctypes.c_void_p(h)))
        nvar = ctypes.c_int64()
        ncon = ctypes.c_int64()
        nnz = ctypes.c_int64()
        qnnz = ctypes.c_int64()
        maximize = ctypes.c_int32()
        lib.mps_dims(h, ctypes.byref(nvar), ctypes.byref(ncon), ctypes.byref(nnz),
                     ctypes.byref(qnnz), ctypes.byref(maximize))
        n, m, k, qk = nvar.value, ncon.value, nnz.value, qnnz.value

        Ai = np.empty(k, dtype=np.int32)
        Aj = np.empty(k, dtype=np.int32)
        Ax = np.empty(k, dtype=np.float64)
        Qi = np.empty(qk, dtype=np.int32)
        Qj = np.empty(qk, dtype=np.int32)
        Qx = np.empty(qk, dtype=np.float64)
        c = np.empty(n)
        lvar = np.empty(n)
        uvar = np.empty(n)
        lcon = np.empty(m)
        ucon = np.empty(m)
        integer_mask = np.empty(n, dtype=np.uint8)
        c0 = ctypes.c_double()
        namebuf = ctypes.create_string_buffer(256)

        ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        lib.mps_fill(
            ctypes.c_void_p(h), ptr(Ai), ptr(Aj), ptr(Ax), ptr(c), ptr(lvar),
            ptr(uvar), ptr(lcon), ptr(ucon), ptr(Qi), ptr(Qj), ptr(Qx),
            ctypes.byref(c0), ptr(integer_mask), namebuf, ctypes.c_int64(256),
        )
    finally:
        lib.mps_free(h)

    A = sp.csr_matrix((Ax, (Ai, Aj)), shape=(m, n))
    Q = sp.csr_matrix((Qx, (Qi, Qj)), shape=(n, n)) if qk else None
    model = QuadraticModel(
        c=c, A=A, lcon=lcon, ucon=ucon, lvar=lvar, uvar=uvar, Q=Q,
        c0=c0.value, name=namebuf.value.decode() or name,
        minimize=not bool(maximize.value),
    )
    model._integer_cols = np.flatnonzero(integer_mask).tolist()  # type: ignore[attr-defined]
    model._n_unknown_refs = n_unknown  # type: ignore[attr-defined]
    return model


def native_coo_to_csr(n_rows: int, Ai, Aj, Ax):
    """COO -> CSR via the native counting sort. Returns (indptr, indices, data)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    Ai = np.ascontiguousarray(Ai, dtype=np.int32)
    Aj = np.ascontiguousarray(Aj, dtype=np.int32)
    Ax = np.ascontiguousarray(Ax, dtype=np.float64)
    nnz = Ai.size
    Bp = np.empty(n_rows + 1, dtype=np.int32)
    Bj = np.empty(nnz, dtype=np.int32)
    Bx = np.empty(nnz, dtype=np.float64)
    ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    lib.coo_to_csr(
        ctypes.c_int64(n_rows), ctypes.c_int64(nnz), ptr(Ai), ptr(Aj), ptr(Ax),
        ptr(Bp), ptr(Bj), ptr(Bx),
    )
    return Bp, Bj, Bx


def native_normal_pattern(indptr, indices, m, n, K, m_pad):
    """Symbolic normal-equation pattern via the C++ builder (reference
    ``build_normal_system``, src/utils.jl:209-274).  Returns the same six
    arrays as models.sparse.build_normal_pattern.

    Raises RuntimeError if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    h = lib.normal_pattern_build(
        ctypes.c_int64(m), ctypes.c_int64(n), ctypes.c_int64(K),
        ptr(indptr), ptr(indices), ctypes.c_int64(m_pad),
    )
    if not h:
        raise RuntimeError("normal_pattern_build failed")
    try:
        P = ctypes.c_int64()
        nnzS = ctypes.c_int64()
        lib.normal_pattern_dims(h, ctypes.byref(P), ctypes.byref(nnzS))
        pair_a = np.empty(P.value, dtype=np.int32)
        pair_b = np.empty(P.value, dtype=np.int32)
        pair_col = np.empty(P.value, dtype=np.int32)
        seg_id = np.empty(P.value, dtype=np.int32)
        s_low = np.empty(nnzS.value, dtype=np.int32)
        s_up = np.empty(nnzS.value, dtype=np.int32)
        lib.normal_pattern_fill(
            ctypes.c_void_p(h), ptr(pair_a), ptr(pair_b), ptr(pair_col),
            ptr(seg_id), ptr(s_low), ptr(s_up),
        )
    finally:
        lib.normal_pattern_free(ctypes.c_void_p(h))
    return pair_a, pair_b, pair_col, seg_id, s_low, s_up
