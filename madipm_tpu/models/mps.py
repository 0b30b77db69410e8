"""MPS/QPS file reader.

Equivalent of the QPSReader.jl ingestion used by the reference benchmark
harness (reference: scripts/common.jl:21-36 ``import_mps``): parses fixed- or
free-format MPS including the QPS quadratic extensions (QUADOBJ/QMATRIX) used
by Maros-Meszaros, with transparent gzip/bz2 decompression chosen by file
extension.  Integrality markers (INTORG/INTEND) are parsed and *relaxed* —
MIPLIB instances load as their LP relaxations, matching the reference's
MIPLIB2010-relaxation suite (scripts/benchmarks_cpu.jl:61-70).

Output is a host-side :class:`~madipm_tpu.models.qp.QuadraticModel`.
"""

from __future__ import annotations

import bz2
import gzip
from typing import Iterable, Optional

import numpy as np
import scipy.sparse as sp

from .qp import INF, QuadraticModel


def _open_lines(path: str) -> Iterable[str]:
    if path.endswith(".gz"):
        with gzip.open(path, "rt") as f:
            yield from f
    elif path.endswith(".bz2"):
        with bz2.open(path, "rt") as f:
            yield from f
    else:
        with open(path, "r") as f:
            yield from f


def read_mps(path: str, name: Optional[str] = None, use_native: Optional[bool] = None) -> QuadraticModel:
    """Parse an MPS/QPS file (optionally .gz/.bz2) into a QuadraticModel.

    ``use_native=None`` (auto) uses the C++ parser (native/mps_native.cpp)
    when the library is available, falling back to this module's Python
    implementation; True forces native, False forces Python.
    """
    if use_native is not False:
        try:
            from .native import available, native_parse_mps

            if available():
                text = "".join(_open_lines(path))
                return native_parse_mps(text, name=name or path)
            if use_native:
                raise RuntimeError("native MPS parser requested but unavailable")
        except RuntimeError:
            if use_native:
                raise
    return parse_mps(_open_lines(path), name=name or path)


def parse_mps(lines: Iterable[str], name: str = "mps") -> QuadraticModel:
    section = None
    obj_name = None
    prob_name = name
    maximize = False

    row_type: dict[str, str] = {}  # name -> L/G/E
    row_order: list[str] = []
    col_order: list[str] = []
    col_index: dict[str, int] = {}
    row_index: dict[str, int] = {}

    a_rows: list[int] = []
    a_cols: list[int] = []
    a_vals: list[float] = []
    c_entries: dict[int, float] = {}
    c0 = 0.0
    rhs: dict[int, float] = {}
    ranges: dict[int, float] = {}
    lb: dict[int, float] = {}
    ub: dict[int, float] = {}
    explicit_lb: set[int] = set()
    integer_cols: set[int] = set()

    q_rows: list[int] = []
    q_cols: list[int] = []
    q_vals: list[float] = []
    q_section = None  # 'QUADOBJ' (lower tri) or 'QMATRIX' (full)

    in_integer = False
    pending_objsense = False

    def col_id(cname: str) -> int:
        if cname not in col_index:
            col_index[cname] = len(col_order)
            col_order.append(cname)
        return col_index[cname]

    for raw in lines:
        if not raw.strip() or raw.lstrip().startswith("*"):
            continue
        is_header = not raw[0].isspace()
        line = raw.rstrip("\n")
        tok = line.split()
        if is_header:
            head = tok[0].upper()
            if head == "NAME":
                prob_name = tok[1] if len(tok) > 1 else name
                section = None
            elif head == "OBJSENSE":
                section = "OBJSENSE"
                if len(tok) > 1:
                    maximize = tok[1].upper() in ("MAX", "MAXIMIZE")
                else:
                    pending_objsense = True
            elif head in ("ROWS", "COLUMNS", "RHS", "RANGES", "BOUNDS", "ENDATA"):
                section = head
            elif head in ("QUADOBJ", "QMATRIX", "QSECTION"):
                section = "QUAD"
                q_section = "QMATRIX" if head == "QMATRIX" else "QUADOBJ"
            else:
                section = head  # unknown section: skip its body
            if head == "ENDATA":
                break
            continue

        if section == "OBJSENSE" and pending_objsense:
            maximize = tok[0].upper() in ("MAX", "MAXIMIZE")
            pending_objsense = False
        elif section == "ROWS":
            rtype, rname = tok[0].upper(), tok[1]
            if rtype == "N":
                if obj_name is None:
                    obj_name = rname
                # extra N rows are ignored (free rows)
            else:
                row_type[rname] = rtype
                row_index[rname] = len(row_order)
                row_order.append(rname)
        elif section == "COLUMNS":
            if len(tok) >= 3 and tok[1].upper() == "'MARKER'":
                marker = tok[2].upper().strip("'")
                if "INTORG" in raw.upper():
                    in_integer = True
                elif "INTEND" in raw.upper():
                    in_integer = False
                continue
            cname = tok[0]
            j = col_id(cname)
            if in_integer:
                integer_cols.add(j)
            for k in range(1, len(tok) - 1, 2):
                rname, val = tok[k], float(tok[k + 1])
                if rname == obj_name:
                    c_entries[j] = c_entries.get(j, 0.0) + val
                elif rname in row_index:
                    a_rows.append(row_index[rname])
                    a_cols.append(j)
                    a_vals.append(val)
                # entries for unknown/free rows silently dropped
        elif section == "RHS":
            # first token is the RHS-set name (sometimes omitted -> even count)
            start = 1 if len(tok) % 2 == 1 else 0
            for k in range(start, len(tok) - 1, 2):
                rname, val = tok[k], float(tok[k + 1])
                if rname == obj_name:
                    c0 = -val  # objective constant enters negated
                elif rname in row_index:
                    rhs[row_index[rname]] = val
        elif section == "RANGES":
            start = 1 if len(tok) % 2 == 1 else 0
            for k in range(start, len(tok) - 1, 2):
                rname, val = tok[k], float(tok[k + 1])
                if rname in row_index:
                    ranges[row_index[rname]] = val
        elif section == "BOUNDS":
            btype = tok[0].upper()
            # "BTYPE SET COL [VAL]"; the bound-set name may be omitted
            # ("BTYPE COL [VAL]") — detected by whether the value-carrying
            # types find a number in the VAL slot.
            needs_val = btype in ("UP", "LO", "FX", "UI", "LI")
            cname, val = None, 0.0
            if needs_val:
                if len(tok) >= 4:
                    cname, val = tok[2], float(tok[3])
                elif len(tok) == 3:
                    try:  # omitted set name: "UP COL 4.0"
                        val = float(tok[2])
                        cname = tok[1]
                    except ValueError:
                        cname = tok[2]  # malformed: value missing, keep 0.0
            else:  # FR/MI/PL/BV take no value
                cname = tok[2] if len(tok) >= 3 else tok[1]
            j = col_id(cname)
            if btype == "UP":
                ub[j] = val
                if val < 0 and j not in explicit_lb:
                    lb[j] = -INF  # classic MPS convention
            elif btype == "LO":
                lb[j] = val
                explicit_lb.add(j)
            elif btype == "FX":
                lb[j] = val
                ub[j] = val
                explicit_lb.add(j)
            elif btype == "FR":
                lb[j] = -INF
                ub[j] = INF
                explicit_lb.add(j)
            elif btype == "MI":
                lb[j] = -INF
                explicit_lb.add(j)
            elif btype == "PL":
                ub[j] = INF
            elif btype == "BV":
                lb[j] = 0.0
                ub[j] = 1.0
                integer_cols.add(j)
                explicit_lb.add(j)
            elif btype == "UI":
                ub[j] = val
                integer_cols.add(j)
            elif btype == "LI":
                lb[j] = val
                integer_cols.add(j)
                explicit_lb.add(j)
        elif section == "QUAD":
            cname1 = tok[0]
            for k in range(1, len(tok) - 1, 2):
                cname2, val = tok[k], float(tok[k + 1])
                q_rows.append(col_id(cname1))
                q_cols.append(col_id(cname2))
                q_vals.append(val)

    n = len(col_order)
    m = len(row_order)

    c = np.zeros(n)
    for j, v in c_entries.items():
        c[j] = v

    lvar = np.zeros(n)
    uvar = np.full(n, INF)
    for j, v in lb.items():
        lvar[j] = v
    for j, v in ub.items():
        uvar[j] = v

    lcon = np.full(m, -INF)
    ucon = np.full(m, INF)
    for i, rname in enumerate(row_order):
        t = row_type[rname]
        r = rhs.get(i, 0.0)
        if t == "L":
            ucon[i] = r
        elif t == "G":
            lcon[i] = r
        else:  # E
            lcon[i] = r
            ucon[i] = r
    for i, rng_ in ranges.items():
        t = row_type[row_order[i]]
        r = rhs.get(i, 0.0)
        if t == "L":
            lcon[i] = ucon[i] - abs(rng_)
        elif t == "G":
            ucon[i] = lcon[i] + abs(rng_)
        else:  # E
            if rng_ >= 0:
                ucon[i] = r + rng_
            else:
                lcon[i] = r + rng_

    A = sp.csr_matrix((a_vals, (a_rows, a_cols)), shape=(m, n))

    Q = None
    if q_vals:
        if q_section == "QUADOBJ":
            # lower-triangular entries of the symmetric Q in 1/2 x'Qx
            Q = sp.csr_matrix((q_vals, (q_rows, q_cols)), shape=(n, n))
        else:  # QMATRIX lists the full matrix
            Qf = sp.csr_matrix((q_vals, (q_rows, q_cols)), shape=(n, n))
            Q = sp.tril(Qf, format="csr")

    model = QuadraticModel(
        c=c,
        A=A,
        lcon=lcon,
        ucon=ucon,
        lvar=lvar,
        uvar=uvar,
        Q=Q,
        c0=c0,
        name=prob_name,
        minimize=not maximize,  # madipm() negates + flips for maximization
    )
    model._integer_cols = sorted(integer_cols)  # type: ignore[attr-defined]
    return model
