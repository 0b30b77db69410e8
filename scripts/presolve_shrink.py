#!/usr/bin/env python
"""Presolve reduction report on the structured families (VERDICT #4).

For each structured-suite instance (the Netlib/MIPLIB/Maros–Mészáros
structural stand-ins, models/generators.py) plus reduction-heavy synthetic
models, run presolve_qp and report rows/cols/nnz shrink and which
reduction classes fired.  Writes a TSV to results/presolve-shrink.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from madipm_tpu.models.generators import structured_suite
    from madipm_tpu.models.presolve import presolve_qp

    rows = ["name\tm0\tn0\tnnz0\tm1\tn1\tnnz1\trow_shrink%\tcol_shrink%\treductions"]
    # Structured families at two scales + reduction-planted models.
    models = structured_suite(1) + structured_suite(2, seed0=21)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fuzz_mps_roundtrip import random_model

    rng = np.random.default_rng(3)
    for i in range(4):
        mdl, _ = random_model(rng)
        mdl.name = f"fuzz{i}"
        models.append(mdl)

    # Netlib-LIKE redundancy (real archive files carry exactly this kind of
    # fat, which the clean generators lack): a transportation core plus
    # 2x-duplicated supply rows, per-arc capacity singleton rows, and a
    # free total-cost accounting variable in one extra equality.
    import scipy.sparse as sp

    from madipm_tpu.models.generators import transportation_lp
    from madipm_tpu.models.qp import QuadraticModel

    for ns, nd, sd in ((12, 18, 5), (24, 36, 6)):
        base = transportation_lp(ns, nd, seed=sd)
        A = base.A.toarray()
        m0b, n0b = A.shape
        rng2 = np.random.default_rng(sd)
        # duplicate the first ns supply rows at scale 2
        dup = 2.0 * A[:ns]
        # capacity singletons on a third of the arcs
        arcs = rng2.permutation(n0b)[: n0b // 3]
        cap = np.zeros((arcs.size, n0b))
        cap[np.arange(arcs.size), arcs] = 1.0
        # free accounting variable z with  z - c'x = 0
        acct = np.concatenate([-base.c, [1.0]])[None, :]
        A_full = np.vstack([
            np.hstack([A, np.zeros((m0b, 1))]),
            np.hstack([dup, np.zeros((ns, 1))]),
            np.hstack([cap, np.zeros((arcs.size, 1))]),
            acct,
        ])
        lcon = np.concatenate([
            base.lcon, 2.0 * base.lcon[:ns], np.full(arcs.size, -np.inf), [0.0]
        ])
        ucon = np.concatenate([
            base.ucon, 2.0 * base.ucon[:ns],
            np.full(arcs.size, 10.0), [0.0]
        ])
        models.append(QuadraticModel(
            c=np.concatenate([base.c, [0.0]]),
            A=sp.csr_matrix(A_full), lcon=lcon, ucon=ucon,
            lvar=np.concatenate([base.lvar, [-np.inf]]),
            uvar=np.concatenate([base.uvar, [np.inf]]),
            name=f"transport_fat_{ns}x{nd}",
        ))

    for mdl in models:
        m0, n0, nnz0 = mdl.ncon, mdl.nvar, mdl.A.nnz
        red, flag, post = presolve_qp(mdl)
        if flag:
            m1, n1, nnz1 = red.ncon, red.nvar, red.A.nnz
        else:
            m1 = n1 = nnz1 = 0  # fully resolved
        fired = []
        if len(post.singleton_rows):
            fired.append(f"singleton_rows={len(post.singleton_rows)}")
        if len(post.forcing_rows):
            fired.append(f"forcing_rows={len(post.forcing_rows)}")
        if len(post.dup_rows):
            fired.append(f"dup_rows={len(post.dup_rows)}")
        nfs = sum(1 for e in post.col_elims if e[0] == "fs")
        ndc = sum(1 for e in post.col_elims if e[0] == "dup")
        if nfs:
            fired.append(f"free_singleton_cols={nfs}")
        if ndc:
            fired.append(f"dup_cols={ndc}")
        nfix = int(post.fixed_mask.sum())
        if nfix:
            fired.append(f"fixed_or_empty_cols={nfix}")
        # redundant rows = dropped rows not otherwise accounted
        other = (
            m0 - (m1 if flag else 0) - len(post.singleton_rows)
            - len(post.forcing_rows) - len(post.dup_rows) - nfs
        )
        if other > 0:
            fired.append(f"empty_or_redundant_rows={other}")
        rs = 100.0 * (1 - (m1 / m0 if m0 else 0))
        cs = 100.0 * (1 - (n1 / n0 if n0 else 0))
        rows.append(
            f"{mdl.name}\t{m0}\t{n0}\t{nnz0}\t{m1}\t{n1}\t{nnz1}\t"
            f"{rs:.1f}\t{cs:.1f}\t{','.join(fired) or '-'}"
        )
        log(rows[-1])

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "presolve-shrink.txt")
    with open(out, "w") as f:
        f.write("\n".join(rows) + "\n")
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
