#!/usr/bin/env python
"""Ablate the predictor PCG budget on the QP/K1 (CONDENSED) path.

Round-3 adopted ``predictor_pcg_budget=0`` for the LP/NORMAL bench configs
(+22-64%, scripts/ablate_predictor.py) but left the option default None
because K1's fp64 PCG polish is load-bearing for the gamma~1e8 conditioning
of the condensed system (Sigma + Q + gamma A'A) — correctness probes passed
at 0 but the perf/robustness trade was never swept.  This sweeps it: k
convex QPs through K1 with the fp64 factor (gamma exceeds fp32 range —
CLAUDE.md), budgets {None, 2, 0}, same honest per-run protocol as bench.py.

Reference role: GPU QP solves, /root/reference/test/test_gpu.jl:9-21.

Usage: python scripts/ablate_predictor_qp.py [--m 512 --n 1024 --k 8]
"""

from __future__ import annotations

import argparse
import dataclasses as _dc
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_qp_suite(k, m, n, density, seed0=977):
    import madipm_tpu as mt

    models = []
    for i in range(k):
        rng = np.random.default_rng(seed0 + i)
        A = rng.standard_normal((m, n)) * (rng.random((m, n)) < density)
        empty = np.flatnonzero(np.abs(A).sum(axis=1) == 0)
        for r in empty:
            A[r, rng.integers(n)] = 1.0
        xstar = rng.random(n) + 0.5
        b = A @ xstar
        P = rng.standard_normal((n, n // 8)) / np.sqrt(n)
        Q = P @ P.T + 0.1 * np.eye(n)
        uvar = np.full(n, np.inf)
        ub = rng.random(n) < 0.25
        uvar[ub] = xstar[ub] + 3 * rng.random(ub.sum())
        models.append(
            mt.from_dense(
                c=rng.standard_normal(n), A=A, lcon=b, ucon=b,
                lvar=np.zeros(n), uvar=uvar, Q=Q, name=f"qp{i}",
            )
        )
    return models


def bench_qp(models, opts):
    """Vmapped K1 solve of the suite; same materialize/sync discipline as
    bench.py::bench_tpu (this platform's block_until_ready returns early)."""
    import jax
    import jax.numpy as jnp

    from madipm_tpu.parallel.batch import bucket_pad, batched_stats
    from madipm_tpu.solver import driver
    from madipm_tpu.utils.options import load_options

    opt = load_options(**opts)
    probs, slacked = bucket_pad(models)
    cfg = driver.make_config(opt, is_qp=True)

    def _solve(probs_, bscale):
        p = _dc.replace(probs_, b=probs_.b * bscale)
        return jax.vmap(partial(driver.solve_device, cfg))(p)

    fn = jax.jit(_solve)

    touch = jax.jit(
        lambda p: jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree_util.tree_map(
                lambda x: jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0).astype(jnp.float64)),
                p,
            ),
        )
    )
    t0 = time.time()
    np.asarray(touch(probs))
    log(f"input materialization {time.time() - t0:.1f}s")

    t0 = time.time()
    _, scale, state = fn(probs, 1.0)
    np.asarray(state.k)
    log(f"first run (incl compile) {time.time() - t0:.1f}s")

    R = 3
    walls, iters_each = [], []
    for r in range(1, R + 1):
        t0 = time.time()
        _, scale, state = fn(probs, 1.0 + 1e-4 * r)
        per_inst = np.asarray(state.k)
        iters_each.append(int(np.sum(per_inst)))
        walls.append(time.time() - t0)
        log(f"run {r}: {walls[-1]:.3f}s, {iters_each[-1]} iters, k={per_inst.tolist()}")
    rates = [i / w for i, w in zip(iters_each, walls)]
    med = int(np.argsort(rates)[len(rates) // 2])
    stats = batched_stats(models, scale, state, walls[med])
    return iters_each[med], walls[med], stats


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--m", type=int, default=512)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--density", type=float, default=0.15)
    ap.add_argument("--budgets", default="None,2,0")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        # env vars do NOT override the site's platform pin (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache
    configure_cache(jax, backend)
    log(f"backend: {backend}")

    import madipm_tpu as mt

    models = make_qp_suite(args.k, args.m, args.n, args.density)

    base = dict(
        tol=1e-8,
        max_iter=300,
        regularization=mt.FixedRegularization(1e-8, -1e-8),
        print_level=mt.PrintLevel.ERROR,
        kkt_system=mt.KKTSystem.CONDENSED,
        linear_solver=mt.LinearSolver.CHOLESKY_INV,
        factor_dtype="float64",  # gamma ~ 1/|del_c| exceeds fp32 range on K1
        refinement_steps=12,
        pcg_adaptive_tol=True,
    )

    results = {}
    budgets = [None if b == "None" else int(b) for b in args.budgets.split(",")]
    for budget in budgets:
        opts = dict(base)
        if budget is not None:
            opts["predictor_pcg_budget"] = budget
        iters, wall, stats = bench_qp(models, opts)
        solved = sum(s.success for s in stats)
        objs = [s.objective if s.success else np.nan for s in stats]
        results[str(budget)] = (iters / wall, solved, objs, iters)
        log(f"predictor_pcg_budget={budget}: {iters / wall:.1f} iter/s, "
            f"{solved}/{args.k} solved, {iters} total iters")

    ref_objs = results[str(budgets[0])][2]
    for budget, (rate, solved, objs, iters) in results.items():
        with np.errstate(invalid="ignore"):
            gap = np.nanmax(
                np.abs(np.array(objs) - np.array(ref_objs))
                / np.maximum(1.0, np.abs(ref_objs))
            )
        print(f"{budget:>6}: {rate:8.1f} iter/s  {solved}/{args.k} solved  "
              f"{iters} iters  max_rel_obj_gap={gap:.2e}", flush=True)


if __name__ == "__main__":
    main()
