"""Benchmark: IPM throughput on TPU vs reference-style CPU solve.

Protocol mirrors the reference benchmark harness (BASELINE.md,
scripts/benchmarks_gpu.jl:13-65): generate a suite of standard-form LPs at
Netlib scale, run presolve -> scaling -> standard form -> solve with
tol=1e-8, FixedRegularization(1e-8, -1e-8), max_iter=300, and record
per-instance status/iterations/objective/time.

Headline metric: total IPM iterations per second across the suite —
TPU path = all instances vmapped in ONE device program on one chip;
baseline = scipy HiGHS IPM (a production CPU interior-point solver, playing
the reference's CPU/Ma57 role) solving the same instances serially.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": ..., "unit": "iter/s", "vs_baseline": ...}
Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_suite(k=16, n=384, m=192, density=0.3, seed0=1234):
    """Random sparse standard-form-ish LPs, feasible by construction."""
    import madipm_tpu as mt

    models = []
    for i in range(k):
        rng = np.random.default_rng(seed0 + i)
        A = rng.standard_normal((m, n)) * (rng.random((m, n)) < density)
        # keep rows nonempty
        empty = np.flatnonzero(np.abs(A).sum(axis=1) == 0)
        for r in empty:
            A[r, rng.integers(n)] = 1.0
        xstar = rng.random(n) + 0.5
        b = A @ xstar
        c = rng.random(n) + 0.1
        uvar = np.full(n, np.inf)
        ub_idx = rng.random(n) < 0.25
        uvar[ub_idx] = xstar[ub_idx] + 3 * rng.random(ub_idx.sum())
        models.append(
            mt.from_dense(
                c=c, A=A, lcon=b, ucon=b, lvar=np.zeros(n), uvar=uvar,
                name=f"synth{i}",
            )
        )
    return models


def bench_tpu(models, opts):
    """Vmapped single-program solve of the whole suite; returns
    (iters_total, wall_seconds, stats_list). Compile excluded via warmup."""
    from functools import partial

    from madipm_tpu.parallel.batch import bucket_pad, batched_stats
    from madipm_tpu.solver import driver
    from madipm_tpu.utils.options import load_options

    opt = load_options(**opts)
    probs, slacked = bucket_pad(models)
    cfg = driver.make_config(opt, is_qp=False)

    import dataclasses as _dc

    # One jitted executable reused across runs (a fresh jax.jit wrapper per
    # call would retrace + recompile every time).  The rhs perturbation is a
    # traced scalar so repeated timed runs solve genuinely different
    # problems with zero additional host->device traffic.
    def _solve(probs_, bscale):
        p = _dc.replace(probs_, b=probs_.b * bscale)
        return jax.vmap(partial(driver.solve_device, cfg))(p)

    fn = jax.jit(_solve)

    # Materialize every input buffer on device with a REAL host round-trip
    # BEFORE any timing.  On this platform's tunnel, jax.block_until_ready
    # returns early and host->device uploads complete lazily at erratic
    # bandwidth (observed 30-500s for ~15 MB); without this, the first
    # timed run silently pays for the transfers.
    t0 = time.time()
    touch = jax.jit(
        lambda p: jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree_util.tree_map(
                lambda x: jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0).astype(jnp.float64)),
                p,
            ),
        )
    )
    np.asarray(touch(probs))
    log(f"tpu: input materialization {time.time() - t0:.1f}s")

    # Warmup/compile; completion forced with a host fetch (NOT
    # block_until_ready, which lies here).
    t0 = time.time()
    _, scale, state = fn(probs, 1.0)
    np.asarray(state.k)
    compile_and_first = time.time() - t0
    log(f"tpu: first run (incl compile) {compile_and_first:.1f}s")

    # Timed: R back-to-back solves with distinct rhs scalings, each
    # individually synced by fetching the iteration counts.  The headline is
    # the MEDIAN of the per-run iters/wall ratios — pairing each run's
    # iteration count with ITS OWN wall time.  (Round 1 paired mean-iters
    # with median-wall, which inflated the number ~30% whenever one run was
    # slow; see VERDICT.md "What's weak" #1.)
    R = 3
    walls = []
    iters_each = []
    for r in range(1, R + 1):
        t0 = time.time()
        _, scale, state = fn(probs, 1.0 + 1e-4 * r)
        per_inst = np.asarray(state.k)
        iters_each.append(int(np.sum(per_inst)))
        walls.append(time.time() - t0)
        log(f"tpu: run {r}: {walls[-1]:.3f}s, {iters_each[-1]} iters, "
            f"per-instance k={per_inst.tolist()}")
    rates = [i / w for i, w in zip(iters_each, walls)]
    log(f"tpu: per-run rates: {[f'{x:.1f}' for x in rates]}")
    med = int(np.argsort(rates)[len(rates) // 2])
    iters, wall = iters_each[med], walls[med]
    stats = batched_stats(models, scale, state, wall)
    return iters, wall, stats


def bench_cpu_baseline(models):
    """HiGHS IPM on the same instances, serially (reference CPU role)."""
    from scipy.optimize import linprog

    total_iters = 0
    total_time = 0.0
    objs = []
    for mdl in models:
        bounds = [
            (l if np.isfinite(l) else None, u if np.isfinite(u) else None)
            for l, u in zip(mdl.lvar, mdl.uvar)
        ]
        t0 = time.time()
        res = linprog(
            mdl.c,
            A_eq=mdl.A.toarray(),
            b_eq=mdl.lcon,
            bounds=bounds,
            method="highs-ipm",
        )
        total_time += time.time() - t0
        total_iters += int(getattr(res, "nit", 0) or 0)
        objs.append(res.fun if res.status == 0 else np.nan)
    return total_iters, total_time, objs


def main():
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache
    configure_cache(jax, backend)
    log(f"backend: {backend}, devices: {jax.devices()}")

    # Headline point picked by scripts/size_sweep.py (measured on one v5e):
    # the TPU advantage grows with size — 5.9x at m=192, 14.9x at m=512,
    # 21.3x at m=1024 — while keeping the full suite + serial HiGHS baseline
    # run comfortably inside the driver's per-attempt timeout.
    k, n, m, density = 8, 2048, 1024, 0.15
    models = make_suite(k=k, n=n, m=m, density=density)

    import madipm_tpu as mt

    opts = dict(
        tol=1e-8,
        max_iter=300,
        regularization=mt.FixedRegularization(1e-8, -1e-8),
        print_level=mt.PrintLevel.ERROR,
    )
    if backend != "cpu":
        # TPU config: fp32 MXU factorization via the matmul-only recursive
        # inverse-Cholesky (no lax.linalg triangular solves, which compile
        # to enormous emulated-fp64 programs on TPU) + fp64 refinement.
        opts["linear_solver"] = mt.LinearSolver.CHOLESKY_INV
        opts["factor_dtype"] = "float32"
        # PCG budget (corrector cap = 4x).  12, not 6: healthy lanes exit on
        # rtol after 1-2 iterations either way, but at 6 the rhs-perturbed
        # runs ground 84-110 iterations at the barrier floor (budget-bound,
        # not tolerance-bound) — at 12 they solve in ~21 like everyone else
        # (scripts/ablate_robust2048.py / ablate_budget1024.py).
        opts["refinement_steps"] = 12
        # Inexact-Newton PCG tolerances (mu-proportional, clamped at
        # 1e-11/1e-13): measured +56% iter/s over fixed 1e-12/1e-14 exits
        # at this shape with objectives unchanged to 2e-9 (scripts/ablate.py).
        opts["pcg_adaptive_tol"] = True
        # Preconditioner-only predictor: the affine solve applies the fp32
        # factor and skips the fp64 PCG (no operator application) — the
        # centering heuristics it feeds only need a few digits.  Measured
        # +27% (m=1024) / +22% (m=2048) at 8/8 solved under the perturbed
        # protocol, objectives unchanged to 7e-9; iteration counts grow
        # ~7% and the wall still wins (scripts/ablate_predictor.py).
        opts["predictor_pcg_budget"] = 0
        # Loosen the corrector's adaptive-rtol upper clamp (default 1e-9):
        # early/mid iterations exit the PCG right after the factor-solve +
        # residual check instead of polishing to 1e-9.  Marginal but
        # consistently positive (+1-2% at m=1024/m=2048, 8/8 solved,
        # objectives unchanged to 6.5e-9, iteration counts equal or lower;
        # results/ablate-corrtol-tpu.txt) — the fp32 factor already exits
        # the corrector PCG in ~1 iteration, so little was left to save.
        opts["pcg_tol_cap"] = 1e-6
        # Round-5: raise the corrector rtol LOWER clamp from 1e-13 to 1e-8.
        # The trajectory profile (scripts/diag_trips.py) put ~78% of device
        # time in the last ~10 iterations, where clip(0.01*mu, floor, cap)
        # rode the 1e-13 floor against the weakening fp32 preconditioner.
        # Floor sweep (scripts/ablate_tolfloor.py, child process/config):
        # m=1024x8 380.5 -> 425.7 iter/s (+12%, 176 iters at BOTH, 8/8,
        # objectives bit-identical); m=2048x8 82.9 -> 86.0 (188 vs 185
        # iters); 1e-7 over-loosens (191 iters, 353).  Known-optimum
        # certificate unchanged at the loosened floor: 16/16, worst
        # rel-KKT 9.7e-9 (results/known-optimum-tpu-floor1e8.txt).
        opts["pcg_tol_floor"] = 1e-8
        # Round-5: 5 Ozaki slices (25 MXU pass-pairs instead of 49).  The
        # operator error bound 2n*2^-40 is ~3.7e-9*rowmax*|x| at n=2048 —
        # nominally near tol, but measured: identical known-optimum
        # certificate (16/16, worst rel-KKT 9.728e-9 at S=5/6/7 alike; the
        # binding error is the fp32-factor PCG floor, not the matvec),
        # identical objectives, iters 176->178, and 425.7 -> 488.3 iter/s
        # at m=1024 / 86.0 -> 106.8 at m=2048.  Shapes with n > 4096
        # should use 6 (bound 6e-11 at n=8192); library default stays 7
        # (exact for arbitrary n).
        opts["ozaki_slices"] = 5

    iters, wall, stats = bench_tpu(models, opts)
    solved = sum(s.success for s in stats)
    log(f"tpu: {solved}/{k} solved, {iters} total iters in {wall:.3f}s "
        f"-> {iters / wall:.1f} iter/s")

    cpu_iters, cpu_time, cpu_objs = bench_cpu_baseline(models)
    log(f"cpu(highs-ipm): {cpu_iters} iters in {cpu_time:.3f}s "
        f"-> {cpu_iters / max(cpu_time, 1e-9):.1f} iter/s")

    # Correctness cross-check
    max_gap = 0.0
    for s, ref_obj in zip(stats, cpu_objs):
        if s.success and np.isfinite(ref_obj):
            max_gap = max(max_gap, abs(s.objective - ref_obj) / max(1.0, abs(ref_obj)))
    log(f"max relative objective gap vs HiGHS: {max_gap:.2e}")

    value = iters / wall
    baseline = cpu_iters / max(cpu_time, 1e-9)
    out = {
        "metric": f"ipm_iterations_per_sec_batch{k}_m{m}_n{n}_{backend}",
        "value": round(value, 2),
        "unit": "iter/s",
        "vs_baseline": round(value / baseline, 3) if baseline > 0 else None,
        "solve_rate": solved / k,
        "max_rel_obj_gap": max_gap,
    }
    print(json.dumps(out), flush=True)


def _run_with_retries(attempts: int = 3, timeout_s: int = 1200) -> int:
    """Re-exec the benchmark in a child process with a hard timeout, retrying
    on hangs.  The TPU tunnel in this environment intermittently stalls a
    device RPC forever; a fresh process re-attaches cleanly and the
    persistent compilation cache makes retries cheap."""
    import os
    import subprocess

    env = dict(os.environ, MADIPM_BENCH_CHILD="1")
    for attempt in range(1, attempts + 1):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                timeout=timeout_s,
                capture_output=True,
                text=True,
            )
        except subprocess.TimeoutExpired:
            log(f"bench attempt {attempt} timed out after {timeout_s}s; retrying")
            continue
        sys.stderr.write(proc.stderr)
        lines = [l for l in proc.stdout.splitlines() if l.strip().startswith("{")]
        if proc.returncode == 0 and lines:
            print(lines[-1], flush=True)
            return 0
        log(f"bench attempt {attempt} failed (rc={proc.returncode})")
    log("all bench attempts failed")
    return 1


if __name__ == "__main__":
    import os

    if os.environ.get("MADIPM_BENCH_CHILD"):
        main()
    else:
        sys.exit(_run_with_retries())
