#!/usr/bin/env python
"""Round-3 TPU measurement session (VERDICT round-2 directives #1 and #2).

Tasks (each in its OWN child process with a hard timeout, results appended
to results/round3_tpu.jsonl as they land, so a TPU-worker crash cannot
destroy the session):

  probe               health probe (small matmul, fetched)
  shape:m=..,n=..,k=..,d=..   honest per-run rhs-perturbed protocol at one
                      shape (3 runs, median per-run iters/wall) + an
                      analytic MFU lower bound (assembly+factor MXU passes)
  sparse:...          SparseDeviceQP end-to-end at a tall shape the dense
                      path cannot hold
  4096retry           dense m=4096 k=2 shared-slice, one attempt

Parent process NEVER touches JAX (one-TPU-process rule, CLAUDE.md).

Usage: python scripts/round3_measure.py [--only probe,shapes,...] [--out F]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Child-side implementations
# ---------------------------------------------------------------------------


def _child_setup():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    from madipm_tpu.utils.cache import configure_cache
    configure_cache(jax, backend)
    log(f"child backend={backend} devices={jax.devices()}")
    return jax, backend


def child_probe():
    import numpy as np

    jax, backend = _child_setup()
    import jax.numpy as jnp

    t0 = time.time()
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    y = jnp.dot(x, x, preferred_element_type=jnp.float32)
    s = float(np.asarray(jnp.sum(y.astype(jnp.float32))))
    return {"task": "probe", "backend": backend, "ok": abs(s - 1024**3) < 1,
            "wall_s": round(time.time() - t0, 2)}


def _tpu_opts(mt, refinement=12, share=False, n=2048):
    d = dict(
        tol=1e-8,
        max_iter=300,
        regularization=mt.FixedRegularization(1e-8, -1e-8),
        print_level=mt.PrintLevel.ERROR,
        linear_solver=mt.LinearSolver.CHOLESKY_INV,
        factor_dtype="float32",
        refinement_steps=refinement,
        pcg_adaptive_tol=True,
        predictor_pcg_budget=0,
        # round-4 additions to the adopted config: the corrector-cap
        # loosening bench.py adopted in round 3 (re-confirmed warm
        # order-reversed at m=2048, results/ablate-corrtol-tpu-r4.txt) —
        # product_recurrence=True rides along as the new library default.
        pcg_tol_cap=1e-6,
        # round-5 addition: corrector rtol floor (see bench.py note /
        # scripts/ablate_tolfloor.py).
        pcg_tol_floor=1e-8,
        # round-5: measured-safe slice counts (see bench.py note); the
        # bound 2n*2^-8S scales with n, so n>4096 shapes take 6 slices.
        ozaki_slices=5 if n <= 4096 else 6,
    )
    if share:
        # Shared-slice Ozaki transpose: A'-matvecs reuse the forward
        # slices, halving slice HBM (the k-scaling / m=4096 memory lever).
        d["ozaki_share_slices"] = True
    return d


def _mfu_lb(m, n, iters_total, wall):
    """Analytic LOWER BOUND on MXU utilization from the two precisely
    countable per-iteration dense kernels (per instance-iteration):

      - normal assembly (A*dinv)@A.T at fp32 'highest' = 6 bf16 passes of
        2*m*m*n MACs each -> 12*m^2*n bf16 FLOPs on the MXU,
      - inverse-Cholesky factor build (block_chol.chol_inv): factor +
        explicit inverse ~ 2 * (1/3 + 1/3 + 1/3) m^3 multiply-adds at
        fp32/6-pass -> ~12*m^3 bf16 FLOPs (coarse; recursion constants
        vary by +-30%).

    PCG operator applications (Ozaki slice pairs) and elementwise work are
    EXCLUDED -> the true utilization is strictly higher.  Peak: one v5e
    chip = 197 TFLOP/s bf16.
    """
    per_iter = 12.0 * m * m * n + 12.0 * m ** 3
    total = per_iter * iters_total
    tflops = total / wall / 1e12
    return tflops, tflops / 197.0


def child_shape(m, n, k, density, runs=3, share=False):
    import numpy as np

    jax, backend = _child_setup()
    import madipm_tpu as mt

    sys.path.insert(0, os.path.join(REPO))
    import bench as benchmod

    models = benchmod.make_suite(k=k, n=n, m=m, density=density)
    opts = _tpu_opts(mt, share=share, n=n) if backend != "cpu" else dict(
        tol=1e-8, max_iter=300,
        regularization=mt.FixedRegularization(1e-8, -1e-8),
        print_level=mt.PrintLevel.ERROR,
    )
    iters, wall, stats = benchmod.bench_tpu(models, opts)
    solved = sum(s.success for s in stats)
    rate = iters / wall
    tflops, mfu = _mfu_lb(m, n, iters, wall)
    return {
        "task": f"shape_m{m}_n{n}_k{k}{'_share' if share else ''}", "backend": backend,
        "m": m, "n": n, "k": k, "density": density,
        "iter_per_s": round(rate, 2), "iters": iters,
        "wall_s": round(wall, 4), "solved": solved,
        "per_instance_iters": [int(s.iter) for s in stats],
        "mfu_lb_tflops": round(tflops, 3), "mfu_lb_frac": round(mfu, 5),
    }


def child_sparse(m, n, k, density):
    """Sparse (ELL) path end-to-end on hardware: tall shape where the
    dense padded Jacobian would not be viable."""
    import numpy as np

    jax, backend = _child_setup()
    import jax.numpy as jnp

    import madipm_tpu as mt
    from madipm_tpu.parallel.batch import batched_stats, bucket_pad_sparse
    from madipm_tpu.solver import driver
    from madipm_tpu.utils.options import load_options
    import bench as benchmod

    models = benchmod.make_suite(k=k, n=n, m=m, density=density)
    opts = _tpu_opts(mt, n=n) if backend != "cpu" else dict(
        tol=1e-8, max_iter=300,
        regularization=mt.FixedRegularization(1e-8, -1e-8),
        print_level=mt.PrintLevel.ERROR,
    )
    # Sparse path keeps emulated-fp64 SpMV (gather-bound; CLAUDE.md).
    opt = load_options(**opts)
    from functools import partial
    import dataclasses as _dc

    prob, slacked = bucket_pad_sparse(models)
    cfg = driver.make_config(opt, is_qp=False)

    def _solve(probs_, bscale):
        p = _dc.replace(probs_, b=probs_.b * bscale)
        return jax.vmap(partial(driver.solve_device, cfg))(p)

    fn = jax.jit(_solve)
    t0 = time.time()
    touch = jax.jit(
        lambda p: jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree_util.tree_map(
                lambda x: jnp.sum(
                    jnp.where(jnp.isfinite(x.astype(jnp.float64)), x.astype(jnp.float64), 0.0)
                ),
                p,
            ),
        )
    )
    np.asarray(touch(prob))
    log(f"sparse: input materialization {time.time() - t0:.1f}s")
    t0 = time.time()
    _, scale, state = fn(prob, 1.0)
    np.asarray(state.k)
    log(f"sparse: first run (incl compile) {time.time() - t0:.1f}s")

    walls, iters_each, states = [], [], []
    for r in range(1, 4):
        t0 = time.time()
        _, scale, state = fn(prob, 1.0 + 1e-4 * r)
        per_inst = np.asarray(state.k)
        iters_each.append(int(np.sum(per_inst)))
        walls.append(time.time() - t0)
        states.append(state)
        log(f"sparse: run {r}: {walls[-1]:.3f}s, {iters_each[-1]} iters, "
            f"k={per_inst.tolist()}")
    rates = [i / w for i, w in zip(iters_each, walls)]
    med = int(np.argsort(rates)[len(rates) // 2])
    iters, wall, state = iters_each[med], walls[med], states[med]
    stats = batched_stats(models, scale, state, wall)
    solved = sum(s.success for s in stats)
    # rel-KKT of the returned solutions on the ORIGINAL models.
    worst_kkt = 0.0
    for mdl, s in zip(models, stats):
        if not s.success:
            continue
        x, y, zl, zu = s.solution, s.multipliers, s.multipliers_L, s.multipliers_U
        r_p = np.max(np.abs(mdl.A @ x - mdl.lcon)) / max(1.0, np.max(np.abs(mdl.lcon)))
        r_d = np.max(np.abs(mdl.c + mdl.A.T @ y - zl + zu)) / max(
            1.0, np.max(np.abs(mdl.c)))
        worst_kkt = max(worst_kkt, float(r_p), float(r_d))
    return {
        "task": f"sparse_m{m}_n{n}_k{k}", "backend": backend,
        "m": m, "n": n, "k": k, "density": density,
        "iter_per_s": round(iters / wall, 2), "iters": iters,
        "wall_s": round(wall, 4), "solved": solved,
        "per_instance_iters": [int(s.iter) for s in stats],
        "worst_rel_kkt": worst_kkt,
        "nnz_per_instance": int(models[0].A.nnz),
    }


def child_highs(m, n, k, density, sample):
    """Serial HiGHS-IPM baseline on the SAME suite (CPU; forced off-TPU)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import bench as benchmod

    models = benchmod.make_suite(k=k, n=n, m=m, density=density)[:sample]
    iters, wall, objs = benchmod.bench_cpu_baseline(models)
    return {
        "task": f"highs_m{m}_n{n}", "m": m, "n": n, "sampled": sample,
        "iter_per_s": round(iters / max(wall, 1e-9), 4),
        "iters": iters, "wall_s": round(wall, 2),
    }


# ---------------------------------------------------------------------------
# Parent orchestration
# ---------------------------------------------------------------------------

TASKS = {
    "probe": {"fn": "probe", "args": {}, "timeout": 600},
    # Honest re-measurement of every BASELINE row (rhs-perturbed per-run).
    "shape192": {"fn": "shape", "args": dict(m=192, n=384, k=16, density=0.3), "timeout": 1500},
    "shape512": {"fn": "shape", "args": dict(m=512, n=1024, k=16, density=0.3), "timeout": 1500},
    "shape1024": {"fn": "shape", "args": dict(m=1024, n=2048, k=8, density=0.15), "timeout": 1800},
    "shape2048": {"fn": "shape", "args": dict(m=2048, n=4096, k=8, density=0.1), "timeout": 2400},
    # Batch-size scaling (does throughput rise until the MXU saturates?).
    "k32_1024": {"fn": "shape", "args": dict(m=1024, n=2048, k=32, density=0.15), "timeout": 2400},
    "k64_1024": {"fn": "shape", "args": dict(m=1024, n=2048, k=64, density=0.15), "timeout": 3000},
    "k16_2048": {"fn": "shape", "args": dict(m=2048, n=4096, k=16, density=0.1), "timeout": 3000},
    # Sparse path at a tall shape (dense padded A = m*n*8B = 0.5 GB/inst +
    # 2-copy Ozaki slices would be ~2.3 GB/inst -> dense not viable at k=4).
    "sparse": {"fn": "sparse", "args": dict(m=2048, n=32768, k=4, density=0.004), "timeout": 3000},
    # Reduced-program fallback: the n=32k sparse program crashed the
    # tunneled TPU worker during compile (same environment signature as
    # dense m=4096, 2026-08-21).
    "sparse16k": {"fn": "sparse", "args": dict(m=2048, n=16384, k=2, density=0.006), "timeout": 2400},
    # Dense m=4096 retry (crashed the tunneled worker 3/3 on 2026-08-21 r2).
    "4096retry": {"fn": "shape", "args": dict(m=4096, n=8192, k=2, density=0.05, share=True), "timeout": 2400},
    # Shared-slice retries of the k-scaling points that OOM in the
    # two-copy layout.
    "k64_1024s": {"fn": "shape", "args": dict(m=1024, n=2048, k=64, density=0.15, share=True), "timeout": 3000},
    "4096k4": {"fn": "shape", "args": dict(m=4096, n=8192, k=4, density=0.05, share=True), "timeout": 2400},
    "k16_2048s": {"fn": "shape", "args": dict(m=2048, n=4096, k=16, density=0.1, share=True), "timeout": 3000},
    # HiGHS serial baselines (CPU child; ~6 min/instance at m=2048 -> sample).
    "highs192": {"fn": "highs", "args": dict(m=192, n=384, k=16, density=0.3, sample=16), "timeout": 1800},
    "highs512": {"fn": "highs", "args": dict(m=512, n=1024, k=16, density=0.3, sample=16), "timeout": 1800},
    "highs1024": {"fn": "highs", "args": dict(m=1024, n=2048, k=8, density=0.15, sample=4), "timeout": 2400},
}

ORDER = [
    "probe", "shape192", "shape512", "shape1024", "shape2048",
    "k32_1024", "k64_1024", "k16_2048", "sparse", "4096retry",
    "highs192", "highs512", "highs1024",
]


def run_child(name, spec, out_path):
    payload = json.dumps({"fn": spec["fn"], "args": spec["args"]})
    env = dict(os.environ, MADIPM_R3_CHILD=payload)
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, timeout=spec["timeout"], capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        log(f"[{name}] TIMEOUT after {spec['timeout']}s")
        rec = {"task": name, "error": "timeout", "timeout_s": spec["timeout"]}
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return False
    sys.stderr.write(proc.stderr[-4000:])
    lines = [l for l in proc.stdout.splitlines() if l.strip().startswith("{")]
    if proc.returncode == 0 and lines:
        rec = json.loads(lines[-1])
        rec["name"] = name
        rec["total_child_s"] = round(time.time() - t0, 1)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        log(f"[{name}] OK: {json.dumps(rec)}")
        return True
    log(f"[{name}] FAILED rc={proc.returncode}; stderr tail above")
    rec = {"task": name, "error": f"rc={proc.returncode}",
           "stderr_tail": proc.stderr[-600:]}
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return False


def child_main(payload):
    spec = json.loads(payload)
    fn, args = spec["fn"], spec["args"]
    if fn == "probe":
        rec = child_probe()
    elif fn == "shape":
        rec = child_shape(**args)
    elif fn == "sparse":
        rec = child_sparse(**args)
    elif fn == "highs":
        rec = child_highs(**args)
    else:
        raise SystemExit(f"unknown child fn {fn}")
    print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--only", default=None, help="comma-separated task names")
    ap.add_argument("--out", default=os.path.join(REPO, "results", "round3_tpu.jsonl"))
    args = ap.parse_args()
    names = args.only.split(",") if args.only else ORDER
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    for name in names:
        if name not in TASKS:
            log(f"unknown task {name}; known: {list(TASKS)}")
            continue
        ok = run_child(name, TASKS[name], args.out)
        if name == "probe" and not ok:
            log("health probe failed — aborting the session (bad TPU day)")
            return 1
    return 0


if __name__ == "__main__":
    if os.environ.get("MADIPM_R3_CHILD"):
        child_main(os.environ["MADIPM_R3_CHILD"])
    else:
        sys.exit(main())
