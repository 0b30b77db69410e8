"""Solver-state checkpoint / warm-start.

The reference has **no** checkpoint/resume (SURVEY §5: "Solver state is one
mutable struct; warm start limited to x0/y0").  Here the iterate is a pytree,
so serialization is trivial and resuming mid-solve is a first-class
capability: save the ``IPMState`` at any point, reload it later (same padded
problem shapes), and continue iterating — or warm-start a *perturbed*
problem from a previous solution.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..solver.state import IPMState


def save_state(path: str, state: IPMState) -> None:
    """Serialize an IPMState to an .npz file."""
    arrays = {f: np.asarray(getattr(state, f)) for f in state._fields}
    np.savez_compressed(path, **arrays)


def load_state(path: str, dtype=jnp.float64) -> IPMState:
    """Load an IPMState saved by :func:`save_state`."""
    data = np.load(path)
    kwargs = {}
    int_fields = ("k", "status", "n_acceptable", "n_stall")
    for f in IPMState._fields:
        if f not in data:
            # Field added after the checkpoint was written
            # (forward-compatible resume): counters restart at 0; the
            # best-primal-residual tracker restarts at "no best yet" so
            # the stall detector cannot misfire on a resumed solve.
            if f in int_fields:
                kwargs[f] = jnp.asarray(0, jnp.int32)
            elif f == "best_pr":
                kwargs[f] = jnp.asarray(jnp.finfo(dtype).max, dtype)
            elif f == "ls_cert":
                kwargs[f] = jnp.asarray(False)
            else:
                kwargs[f] = jnp.asarray(0.0, dtype)
            continue
        arr = data[f]
        if f in int_fields:
            kwargs[f] = jnp.asarray(arr, jnp.int32)
        elif f == "ls_cert":
            kwargs[f] = jnp.asarray(arr, jnp.bool_)
        else:
            kwargs[f] = jnp.asarray(arr, dtype)
    return IPMState(**kwargs)


def resume(solver, state: IPMState):
    """Continue a solve from a checkpointed state.

    ``solver`` is an :class:`~madipm_tpu.api.MPCSolver`; the state must come
    from the same (padded) problem.  Returns IPMStats.
    """
    import time

    from jax import lax

    from ..solver import driver
    from ..utils.status import Status

    cfg, prob = solver.cfg, solver.prob
    t0 = time.time()
    # Re-apply scaling to recover the scaled problem the state refers to.
    prob_s, scale, _ = jax.jit(driver.initialize, static_argnums=0)(cfg, prob)
    # ls_cert is reset regardless of the saved value: a certificate is only
    # valid at the iterate it was measured on, and a stale True from the
    # checkpointed iterate could combine with stall gates evaluated at a
    # different resumed iterate.  The nested loop below re-evaluates it
    # every CERT_PERIOD iterations exactly like solve_device, so a resumed
    # infeasible LP classifies INFEASIBLE_PROBLEM_DETECTED instead of
    # grinding to max_iter (round-2 advisor finding).
    state = state._replace(
        status=jnp.asarray(int(Status.REGULAR), jnp.int32),
        ls_cert=jnp.asarray(False),
    )

    def outer(s):
        s = driver._refresh_cert(cfg, prob_s, s)

        if cfg.product_recurrence:
            # Same carry structure as solve_device: exact A x / A' y at the
            # chunk boundary, recurrence-advanced inside.
            ax = prob_s.matvec(s.x)
            aty = prob_s.rmatvec(s.y)

            def inner_cond(c):
                st, _ax, _aty, i = c
                return (st.status == int(Status.REGULAR)) & (
                    i < driver.CERT_PERIOD
                )

            def inner_body(c):
                st, ax_, aty_, i = c
                st, ax_, aty_ = driver._loop_body(cfg, prob_s, st, ax_, aty_)
                return st, ax_, aty_, i + 1

            s, _, _, _ = lax.while_loop(
                inner_cond, inner_body, (s, ax, aty, jnp.asarray(0))
            )
            return s

        def inner_cond(c):
            st, i = c
            return (st.status == int(Status.REGULAR)) & (i < driver.CERT_PERIOD)

        def inner_body(c):
            st, i = c
            return driver._loop_body(cfg, prob_s, st), i + 1

        s, _ = lax.while_loop(inner_cond, inner_body, (s, jnp.asarray(0)))
        return s

    run = jax.jit(
        lambda s: lax.while_loop(
            lambda st: st.status == int(Status.REGULAR), outer, s
        )
    )
    state = run(state)
    state = jax.tree_util.tree_map(lambda a: a.block_until_ready(), state)
    return solver._build_stats(scale, state, time.time() - t0)


def warm_start_state(solver, x0=None, y0=None, bound_push: float = 1e-4) -> IPMState:
    """Build an interior starting state from a primal/dual guess.

    Unlike the reference (x0/y0 only feed the Mehrotra least-squares init,
    src/solver.jl:127-189), this places the iterate directly at the guess,
    pushed strictly inside the bounds, with complementarity-consistent
    multipliers — useful for re-solving perturbed instances.
    """
    import jax.numpy as jnp

    from ..solver import driver
    from ..solver.state import init_state
    from ..utils.status import Status

    cfg, prob = solver.cfg, solver.prob
    prob_s, scale, st = jax.jit(driver.initialize, static_argnums=0)(cfg, prob)
    if x0 is not None:
        x = jnp.zeros(prob.n, prob.dtype).at[: len(x0)].set(jnp.asarray(x0))
        lb, ub = st.lb, st.ub
        pad = bound_push
        x = jnp.where(prob.has_lb, jnp.maximum(x, lb + pad), x)
        x = jnp.where(prob.has_ub, jnp.minimum(x, ub - pad), x)
        x = jnp.where(prob.free_mask, x, st.x)
        st = st._replace(x=x)
    if y0 is not None:
        y = jnp.zeros(prob.m, prob.dtype).at[: len(y0)].set(jnp.asarray(y0))
        st = st._replace(y=y)
    # Multipliers: z = mu / slack keeps products near the barrier target.
    from ..solver import kernels as K

    sl, su = K.slacks(dataclasses.replace(prob_s, lb=st.lb, ub=st.ub), st.x)
    mu = jnp.asarray(cfg.mu_init, prob.dtype)
    st = st._replace(
        zl=jnp.where(prob.has_lb, mu / jnp.maximum(sl, bound_push), 0.0),
        zu=jnp.where(prob.has_ub, mu / jnp.maximum(su, bound_push), 0.0),
        status=jnp.asarray(int(Status.REGULAR), jnp.int32),
    )
    return st
