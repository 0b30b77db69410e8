"""Execution statistics.

Analogue of MadNLP's ``MadNLPExecutionStats`` consumed by the reference
(reference: src/solver.jl:366,414 and src/utils.jl:150-156): final status,
objective (unscaled, sign-flipped for maximization), solution, constraint
values, multipliers, iteration count and timers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .status import Status, get_status_output


@dataclasses.dataclass
class IPMStats:
    status: Status
    objective: float
    solution: np.ndarray
    constraints: np.ndarray
    multipliers: np.ndarray  # equality multipliers y (MadNLP sign convention)
    multipliers_L: np.ndarray  # lower-bound duals zl >= 0
    multipliers_U: np.ndarray  # upper-bound duals zu >= 0
    iter: int
    primal_feas: float
    dual_feas: float
    complementarity: float
    total_time: float = 0.0
    init_time: float = 0.0
    solver_time: float = 0.0
    #: wall time in KKT factorizations + solves across the MPC loop — the
    #: reference's MadNLPCounters.linear_solver_time recorded per benchmark
    #: instance (scripts/benchmarks_cpu.jl:50).  Only measured by the timed
    #: driver (solver.driver.solve_timed / MPCSolver.solve(timed=True));
    #: None when the fused device loop ran (phases not separable there).
    linear_solver_time: Optional[float] = None
    dual_objective: Optional[float] = None

    @property
    def success(self) -> bool:
        from .status import SUCCESS_STATUSES

        return self.status in SUCCESS_STATUSES

    def message(self) -> str:
        return get_status_output(self.status)

    def __repr__(self) -> str:  # compact summary like MadNLP's print_summary
        return (
            f"IPMStats(status={Status(self.status).name}, obj={self.objective:.8e}, "
            f"iter={self.iter}, inf_pr={self.primal_feas:.2e}, inf_du={self.dual_feas:.2e}, "
            f"time={self.total_time:.3f}s)"
        )
