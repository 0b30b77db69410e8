"""Device-mesh utilities.

The reference is strictly single-device (SURVEY §2.3: no distributed backend
anywhere); scaling across a TPU pod slice is a new capability of this
framework.  Two axes of parallelism:

- ``batch``: independent problem instances sharded across devices (the
  TPU-native version of the reference's serial benchmark sweeps,
  scripts/benchmarks_cpu.jl:15-58) — rides DCN across hosts.
- ``cols``: the variable dimension of one large instance sharded across
  devices for Schur-complement KKT assembly (parallel/schur.py) — rides ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("batch",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a 1D (or reshaped) mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "batch") -> NamedSharding:
    """Sharding that splits the leading (stacked-instance) dimension."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
