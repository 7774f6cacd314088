"""Device-mesh helpers for grid-domain decomposition.

The 3D simulation boxes are sharded as x-slabs over a 1D mesh axis ("x").
This is the domain analog of sequence parallelism (SURVEY.md §2.3): grids are
Sharded along axis 0, k-space intermediates along axis 1, with `all_to_all`
transposes over ICI inside the distributed FFT (parallel/pfft.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GRID_AXIS = "x"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (GRID_AXIS,))


def slab_sharding(mesh: Mesh) -> NamedSharding:
    """Real-space boxes: sharded along x (axis 0)."""
    return NamedSharding(mesh, P(GRID_AXIS, None, None))


def kspace_sharding(mesh: Mesh) -> NamedSharding:
    """k-space half-boxes: sharded along ky (axis 1) after the FFT transpose."""
    return NamedSharding(mesh, P(None, GRID_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
