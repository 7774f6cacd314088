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
    """Build a 1D device mesh.

    Raises if fewer than `n_devices` devices exist — silently truncating would
    let an "8-device" dryrun quietly run on 1 device (round-1 verdict item 2).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise RuntimeError(
                    f"make_mesh: requested {n_devices} devices but only "
                    f"{len(devices)} available ({devices[0].platform}); for a "
                    "virtual CPU mesh set XLA_FLAGS="
                    "--xla_force_host_platform_device_count=N and "
                    "jax.config.update('jax_platforms', 'cpu') before jax "
                    "initializes its backends"
                )
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
