"""Pluggable grid operations: the seam between single-device and mesh-sharded
execution of the physics kernels.

Every hot kernel (`models/ionization._ionize_scan`, `models/spintemp._ts_kernel`,
`models/xray_source._annulus_scan`, ...) takes a `GridOps` static argument and
calls `gops.rfft3 / irfft3 / kmag / mean` instead of the module-level FFT
helpers.  `GridOps(n_shards=1)` reproduces the plain single-device behavior;
`GridOps(n_shards=p)` — valid only INSIDE a `shard_map` over the 1D grid mesh
axis (parallel/mesh.GRID_AXIS) — swaps in the slab-decomposed distributed FFT
(parallel/pfft.py: all_to_all transposes over ICI) and `psum` global means.

This is how the multi-chip driver reuses the exact same physics code instead
of maintaining a parallel re-implementation (round-1 verdict item 3): the
kernels are written once against this interface, and `shard_map` plus a
different `GridOps` instance is the entire difference between one chip and a
pod slice.

`shape` arguments everywhere are the GLOBAL grid shape; inside shard_map the
array arguments are the local shards (x-slabs in real space, ky-shards in
k-space after `rfft3`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import fft, grids


@dataclasses.dataclass(frozen=True)
class GridOps:
    """Hashable (static-arg friendly) dispatcher for grid-global operations."""

    n_shards: int = 1

    @property
    def sharded(self) -> bool:
        return self.n_shards > 1

    def rfft3(self, x):
        if self.sharded:
            from ..parallel import pfft

            return pfft.rfft3(x)
        return fft.rfft3(x)

    def irfft3(self, k, shape):
        if self.sharded:
            from ..parallel import pfft

            return pfft.irfft3(k, shape[2])
        return fft.irfft3(k, shape)

    def kmag(self, shape, box_lens, dtype=jnp.float32):
        if self.sharded:
            from ..parallel import pfft

            return pfft.local_kmag(shape, box_lens, self.n_shards, dtype)
        return grids.kmag_grid(shape, box_lens, dtype)

    def mean(self, x, global_shape):
        """Global mean of a (possibly sharded) real-space grid."""
        if self.sharded:
            from ..parallel.mesh import GRID_AXIS

            n_tot = global_shape[0] * global_shape[1] * global_shape[2]
            return jax.lax.psum(jnp.sum(x), GRID_AXIS) / n_tot
        return jnp.mean(x)


SINGLE = GridOps(1)
