"""Run a GridOps-aware physics kernel under shard_map.

The model kernels (`_ionize_scan`, `_ts_kernel`, `_annulus_scan`) are written
against the `ops.gridops.GridOps` seam; this module is the only glue needed to
execute them across a device mesh: partition specs are derived from array
shapes (any input/output whose trailing three dims equal the global lowres
grid shape is x-slab sharded; everything else — tables, scalars, per-R stacks
of non-grid data — is replicated), and the kernel runs with the sharded
GridOps, which swaps in the distributed FFT and psum means.

Elementwise stages outside the kernels (brightness temperature, recombination
update, Mcrit grids, ...) need no glue at all: XLA propagates the sharding of
their inputs automatically.
"""

from __future__ import annotations

import jax
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.gridops import GridOps
from .mesh import GRID_AXIS

__all__ = ["sharded_kernel_call"]


def _spec_for(shape, lo_shape):
    shape = tuple(shape)
    if len(shape) >= 3 and shape[-3:] == tuple(lo_shape):
        return P(*([None] * (len(shape) - 3)), GRID_AXIS, None, None)
    return P()


def sharded_kernel_call(mesh, kernel, args, static_kwargs, lo_shape):
    """Invoke `kernel(*args, **static_kwargs, gops=...)` over the mesh.

    `args` must already be device arrays (sharded grids carry their
    NamedSharding; everything else is replicated).  Returns the kernel's
    outputs with grid outputs x-slab sharded."""
    gops = GridOps(mesh.devices.size)
    # per-leaf specs so nested containers (e.g. the accumulator tuple passed
    # between the two Ts kernels) shard their grid leaves individually
    in_specs = jax.tree_util.tree_map(
        lambda a: _spec_for(np.shape(a), lo_shape), tuple(args)
    )
    out_sd = jax.eval_shape(lambda *a: kernel(*a, **static_kwargs), *args)
    out_specs = jax.tree_util.tree_map(
        lambda s: _spec_for(s.shape, lo_shape), out_sd
    )
    fn = shard_map(
        lambda *a: kernel(*a, **static_kwargs, gops=gops),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn)(*args)
