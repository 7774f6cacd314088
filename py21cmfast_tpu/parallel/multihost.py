"""Multi-host (multi-process) initialization for pod-scale runs.

The reference scales across nodes with MPI-style manual domain decomposition;
here the whole multi-host story is `jax.distributed` + the same
`jax.sharding.Mesh` used single-host: after `initialize()`, `jax.devices()`
spans every process's chips, `make_mesh()` builds a global mesh over them, and
the shard_map kernels in parallel/ run unchanged — XLA routes the
`all_to_all`/`ppermute` collectives over ICI within a pod slice and DCN across
slices.

Typical pod usage (one process per host, launched by the scheduler):

    from py21cmfast_tpu.parallel import multihost, mesh
    multihost.initialize()              # reads TPU pod env vars
    m = mesh.make_mesh()                # all chips across all hosts
    run_sharded_coeval(inputs, [8.0], mesh=m)

Every process executes the same program; per-host host-side work (table
building) is deterministic and redundant, so no broadcast is needed —
the design is stateless-SPMD (SURVEY.md §2.3, multi-host row).

NOTE on test coverage: this module is exercised single-process only
(tests/test_parallel.py) — the development environment has one TPU chip and
no DCN, so actual multi-process initialization has never run here.  The
code paths beyond `initialize()` are the same mesh/shard_map programs the
virtual-mesh tests cover, but treat multi-host as untested until it has run
on a real pod slice.
"""

from __future__ import annotations

import jax

__all__ = ["initialize", "is_initialized", "process_info"]

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Initialize `jax.distributed` for a multi-process run.

    On TPU pods every argument is auto-detected from the environment
    (`jax.distributed.initialize()` with no args); on CPU/GPU clusters pass
    the coordinator explicitly.  Idempotent: repeated calls are no-ops, so
    drivers can call it defensively.
    """
    global _initialized
    if _initialized:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    _initialized = True


def is_initialized() -> bool:
    return _initialized


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — (0, 1) when single-process."""
    return jax.process_index(), jax.process_count()
