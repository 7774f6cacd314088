"""Lightcone driver.

Equivalent of reference drivers/lightcone.py:49-734: scroll the coeval pipeline
down the node redshifts, interpolate each adjacent pair onto lightcone slices,
record global quantities, and at the end apply the velocity-gradient correction
and RSDs along the line of sight.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .. import rsds as rsds_module
from ..inputs import InputParameters
from ..lightconers import Lightconer, RectilinearLightconer
from ..outputs import InitialConditions
from .coeval import generate_coeval

_MEANS_JIT = None  # fused global-quantity means (one dispatch per node)

__all__ = ["LightCone", "run_lightcone", "generate_lightcone"]


@dataclasses.dataclass
class LightCone:
    """Assembled lightcone(s) + global history (reference lightcone.py:49-372)."""

    inputs: InputParameters
    lightconer: Lightconer
    lightcones: dict  # quantity -> (N, N, n_slices)
    global_quantities: dict  # quantity -> array over node redshifts
    node_redshifts: np.ndarray
    log10_mturnovers: np.ndarray | None = None

    @property
    def brightness_temp(self):
        return self.lightcones.get("brightness_temp")

    @property
    def lc_distances(self):
        return self.lightconer.lc_distances

    @property
    def lc_redshifts(self):
        return self.lightconer.lc_redshifts(self.inputs.cosmology)

    @property
    def global_xH(self):
        return self.global_quantities.get("neutral_fraction")

    @property
    def shape(self):
        q = next(iter(self.lightcones.values()))
        return q.shape


def _checkpoint_save(path, inputs, lightcones, gq, last_node: int):
    """Write the partial lightcone + `_last_completed_node` (reference
    lightcone.py:411-463 `LightCone.make_checkpoint`)."""
    if path is None:
        return
    import h5py

    with h5py.File(path, "w") as f:
        f.attrs["full_hash"] = inputs.full_hash
        f.attrs["_last_completed_node"] = last_node
        g = f.create_group("lightcones")
        for q, arr in lightcones.items():
            g.create_dataset(q, data=arr)
        g2 = f.create_group("global_quantities")
        for q, vals in gq.items():
            g2.create_dataset(q, data=np.asarray(vals, np.float64))


def _checkpoint_load(path, inputs, lightcones, gq) -> int:
    """Restore a partial lightcone; returns `_last_completed_node` (-1 if no
    usable checkpoint).  A hash mismatch (different inputs) is ignored."""
    if path is None:
        return -1
    from pathlib import Path

    if not Path(path).exists():
        return -1
    import h5py

    with h5py.File(path, "r") as f:
        if f.attrs.get("full_hash") != inputs.full_hash:
            return -1
        last = int(f.attrs["_last_completed_node"])
        for q in lightcones:
            if q in f["lightcones"]:
                lightcones[q][...] = f["lightcones"][q][...]
        for q in gq:
            if q in f["global_quantities"]:
                gq[q] = list(f["global_quantities"][q][...])
    return last


def generate_lightcone(
    inputs: InputParameters,
    lightconer: Lightconer | None = None,
    max_redshift: float | None = None,
    min_redshift: float | None = None,
    initial_conditions: InitialConditions | None = None,
    global_quantities=("brightness_temp", "neutral_fraction"),
    include_dvdr_in_tau21: bool = True,
    apply_rsds: bool = True,
    cache=None,
    checkpoint_path=None,
):
    """Yield (z, coeval, partial LightCone); final yield carries the finished cone.

    `cache` (an OutputCache) is forwarded to the coeval scroll for per-box
    caching + resume.  `checkpoint_path` additionally checkpoints the partial
    lightcone each node (slices, global quantities, `_last_completed_node`) so
    an interrupted run restarts at the last completed node (reference
    lightcone.py:223-248 and 411-463)."""
    if not inputs.node_redshifts:
        if min_redshift is None:
            raise ValueError("need node_redshifts or min_redshift")
        inputs = inputs.with_logspaced_redshifts(
            min_redshift, max_redshift or inputs.simulation_options.Z_HEAT_MAX
        )
    node_z = np.asarray(inputs.node_redshifts)  # descending

    if lightconer is None:
        lightconer = RectilinearLightconer.with_equal_cdist_slices(
            min_redshift=float(node_z.min()),
            max_redshift=float(node_z.max()),
            inputs=inputs,
            quantities=("brightness_temp",)
            + (("tau_21",) if inputs.astro_options.USE_TS_FLUCT else ()),
        )
    cosmo = inputs.cosmology

    quantities = set(lightconer.quantities)
    if apply_rsds or include_dvdr_in_tau21:
        quantities.add("velocity_z")
    if include_dvdr_in_tau21 and inputs.astro_options.USE_TS_FLUCT:
        # the optically-thin dvdr correction needs tau_21 along the cone
        quantities.add("tau_21")
    quantities = tuple(quantities)

    n_slices = lightconer.n_slices
    shape2d = inputs.simulation_options.lowres_shape[:2]
    lightcones = {
        q: np.zeros(shape2d + (n_slices,), np.float32) for q in quantities
    }
    gq = {q: [] for q in global_quantities}
    prev_coeval = None

    lc = LightCone(
        inputs=inputs,
        lightconer=lightconer,
        lightcones=lightcones,
        global_quantities={},
        node_redshifts=node_z,
    )

    last_completed = _checkpoint_load(checkpoint_path, inputs, lightcones, gq)

    # --- device-side assembly (TPU path) ---------------------------------
    # When no checkpointing or cache-resume interleaves host state, the whole
    # lightcone lives in HBM for the scroll: each node's slices are
    # interpolated AND scattered on device (donated buffers, zero per-node
    # device->host traffic), dvdr/RSD finalization runs on device, and the
    # finished product is fetched once.  Round-tripping ~GB lightcones
    # through the remote-TPU tunnel per node costs ~1-2 s/node + ~100 s at
    # finalization.
    import jax

    n_q = len(quantities)
    dev_bytes = n_q * (np.prod(shape2d) * (n_slices + 1) * 4)
    assemble_on_device = (
        checkpoint_path is None
        and last_completed < 0
        and hasattr(lightconer, "scatter_slices_device")
        and dev_bytes < 6e9
    )
    # dev_lc is allocated LAZILY at its first scatter (node 2): the first
    # node's perturb builds the run-constant deposit channel stack, whose
    # transient peak (hires grid + stack) plus an eager lightcone allocation
    # OOMs a 16 GiB chip at DIM=1024.  By node 2 the MINIMIZE_MEMORY scroll
    # has released the hires grid (drivers/coeval.py release_hires).
    dev_lc: dict = {}

    def _dev_lc_init():
        import jax.numpy as _jnp

        if assemble_on_device and not dev_lc:
            for q in quantities:
                dev_lc[q] = _jnp.zeros(shape2d + (n_slices + 1,), _jnp.float32)

    # async slice plumbing (host path): each node's interpolated slices start
    # their device→host copy immediately but are only consumed one node
    # later, so the ~MB-scale transfers overlap the next node's kernels
    # instead of serializing the scroll.  Checkpointing forces a synchronous
    # drain (the checkpoint must contain everything `_last_completed_node`
    # claims).
    pending_slices: list = []

    def _means_jit():
        global _MEANS_JIT
        if _MEANS_JIT is None:
            _MEANS_JIT = jax.jit(
                lambda arrays: tuple(jnp.mean(a) for a in arrays)
            )
        return _MEANS_JIT

    def _drain():
        for q, idx, vals in pending_slices:
            arr = np.asarray(vals)
            lightcones[q][:, :, idx] = arr[:, :, : len(idx)]
        pending_slices.clear()

    import jax.numpy as jnp

    for i_node, coeval in enumerate(
        generate_coeval(
            inputs, out_redshifts=node_z,
            initial_conditions=initial_conditions, cache=cache,
        )
    ):
        if i_node <= last_completed:
            prev_coeval = coeval  # slices already checkpointed
            yield coeval.redshift, coeval, lc
            continue

        if global_quantities:
            # keep the means as device scalars — fetched at finalization; one
            # dispatch for all of them (remote per-dispatch latency dominates)
            fields = [lightconer.get_field(coeval, q, device=True)
                      for q in global_quantities]
            means = _means_jit()(tuple(fields))
            for q, m in zip(global_quantities, means):
                gq[q].append(m)

        _drain()
        if prev_coeval is not None:
            make_async = getattr(lightconer, "make_lightcone_slices_async", None)
            multi = getattr(lightconer, "scatter_slices_device_multi", None)
            if assemble_on_device:
                _dev_lc_init()
            if assemble_on_device and multi is not None:
                dev_lc = multi(dev_lc, coeval, prev_coeval, cosmo, inputs,
                               quantities)
            for q in (() if (assemble_on_device and multi is not None)
                      else quantities):
                if assemble_on_device:
                    dev_lc[q] = lightconer.scatter_slices_device(
                        dev_lc[q], coeval, prev_coeval, cosmo, inputs, q
                    )
                elif make_async is not None:
                    idx, vals = make_async(coeval, prev_coeval, cosmo, inputs, q)
                    if idx is not None:
                        pending_slices.append((q, idx, vals))
                else:
                    idx, vals = lightconer.make_lightcone_slices(
                        coeval, prev_coeval, cosmo, inputs, q
                    )
                    if idx is not None:
                        lightcones[q][:, :, idx] = vals
        prev_coeval = coeval
        if checkpoint_path is not None:
            _drain()
            _checkpoint_save(
                checkpoint_path, inputs,
                lightcones, {q: [float(v) for v in vs] for q, vs in gq.items()},
                i_node,
            )
        yield coeval.redshift, coeval, lc

    _drain()
    lc.global_quantities = {q: np.array([float(v) for v in vs])
                            for q, vs in gq.items()}

    if assemble_on_device:
        _dev_lc_init()  # no-op unless the scroll had < 2 nodes
        # drop the scratch padding slice; finalization below runs on device
        lightcones = {q: a[:, :, :n_slices] for q, a in dev_lc.items()}
        lc.lightcones = lightcones

    # ----- finalization: dvdr correction + RSDs (lightcone.py:249-372) -----
    lc_z = lightconer.lc_redshifts(cosmo)
    if include_dvdr_in_tau21 and "brightness_temp" in lightcones:
        tau = lightcones.get("tau_21") if inputs.astro_options.USE_TS_FLUCT else None
        lightcones["brightness_temp"] = rsds_module.include_dvdr_in_tau21(
            lightcones["brightness_temp"],
            lightcones["velocity_z"],
            lc_z,
            inputs,
            periodic=False,
            tau_21=tau,
        )
    if apply_rsds and "brightness_temp" in lightcones:
        lightcones["brightness_temp"] = rsds_module.apply_rsds(
            lightcones["brightness_temp"],
            lightcones["velocity_z"],
            lc_z,
            inputs,
            periodic=False,
        )
    if assemble_on_device:
        # single device->host fetch of the finished product
        for q in list(lightcones):
            lightcones[q] = np.asarray(lightcones[q], np.float32)
        lc.lightcones = lightcones
    yield None, None, lc


def run_lightcone(inputs: InputParameters, **kwargs) -> LightCone:
    """Run the full lightcone pipeline (reference run_lightcone:727-734)."""
    lc = None
    for _z, _coeval, lc in generate_lightcone(inputs, **kwargs):
        pass
    return lc
