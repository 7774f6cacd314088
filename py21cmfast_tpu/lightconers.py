"""Lightconers: interpolate coeval snapshots onto lightcone slices.

Equivalent of reference lightconers.py:35-700.  A `Lightconer` owns the grid of
comoving distances of the lightcone slices; for each pair of adjacent coevals it
emits the slices whose distances fall between them, linearly interpolated in
comoving distance.  The rectilinear variant maps distance -> periodic LoS pixel.
"""

from __future__ import annotations

import numpy as np

from .inputs import InputParameters

__all__ = ["Lightconer", "RectilinearLightconer", "AngularLightconer"]


class Lightconer:
    """Base: holds lc distances + redshifts, provides coeval interpolation."""

    # per-quantity interpolation kind (reference lightconers.py:107-109,
    # 289-318): "mean" = linear in comoving distance; "mean_max" = linear,
    # except where the bracketing values straddle zero take the max (used for
    # z_reion, whose -1 sentinel must not be averaged into real redshifts)
    DEFAULT_INTERP_KINDS = {"z_reion": "mean_max"}

    def __init__(self, lc_distances, quantities=("brightness_temp",),
                 interp_kinds=None):
        self.interp_kinds = dict(self.DEFAULT_INTERP_KINDS)
        if interp_kinds:
            self.interp_kinds.update(interp_kinds)
        self.lc_distances = np.asarray(lc_distances, dtype=np.float64)
        self.quantities = tuple(quantities)
        self._lc_redshifts = None

    @classmethod
    def with_equal_cdist_slices(
        cls,
        min_redshift: float,
        max_redshift: float,
        inputs: InputParameters,
        quantities=("brightness_temp",),
        resolution=None,
    ):
        cosmo = inputs.cosmology
        res = resolution if resolution is not None else (
            inputs.simulation_options.box_len / inputs.simulation_options.HII_DIM
        )
        d_min = cosmo.comoving_distance(min_redshift)
        d_max = cosmo.comoving_distance(max_redshift)
        n = int(np.floor((d_max - d_min) / res)) + 1
        dists = d_min + np.arange(n) * res
        obj = cls(dists, quantities)
        obj._inputs = inputs
        return obj

    def lc_redshifts(self, cosmo):
        if self._lc_redshifts is None:
            z_grid = np.linspace(0.0, 60.0, 4096)
            d_grid = cosmo.comoving_distance(z_grid)
            self._lc_redshifts = np.interp(self.lc_distances, d_grid, z_grid)
        return self._lc_redshifts

    @property
    def n_slices(self):
        return len(self.lc_distances)

    def make_lightcone_slices(self, coeval_low, coeval_high, cosmo, inputs, quantity):
        """Return (slice_indices, values) for lc slices between the two coevals.

        coeval_low is at the lower redshift (smaller distance)."""
        raise NotImplementedError

    def get_field(self, coeval, quantity, device=False):
        """Fetch a named field; `device=True` returns the on-device array
        (avoids the 64 MB/box device-to-host transfer per node — slicing and
        means then run on device and only the slices come back)."""
        if quantity == "brightness_temp":
            out = coeval.brightness_temperature.brightness_temp
        elif quantity == "tau_21":
            out = coeval.brightness_temperature.tau_21
        elif quantity in ("density", "velocity_z", "velocity_x", "velocity_y"):
            out = getattr(coeval.perturbed_field, quantity)
        elif quantity in ("neutral_fraction", "z_reion", "ionisation_rate_G12",
                          "cumulative_recombinations"):
            out = getattr(coeval.ionized_box, quantity)
        elif quantity in ("spin_temperature", "kinetic_temp_neutral",
                          "xray_ionised_fraction", "J_21_LW"):
            if coeval.spin_temp is None:
                raise ValueError(f"{quantity} requires USE_TS_FLUCT")
            out = getattr(coeval.spin_temp, quantity)
        else:
            raise ValueError(f"unknown lightcone quantity {quantity}")
        return out if device else np.asarray(out)



def _interp_slices_padded(box_lo, box_hi, pix, w, *, mean_max):
    """Device-side distance interpolation at a PADDED static slice count.

    `pix`/`w` are padded to a power-of-two length so a whole scroll compiles
    ~4 gather programs instead of one per distinct per-node slice count
    (each remote compile costs seconds on the tunnel)."""
    import jax.numpy as jnp

    lo = box_lo[:, :, pix]
    hi = box_hi[:, :, pix]
    vals = lo * (1 - w)[None, None, :] + hi * w[None, None, :]
    if mean_max:
        straddle = lo * hi < 0
        vals = jnp.where(straddle, jnp.maximum(lo, hi), vals)
    return vals


def _interp_scatter_padded(buf, box_lo, box_hi, pix, w, idx_pad, *, mean_max):
    """Interpolate padded slices and scatter them into the device lightcone
    buffer.  `buf` has one scratch slice at index n_slices that the padding
    tail writes into; it is donated (updated in place in HBM)."""
    vals = _interp_slices_padded(box_lo, box_hi, pix, w, mean_max=mean_max)
    return buf.at[:, :, idx_pad].set(vals)


def _interp_scatter_multi(bufs, boxes_lo, boxes_hi, pix, w, idx_pad, *,
                          mean_max_flags):
    """All quantities of one node pair in a single dispatch: the remote-TPU
    per-dispatch latency (~0.1-0.2 s) dominates the actual slice work, so
    one fused call for (brightness_temp, tau_21, velocity_z, ...) replaces
    n_q separate ones (~0.3-0.6 s/node at the bench config)."""
    return tuple(
        _interp_scatter_padded(b, lo, hi, pix, w, idx_pad, mean_max=mm)
        for b, lo, hi, mm in zip(bufs, boxes_lo, boxes_hi, mean_max_flags)
    )


_SCATTER_MULTI_JIT = None


def _interp_scatter_multi_jit():
    global _SCATTER_MULTI_JIT
    if _SCATTER_MULTI_JIT is None:
        import jax

        _SCATTER_MULTI_JIT = jax.jit(
            _interp_scatter_multi, static_argnames=("mean_max_flags",),
            donate_argnums=(0,),
        )
    return _SCATTER_MULTI_JIT


_SCATTER_JIT = None


def _interp_scatter_jit():
    global _SCATTER_JIT
    if _SCATTER_JIT is None:
        import jax

        _SCATTER_JIT = jax.jit(
            _interp_scatter_padded, static_argnames=("mean_max",),
            donate_argnums=(0,),
        )
    return _SCATTER_JIT


_INTERP_JIT = None


def _interp_slices_jit():
    global _INTERP_JIT
    if _INTERP_JIT is None:
        import functools

        import jax

        _INTERP_JIT = jax.jit(
            _interp_slices_padded, static_argnames=("mean_max",)
        )
    return _INTERP_JIT


class RectilinearLightconer(Lightconer):
    """Slices taken along the box z-axis, periodic tiling in distance
    (reference RectilinearLightconer:483-540)."""

    def _slice_schedule(self, coeval_low, coeval_high, cosmo, inputs):
        """Padded (idx, pix, w) arrays for the slices between two coevals.

        The per-node slice count is padded to power-of-two buckets so a
        whole scroll compiles ~4 gather programs instead of one per count."""
        d_low = cosmo.comoving_distance(coeval_low.redshift)
        d_high = cosmo.comoving_distance(coeval_high.redshift)
        sel = (self.lc_distances >= d_low) & (self.lc_distances < d_high)
        if not np.any(sel):
            return None
        idx = np.where(sel)[0]
        dists = self.lc_distances[idx]

        cell = inputs.simulation_options.box_len / inputs.simulation_options.HII_DIM
        n_los = inputs.simulation_options.lowres_shape[2]
        pix = np.round(dists / cell).astype(np.int32) % n_los
        w = ((dists - d_low) / max(d_high - d_low, 1e-30)).astype(np.float32)

        n = len(idx)
        L = max(4, 1 << int(np.ceil(np.log2(n))))
        pix_pad = np.zeros(L, np.int32)
        pix_pad[:n] = pix
        w_pad = np.zeros(L, np.float32)
        w_pad[:n] = w
        return idx, pix_pad, w_pad

    def make_lightcone_slices_async(
        self, coeval_low, coeval_high, cosmo, inputs, quantity
    ):
        """Launch slice interpolation on device; returns (idx, dev_vals) with
        `dev_vals[..., :len(idx)]` valid once fetched.  The device→host copy
        is started asynchronously so the caller can overlap it with the next
        node's compute and fetch with np.asarray later."""
        sched = self._slice_schedule(coeval_low, coeval_high, cosmo, inputs)
        if sched is None:
            return None, None
        idx, pix_pad, w_pad = sched

        box_lo = self.get_field(coeval_low, quantity, device=True)
        box_hi = self.get_field(coeval_high, quantity, device=True)
        if box_lo is None or box_hi is None:
            # the config doesn't populate this field (e.g. G12 without the
            # inhomogeneous-recombination bookkeeping); leave slices empty
            return None, None

        import jax.numpy as jnp

        vals = _interp_slices_jit()(
            jnp.asarray(box_lo), jnp.asarray(box_hi),
            pix_pad, w_pad,
            mean_max=self.interp_kinds.get(quantity) == "mean_max",
        )
        try:
            vals.copy_to_host_async()
        except Exception:
            pass
        return idx, vals

    def scatter_slices_device(
        self, buf, coeval_low, coeval_high, cosmo, inputs, quantity
    ):
        """Interpolate this node pair's slices and scatter them into the
        on-device lightcone buffer `buf` of shape (N, N, n_slices + 1) —
        the +1 is a scratch slice absorbing the padding tail.  Returns the
        updated buffer (donated: no copy, no device->host traffic)."""
        sched = self._slice_schedule(coeval_low, coeval_high, cosmo, inputs)
        if sched is None:
            return buf
        idx, pix_pad, w_pad = sched
        box_lo = self.get_field(coeval_low, quantity, device=True)
        box_hi = self.get_field(coeval_high, quantity, device=True)
        if box_lo is None or box_hi is None:
            return buf
        idx_pad = np.full(len(pix_pad), self.n_slices, np.int32)
        idx_pad[: len(idx)] = idx
        return _interp_scatter_jit()(
            buf, box_lo, box_hi, pix_pad, w_pad, idx_pad,
            mean_max=self.interp_kinds.get(quantity) == "mean_max",
        )

    def scatter_slices_device_multi(
        self, bufs: dict, coeval_low, coeval_high, cosmo, inputs, quantities
    ):
        """`scatter_slices_device` for every quantity in ONE device dispatch
        (shared slice schedule, fused jit; see _interp_scatter_multi).
        Returns the updated buffer dict."""
        sched = self._slice_schedule(coeval_low, coeval_high, cosmo, inputs)
        if sched is None:
            return bufs
        idx, pix_pad, w_pad = sched
        idx_pad = np.full(len(pix_pad), self.n_slices, np.int32)
        idx_pad[: len(idx)] = idx
        qs = []
        lo, hi = [], []
        for q in quantities:
            box_lo = self.get_field(coeval_low, q, device=True)
            box_hi = self.get_field(coeval_high, q, device=True)
            if box_lo is None or box_hi is None:
                continue
            qs.append(q)
            lo.append(box_lo)
            hi.append(box_hi)
        if not qs:
            return bufs
        flags = tuple(self.interp_kinds.get(q) == "mean_max" for q in qs)
        out = _interp_scatter_multi_jit()(
            tuple(bufs[q] for q in qs), tuple(lo), tuple(hi),
            pix_pad, w_pad, idx_pad, mean_max_flags=flags,
        )
        for q, b in zip(qs, out):
            bufs[q] = b
        return bufs

    def make_lightcone_slices(self, coeval_low, coeval_high, cosmo, inputs, quantity):
        idx, vals = self.make_lightcone_slices_async(
            coeval_low, coeval_high, cosmo, inputs, quantity
        )
        if idx is None:
            return None, None
        return idx, np.asarray(vals, np.float32)[:, :, : len(idx)]


class AngularLightconer(Lightconer):
    """Lightcone on angular sightlines (reference AngularLightconer:541-700).

    Each sightline is a unit vector from the observer; slices are trilinear
    samples of the periodic coeval box at the slice's comoving distance along
    each ray (the role cosmotile plays for the reference).  Without healpy in
    the runtime image, pixelizations are user-provided or generated by
    `like_rectilinear` (a flat-sky bundle matching the rectilinear geometry).
    """

    def __init__(self, lc_distances, sightline_vectors, origin=(0.0, 0.0, 0.0),
                 quantities=("brightness_temp",)):
        super().__init__(lc_distances, quantities)
        self.sightlines = np.asarray(sightline_vectors, dtype=np.float64)  # (npix, 3)
        self.sightlines /= np.linalg.norm(self.sightlines, axis=-1, keepdims=True)
        self.origin = np.asarray(origin, dtype=np.float64)

    @classmethod
    def like_rectilinear(cls, min_redshift, max_redshift, inputs, quantities=("brightness_temp",),
                         opening_angle_deg: float | None = None):
        """Sightline bundle subtending the box's transverse extent at the
        central lightcone distance (reference like_rectilinear:579)."""
        cosmo = inputs.cosmology
        base = Lightconer.with_equal_cdist_slices(
            min_redshift, max_redshift, inputs, quantities
        )
        n = inputs.simulation_options.HII_DIM
        L = inputs.simulation_options.box_len
        d_mid = 0.5 * (base.lc_distances[0] + base.lc_distances[-1])
        half = (
            np.deg2rad(opening_angle_deg) / 2
            if opening_angle_deg is not None
            else np.arctan(L / 2 / d_mid)
        )
        ang = np.linspace(-half, half, n)
        tx, ty = np.meshgrid(ang, ang, indexing="ij")
        vecs = np.stack([np.tan(tx), np.tan(ty), np.ones_like(tx)], axis=-1).reshape(-1, 3)
        obj = cls(base.lc_distances, vecs, quantities=quantities)
        obj.shape2d = (n, n)
        return obj

    def make_lightcone_slices(self, coeval_low, coeval_high, cosmo, inputs, quantity):
        import jax.numpy as jnp

        from .ops import cic

        d_low = cosmo.comoving_distance(coeval_low.redshift)
        d_high = cosmo.comoving_distance(coeval_high.redshift)
        sel = (self.lc_distances >= d_low) & (self.lc_distances < d_high)
        if not np.any(sel):
            return None, None
        idx = np.where(sel)[0]
        dists = self.lc_distances[idx]
        cell = inputs.simulation_options.box_len / inputs.simulation_options.HII_DIM

        # positions along every sightline at each selected distance, in cell units
        pos = (
            self.origin[None, None, :]
            + dists[:, None, None] * self.sightlines[None, :, :]
        ) / cell  # (n_slice, npix, 3)
        lo_np = self.get_field(coeval_low, quantity)
        hi_np = self.get_field(coeval_high, quantity)
        if lo_np is None or hi_np is None:
            return None, None
        box_lo = jnp.asarray(lo_np)
        box_hi = jnp.asarray(hi_np)
        px = jnp.asarray(pos[..., 0])
        py = jnp.asarray(pos[..., 1])
        pz = jnp.asarray(pos[..., 2])
        v_lo = np.asarray(cic.cic_read(box_lo, px, py, pz))
        v_hi = np.asarray(cic.cic_read(box_hi, px, py, pz))
        w = (dists - d_low) / max(d_high - d_low, 1e-30)
        vals = v_lo * (1 - w)[:, None] + v_hi * w[:, None]  # (n_slice, npix)
        return idx, vals.T.astype(np.float32)  # (npix, n_slice) orientation
