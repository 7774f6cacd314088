"""Perturbed (Eulerian) density + velocity fields at a given redshift.

TPU-native equivalent of reference PerturbedField.c:389-496 + map_mass.c:146-208.
The hires IC "particles" (one per hires cell, mass 1 + delta*D_init) are moved by
the (2)LPT displacement and CIC-deposited on the output grid.  The particle loop
becomes a `lax.scan` over x-slabs of the hires grid, each slab doing vectorized
gathers (displacement lookup) + 8 scatter-adds — bounded memory, no atomics.

Normalization chain (lowres path):
  grid = CIC(1 + delta_hi * D_init)            [sum of masses per cell]
  1+delta = grid * HII^3/DIM^3 ; delta = .. - 1
  optional gaussian smoothing; clip at -1+eps
Velocities:  v_i(k) = dD/dt / D * i k_i / k^2 * delta(k)   [comoving Mpc/s]
(reference compute_perturbed_velocities:284-388).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cosmology.constants import FRACT_FLOAT_ERR
from ..inputs import InputParameters
from ..ops import cic, fft, filters, grids
from ..outputs import InitialConditions, PerturbedField

__all__ = ["perturb_field"]


def _displacement_factors(inputs: InputParameters, redshift: float):
    cosmo = inputs.cosmology
    so = inputs.simulation_options
    D = float(cosmo.dicke(redshift))
    D_init = float(cosmo.dicke(so.INITIAL_REDSHIFT))
    fac_za = D - D_init
    # 2LPT displacement is psi2 * (-3/7) D^2 (Scoccimarro 1998 eq. D8);
    # the reference subtracts, with the same form evaluated at both z's.
    fac_2lpt = (-3.0 / 7.0) * (D**2 - D_init**2)
    return D, D_init, fac_za, fac_2lpt


@partial(
    jax.jit,
    static_argnames=(
        "hi_shape",
        "pt_shape",
        "out_shape",
        "box_lens",
        "use_2lpt",
        "n_slabs",
        "window_rows",
        "margin",
    ),
)
def _displace_and_deposit(
    hires_density,
    vel,
    vel_2lpt,
    d_init,
    fac_za,
    fac_2lpt,
    *,
    hi_shape,
    pt_shape,
    out_shape,
    box_lens,
    use_2lpt,
    n_slabs,
    window_rows=None,
    margin=0,
):
    """Move hires cell masses by the scaled displacement; CIC onto out grid.

    Deposition accumulates in float32; the mean-fix global sums downstream are
    done in float64 on host to preserve the reference's double accumulation
    (PerturbedField.c:100-104) where it matters.
    """
    nx, ny, nz = hi_shape
    vx, vy, vz = vel
    ratio_out = out_shape[0] / hi_shape[0]
    ratio_out_z = out_shape[2] / hi_shape[2]

    # displacement -> hires-cell units (map_mass.c:164-171), then -> out units
    disp_scale = jnp.asarray(
        [fac_za * hi_shape[i] / box_lens[i] for i in range(3)], dtype=jnp.float32
    )
    disp_scale_2 = jnp.asarray(
        [fac_2lpt * hi_shape[i] / box_lens[i] for i in range(3)], dtype=jnp.float32
    )

    # index maps hires -> pt grid (for reading displacement at particle location),
    # mirroring reference resample_index + wrap (map_mass.c:186-188)
    map_x = jnp.asarray(((np.arange(nx) * (pt_shape[0] / nx) + 0.5).astype(np.int32)) % pt_shape[0])
    map_y = jnp.asarray(((np.arange(ny) * (pt_shape[1] / ny) + 0.5).astype(np.int32)) % pt_shape[1])
    map_z = jnp.asarray(((np.arange(nz) * (pt_shape[2] / nz) + 0.5).astype(np.int32)) % pt_shape[2])

    slab = nx // n_slabs
    iy = jnp.arange(ny, dtype=jnp.float32)[:, None]
    iz = jnp.arange(nz, dtype=jnp.float32)[None, :]
    vy_g = jnp.take(map_y, jnp.arange(ny))
    vz_g = jnp.take(map_z, jnp.arange(nz))

    # When hires/pt is an integer ratio k, the resample map int(i/k + 0.5) is
    # a strided upsample == roll(repeat(v, k), -(k//2)) — dense copies instead
    # of grid-scale gathers (gathers run near-scalar on TPU, ~145M elem/s).
    k_up = nx // pt_shape[0] if nx % pt_shape[0] == 0 else 0
    structured = (
        k_up > 0
        and ny % pt_shape[1] == 0 and ny // pt_shape[1] == k_up
        and nz % pt_shape[2] == 0 and nz // pt_shape[2] == k_up
        and slab % max(k_up, 1) == 0
    )

    def body(acc_flat, s):
        x0 = s * slab
        xs = x0 + jnp.arange(slab)
        ix = xs.astype(jnp.float32)[:, None, None]
        pxi = jnp.take(map_x, xs)  # pt-grid x indices for this slab

        if structured and k_up > 1:
            def g(v):
                # x: slice the needed pt rows (+1 for the half-cell shift,
                # with periodic pad), upsample, trim the k//2 offset
                v_pad = jnp.concatenate([v, v[:1]], axis=0)
                row0 = s * (slab // k_up)
                vr = jax.lax.dynamic_slice_in_dim(
                    v_pad, row0, slab // k_up + 1, axis=0
                )
                u = jnp.repeat(vr, k_up, axis=0)
                u = jax.lax.dynamic_slice_in_dim(u, k_up // 2, slab, axis=0)
                u = jnp.roll(jnp.repeat(u, k_up, axis=1), -(k_up // 2), axis=1)
                u = jnp.roll(jnp.repeat(u, k_up, axis=2), -(k_up // 2), axis=2)
                return u
        elif structured:  # k_up == 1: identity resample
            def g(v):
                return jax.lax.dynamic_slice_in_dim(v, x0, slab, axis=0)
        else:
            def g(v):
                return v[pxi][:, vy_g][:, :, vz_g]

        px = ix + g(vx) * disp_scale[0]
        py = iy[None] + g(vy) * disp_scale[1]
        pz = iz[None] + g(vz) * disp_scale[2]
        if use_2lpt:
            v2x, v2y, v2z = vel_2lpt
            px = px - g(v2x) * disp_scale_2[0]
            py = py - g(v2y) * disp_scale_2[1]
            pz = pz - g(v2z) * disp_scale_2[2]

        mass = 1.0 + jax.lax.dynamic_slice_in_dim(hires_density, x0, slab, axis=0) * d_init
        if window_rows is None:
            acc_flat = cic.cic_scatter_flat(
                acc_flat,
                px * ratio_out,
                py * ratio_out,
                pz * ratio_out_z,
                mass,
                out_shape,
            )
            return acc_flat, None
        # windowed deposit: scatter into a small slab-local buffer (the XLA
        # scatter primitive runs ~2x faster into a VMEM-scale target than
        # into the full grid), then roll-add the dense window into the
        # accumulator.  `window_rows` bounds slab extent + |x displacement|.
        slab_out = out_shape[0] // n_slabs
        px_w = px * ratio_out - (s * slab_out - margin).astype(jnp.float32)
        buf = jnp.zeros(window_rows * out_shape[1] * out_shape[2], jnp.float32)
        buf = cic.cic_scatter_window(
            buf, px_w, py * ratio_out, pz * ratio_out_z, mass,
            (window_rows, out_shape[1], out_shape[2]),
        )
        padded = jnp.zeros_like(acc_flat).reshape(out_shape)
        padded = jax.lax.dynamic_update_slice_in_dim(
            padded, buf.reshape(window_rows, out_shape[1], out_shape[2]), 0, axis=0
        )
        padded = jnp.roll(padded, s * slab_out - margin, axis=0)
        return acc_flat + padded.reshape(-1), None

    acc = jnp.zeros(int(np.prod(out_shape)), dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, acc, jnp.arange(n_slabs))
    return acc.reshape(out_shape)


@partial(
    jax.jit,
    static_argnames=("lo_shape", "box_lens", "smooth", "smooth_R", "need_xy"),
)
def _finalize_density_and_velocity(
    grid_1pd, mass_factor, dDdt_over_D, *, lo_shape, box_lens, smooth, smooth_R, need_xy
):
    """(1+delta) normalization, optional smoothing, clipping, k-space velocities."""
    delta = grid_1pd * mass_factor - 1.0
    d_k = fft.rfft3(delta)
    if smooth:
        kmag = grids.kmag_grid(lo_shape, box_lens)
        d_k = filters.filter_kbox(d_k, kmag, filters.GAUSSIAN, smooth_R)
    delta = fft.irfft3(d_k, lo_shape)
    delta = jnp.maximum(delta, -1.0 + FRACT_FLOAT_ERR)

    kx, ky, kz = grids.k_axes(lo_shape, box_lens)
    ksq = grids.ksq_grid(lo_shape, box_lens)
    ksq_safe = jnp.where(ksq > 0, ksq, 1.0)

    def vel_axis(kvec):
        v_k = d_k * (1j * kvec * dDdt_over_D / ksq_safe)
        v_k = jnp.where(ksq > 0, v_k, 0.0)
        return fft.irfft3(v_k, lo_shape)

    v_z = vel_axis(kz[None, None, :])
    v_x = vel_axis(kx[:, None, None]) if need_xy else None
    v_y = vel_axis(ky[None, :, None]) if need_xy else None
    return delta, v_x, v_y, v_z


# Run-level cache for the Pallas deposit's channel stack: it depends only on
# (hires ICs, ratio, D_init), not the node, so one relayout serves the whole
# redshift scroll.  Single slot; identity checked via weakref to the hires
# array (a new run evicts the old stack).
_CHAN_CACHE: dict = {}


def _channel_stack_for(ics, ratio: int, d_init, lo_shape):
    import weakref

    from ..ops.pallas_deposit import build_channel_stack

    ent = _CHAN_CACHE.get("v")
    if (
        ent is not None
        and ent[0]() is ics.hires_density
        and ent[1] == (ratio, float(d_init))
    ):
        return ent[2]
    stack = build_channel_stack(
        ics.hires_density, jnp.float32(d_init), ratio=ratio,
        lo_shape=tuple(lo_shape),
    )
    _CHAN_CACHE["v"] = (
        weakref.ref(ics.hires_density), (ratio, float(d_init)), stack
    )
    return stack


def _pallas_deposit(ics, d_fields, d_init, *, ratio, support, cap, lo_shape):
    """Dense pass through the Pallas kernel + exact scatter for outliers."""
    from ..ops.pallas_deposit import build_dok_stack, pallas_factored_deposit
    from ..ops.sep_deposit import _bad_mask

    if cap > 0:
        bad = _bad_mask(d_fields, ratio=ratio, support=support)
        ok = (~bad).astype(jnp.float32)
    else:
        bad, ok = None, jnp.ones(tuple(lo_shape), jnp.float32)
    dok = build_dok_stack(d_fields[0], d_fields[1], d_fields[2], ok)
    chan = _channel_stack_for(ics, ratio, d_init, lo_shape)
    acc = pallas_factored_deposit(
        chan, dok, ratio=ratio, support=support, lo_shape=tuple(lo_shape)
    )
    if cap > 0:
        from ..ops.pallas_deposit import outlier_scatter_from_stack

        acc = outlier_scatter_from_stack(
            acc, chan, d_fields, bad,
            ratio=ratio, cap=cap, lo_shape=tuple(lo_shape),
        )
    return acc


@partial(jax.jit, static_argnames=("cells_per_mpc", "use_2lpt"))
def _displacement_cells(vx, vy, vz, v2x, v2y, v2z, fac_za, fac_2lpt,
                        *, cells_per_mpc, use_2lpt):
    """Displacement fields in lowres-cell units for the swept deposit.

    Module-level jit with the growth factors traced: one compiled program
    serves every node of a scroll (a per-call closure would re-trace each
    node)."""
    out = []
    for a, (v, v2) in enumerate(((vx, v2x), (vy, v2y), (vz, v2z))):
        da = v * (fac_za * cells_per_mpc[a])
        if use_2lpt:
            da = da - v2 * (fac_2lpt * cells_per_mpc[a])
        out.append(da)
    return tuple(out)


def uses_swept_deposit(inputs: InputParameters) -> bool:
    """True when perturb_field will take the swept (factored/Pallas) deposit
    path, i.e. when a run-level deposit plan applies."""
    so = inputs.simulation_options
    mo = inputs.matter_options
    hi_shape, lo_shape = so.hires_shape, so.lowres_shape
    ratio_int = hi_shape[0] // lo_shape[0]
    return (
        mo.PERTURB_ALGORITHM != "LINEAR"
        and mo.PERTURB_DEPOSIT == "SWEPT"
        and not mo.PERTURB_ON_HIGH_RES
        and all(h == ratio_int * l for h, l in zip(hi_shape, lo_shape))
    )


def plan_deposit_for_run(inputs: InputParameters, ics: InitialConditions,
                         z_min: float):
    """Pick one (support, cap) deposit plan for a whole redshift scroll.

    Displacements scale with |fac_za(z)| (monotonically growing as z falls),
    so the stats at the LOWEST node bound every node: one device sync at
    setup replaces a per-node stats fetch AND pins the jit static args
    (support, cap) for the whole run — the per-node support stepping at low
    z otherwise recompiles the deposit kernels mid-scroll (~30-40 s bursts
    on the remote-compile path)."""
    from ..ops.deposit import deposit_plan, displacement_stats

    so = inputs.simulation_options
    mo = inputs.matter_options
    lo_shape = so.lowres_shape
    box_lens = so.box_lens
    _, _, fac_za, fac_2lpt = _displacement_factors(inputs, z_min)
    cells_per_mpc = tuple(lo_shape[a] / box_lens[a] for a in range(3))

    use_2lpt = mo.PERTURB_ALGORITHM == "2LPT" and ics.vx_2LPT is not None
    v2 = (
        (ics.vx_2LPT, ics.vy_2LPT, ics.vz_2LPT)
        if use_2lpt
        else (ics.vx, ics.vy, ics.vz)  # unused when use_2lpt is False
    )
    d_fields = _displacement_cells(
        ics.vx, ics.vy, ics.vz, *v2,
        jnp.float32(fac_za), jnp.float32(fac_2lpt),
        cells_per_mpc=cells_per_mpc, use_2lpt=use_2lpt,
    )
    bad_counts, dmax = displacement_stats(d_fields)
    return deposit_plan(bad_counts, float(dmax), int(np.prod(lo_shape)))


# run-level cache of max |psi| per ICs instance (the displacement bound only
# depends on the velocity fields, not the node) — avoids two device syncs
# per node on the windowed-deposit path
_MAXPSI_CACHE: dict = {}


def _max_psi_for(ics) -> tuple[float, float]:
    import weakref

    ent = _MAXPSI_CACHE.get("v")
    if ent is not None and ent[0]() is ics.vx:
        return ent[1]
    m1 = float(jax.jit(lambda v: jnp.max(jnp.abs(v)))(ics.vx))
    m2 = (
        float(jax.jit(lambda v: jnp.max(jnp.abs(v)))(ics.vx_2LPT))
        if ics.vx_2LPT is not None
        else 0.0
    )
    _MAXPSI_CACHE["v"] = (weakref.ref(ics.vx), (m1, m2))
    return m1, m2


def perturb_field(
    redshift: float, inputs: InputParameters, ics: InitialConditions,
    deposit_plan=None,
) -> PerturbedField:
    """Compute the Eulerian density/velocity at `redshift` from the ICs.

    `deposit_plan` — optional (support, cap) from `plan_deposit_for_run`;
    when given, the per-node displacement-stats device sync is skipped and
    the deposit kernels keep one compiled variant for the whole scroll."""
    so = inputs.simulation_options
    mo = inputs.matter_options
    cosmo = inputs.cosmology
    hi_shape = so.hires_shape
    lo_shape = so.lowres_shape
    pt_shape = hi_shape if mo.PERTURB_ON_HIGH_RES else lo_shape
    out_shape = pt_shape  # deposit on the same grid the velocities live on
    box_lens = so.box_lens

    D, D_init, fac_za, fac_2lpt = _displacement_factors(inputs, redshift)
    dDdt_over_D = float(cosmo.ddicke_dt(redshift) / D)

    if mo.PERTURB_ALGORITHM == "LINEAR":
        delta_pt = ics.lowres_density * jnp.float32(D)
        grid_1pd = delta_pt + 1.0
        mass_factor = 1.0
    else:
        ratio_int = hi_shape[0] // lo_shape[0]
        use_swept = (
            mo.PERTURB_DEPOSIT == "SWEPT"
            and not mo.PERTURB_ON_HIGH_RES
            and out_shape == lo_shape
            and pt_shape == lo_shape
            and all(h == ratio_int * l for h, l in zip(hi_shape, lo_shape))
        )
        if use_swept:
            from ..ops.sep_deposit import staged_factored_deposit

            cells_per_mpc = tuple(out_shape[a] / box_lens[a] for a in range(3))
            use_2lpt = (
                mo.PERTURB_ALGORITHM == "2LPT" and ics.vx_2LPT is not None
            )
            v2 = (
                (ics.vx_2LPT, ics.vy_2LPT, ics.vz_2LPT)
                if use_2lpt
                else (None, None, None)
            )
            d_fields = _displacement_cells(
                ics.vx, ics.vy, ics.vz,
                *(v2 if use_2lpt else (ics.vx, ics.vy, ics.vz)),
                jnp.float32(fac_za), jnp.float32(fac_2lpt),
                cells_per_mpc=cells_per_mpc, use_2lpt=use_2lpt,
            )
            if deposit_plan is not None:
                support, cap = deposit_plan
            else:
                from ..ops.deposit import deposit_plan as _plan
                from ..ops.deposit import displacement_stats

                # per-node displacement stats (one reduction + scalar fetch);
                # scrolling drivers precompute a run-level plan instead
                bad_counts, dmax = displacement_stats(d_fields)
                support, cap = _plan(
                    bad_counts, float(dmax), int(np.prod(lo_shape))
                )
            # Pallas kernel needs tile-aligned lane extents (z % 128); smaller
            # boxes (e.g. gold-parity 50^3) take the staged XLA path instead
            use_pallas = (
                jax.devices()[0].platform == "tpu"
                and support <= 3
                and lo_shape[2] % 128 == 0
                and lo_shape[0] % 8 == 0
                and lo_shape[1] % 8 == 0
            )
            if use_pallas:
                grid_1pd = _pallas_deposit(
                    ics, d_fields, jnp.float32(D_init),
                    ratio=ratio_int, support=support, cap=cap,
                    lo_shape=lo_shape,
                )
            else:
                grid_1pd = staged_factored_deposit(
                    ics.hires_density,
                    (ics.vx, ics.vy, ics.vz),
                    v2 if v2[0] is not None else None,
                    jnp.float32(D_init),
                    jnp.float32(fac_za),
                    jnp.float32(fac_2lpt),
                    cells_per_mpc,
                    ratio=ratio_int,
                    support=support,
                    cap=cap,
                    lo_shape=lo_shape,
                )
            mass_factor = float(np.prod(out_shape) / np.prod(hi_shape))
        else:
            # slabs sized to keep the particle working set ~16M cells
            per_slab = max(1, int(2**24 // (hi_shape[1] * hi_shape[2])))
            n_slabs = max(1, hi_shape[0] // per_slab)
            while hi_shape[0] % n_slabs:
                n_slabs += 1
            # windowed-deposit margin: bound the x displacement in out-grid
            # cells (run-cached max|psi|; rounded up to multiples of 8 to
            # bound the number of compiled variants)
            max_psi, max_psi2 = _max_psi_for(ics)
            max_disp = abs(fac_za) * max_psi * out_shape[0] / box_lens[0]
            if mo.PERTURB_ALGORITHM == "2LPT" and ics.vx_2LPT is not None:
                max_disp += abs(fac_2lpt) * max_psi2 * out_shape[0] / box_lens[0]
            margin = ((int(np.ceil(max_disp)) + 2 + 7) // 8) * 8
            slab_out = out_shape[0] // n_slabs
            window_rows = slab_out + 2 * margin
            if window_rows >= out_shape[0] or out_shape[0] % n_slabs:
                window_rows, margin = None, 0

            grid_1pd = _displace_and_deposit(
                ics.hires_density,
                (ics.vx, ics.vy, ics.vz),
                (ics.vx_2LPT, ics.vy_2LPT, ics.vz_2LPT)
                if mo.PERTURB_ALGORITHM == "2LPT"
                else (ics.vx, ics.vy, ics.vz),
                jnp.float32(D_init),
                jnp.float32(fac_za),
                jnp.float32(fac_2lpt),
                hi_shape=hi_shape,
                pt_shape=pt_shape,
                out_shape=out_shape,
                box_lens=box_lens,
                use_2lpt=mo.PERTURB_ALGORITHM == "2LPT",
                n_slabs=n_slabs,
                window_rows=window_rows,
                margin=margin,
            )
            mass_factor = float(np.prod(out_shape) / np.prod(hi_shape))

    if mo.PERTURB_ON_HIGH_RES and out_shape != lo_shape:
        # filter the hires (1+delta) field down to lowres before normalization
        from ..cosmology.constants import physconst

        d_k = fft.rfft3(grid_1pd)
        kmag = grids.kmag_grid(out_shape, box_lens)
        d_k = filters.filter_kbox(
            d_k, kmag, filters.TOPHAT, physconst.l_factor * box_lens[0] / lo_shape[0]
        )
        grid_1pd = grids.subsample(fft.irfft3(d_k, out_shape), lo_shape)
        mass_factor = 1.0

    delta, v_x, v_y, v_z = _finalize_density_and_velocity(
        grid_1pd,
        jnp.float32(mass_factor),
        jnp.float32(dDdt_over_D),
        lo_shape=lo_shape,
        box_lens=box_lens,
        smooth=mo.SMOOTH_EVOLVED_DENSITY_FIELD,
        smooth_R=so.DENSITY_SMOOTH_RADIUS * so.box_len / so.HII_DIM,
        need_xy=mo.KEEP_3D_VELOCITIES,
    )
    return PerturbedField(
        redshift=np.float32(redshift),
        density=delta,
        velocity_z=v_z,
        velocity_x=v_x,
        velocity_y=v_y,
    )
