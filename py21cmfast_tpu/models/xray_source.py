"""XraySourceBox: pre-filtered SFR / X-ray shells for the spin temperature.

TPU-native equivalent of reference UpdateXraySourceBox + one_annular_filter
(SpinTemperatureBox.c:647-804) and the Python-side shell loop
(single_field.py:473-640): for each of the N_STEP_TS concentric shells, the
halo SFR/X-ray grids are interpolated to the shell's emission redshift z''(R)
from the bracketing node HaloBoxes, annulus-filtered (filter type 4; type 5 —
the Lya multiple-scattering window — for the SFR shells when
LYA_MULTIPLE_SCATTERING, SpinTemperatureBox.c:753), and stacked.  One
`lax.scan` over shells; the interpolation is a gather from the stacked node
grids; the per-shell MS windows are host-tabulated 2F3 curves gathered on
device (ops/filters.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cosmology.constants import H0_PER_h, physconst
from ..inputs import InputParameters
from ..ops import fft, filters, grids
from ..ops.gridops import SINGLE, GridOps
from ..outputs import HaloBox, XraySourceBox
from .spintemp import setup_z_edges

__all__ = ["compute_xray_source_field", "lya_diffusion_scale"]


def lya_diffusion_scale(redshift: float, inputs: InputParameters, x_HI: float) -> float:
    """Comoving Lya diffusion scale R_star in Mpc (arXiv:2601.14360 Eq. 24;
    reference single_field.py:558-574).  Proportional to the global neutral
    fraction — 0 after reionization (the MS window then degenerates to the
    straight-line annulus, filtering.c:166-172)."""
    cp = inputs.cosmo_params
    cosmo = inputs.cosmology
    A_alpha = 6.25e8  # Hz, Lya Einstein-A
    nu_lya = 2.46606727e15  # Hz
    n_H_z0 = (1.0 - cosmo.Y_He) * cosmo.rho_crit_cgs * cp.OMb / physconst.m_p  # cm^-3
    H0 = cp.hlittle * H0_PER_h  # s^-1
    r_cm = (
        3.0 * physconst.c_cms**4 * A_alpha**2 * n_H_z0 * x_HI * (1.0 + redshift)
    ) / (32.0 * np.pi**3 * nu_lya**4 * H0**2 * cp.OMm)
    return r_cm / physconst.cm_per_Mpc


def _exact_shell_redshifts(redshift: float, r_outer: np.ndarray,
                           inputs: InputParameters) -> np.ndarray:
    """Mean emission redshift of each shell from the exact comoving-distance
    inversion (reference single_field.py:499-516: `z_at_value` on the shell's
    comoving edges, then zpp_avg = edge - d(edge)/2)."""
    cosmo = inputs.cosmology
    z_hi = max(2.0 * float(inputs.simulation_options.Z_HEAT_MAX), redshift + 10.0)
    zg = np.linspace(redshift, z_hi, 8192)
    drdz = np.abs(
        (1.0 + zg) * physconst.c_cms * cosmo.dtdz(zg)
    ) / physconst.cm_per_Mpc
    dist = np.concatenate(
        [[0.0], np.cumsum(0.5 * (drdz[1:] + drdz[:-1]) * np.diff(zg))]
    )
    edges = np.interp(np.asarray(r_outer, np.float64), dist, zg)
    prev = np.concatenate([[redshift], edges[:-1]])
    return edges - 0.5 * (edges - prev)


@partial(jax.jit,
         static_argnames=("shape", "box_lens", "use_ms", "use_mini", "use_lw", "gops"))
def _annulus_scan(sfr_nodes, xray_nodes, sfr_mini_nodes, idx_lo, idx_hi, weights,
                  r_inner, r_outer, do_filter, ms_k_table, ms_w_tables, *,
                  shape, box_lens, use_ms, use_mini, use_lw=False,
                  gops: GridOps = SINGLE):
    kmag = gops.kmag(shape, box_lens)

    def shell(_, xs):
        i0, i1, w, r_in, r_out, do_f, ms_w = xs

        def one(nodes, ms: bool):
            grid = nodes[i0] * (1.0 - w) + nodes[i1] * w
            g_k = gops.rfft3(grid)

            def filt():
                if ms:
                    win = filters.w_multiple_scattering(kmag, ms_k_table, ms_w)
                    return gops.irfft3(g_k * win.astype(g_k.real.dtype), shape)
                return gops.irfft3(
                    filters.filter_kbox(g_k, kmag, filters.SHELL, r_in, r_out), shape
                )

            out = jax.lax.cond(do_f, filt, lambda: grid)
            return jnp.maximum(out, 0.0)

        ys = (
            one(sfr_nodes, use_ms),
            one(xray_nodes, False),
            one(sfr_mini_nodes, use_ms) if use_mini else jnp.zeros((1, 1, 1)),
        )
        if use_lw:
            # straight-line (plain annulus) re-filter of the SFR grids for
            # the LW photons (SpinTemperatureBox.c:775-783): only needed when
            # the Lya shells above used the multiple-scattering window
            ys = ys + (one(sfr_nodes, False), one(sfr_mini_nodes, False))
        return None, ys

    _, shells = jax.lax.scan(
        shell, None,
        (idx_lo, idx_hi, weights, r_inner, r_outer, do_filter, ms_w_tables),
    )
    return shells


def compute_xray_source_field(
    redshift: float,
    inputs: InputParameters,
    halobox_nodes: list,
    previous_ionized_box=None,
    mesh=None,
) -> XraySourceBox:
    """Build the filtered source shells.

    halobox_nodes: list of (z_node, HaloBox) with z_node >= redshift (earlier
    snapshots), in any order; shells interpolate between the bracketing nodes
    (reference interp_halo_boxes, single_field.py:382).  previous_ionized_box
    sets the global x_HI entering the Lya diffusion scale when
    LYA_MULTIPLE_SCATTERING (reference single_field.py:549-574)."""
    so = inputs.simulation_options
    ao = inputs.astro_options
    shape = so.lowres_shape
    ladder = setup_z_edges(redshift, inputs)
    n_r = len(ladder.R)

    # Shell emission redshifts for the halobox interpolation: the reference
    # driver inverts the EXACT comoving distance for the shell edges
    # (single_field.py:499-516, z_at_value) rather than reusing the Ts
    # ladder's chained first-order z edges (setup_z_edges) — the two drift
    # apart by up to dz ~ 0.08 at R = 500 Mpc, which is ~5-8% in SFRD at
    # these redshifts.  The ladder zpp still drives prefactors and
    # z_edge_factor exactly as the C ladder does.
    zpp_interp = _exact_shell_redshifts(redshift, ladder.R, inputs)

    nodes = sorted(halobox_nodes, key=lambda t: t[0])
    z_nodes = np.array([t[0] for t in nodes])
    # shells whose emission redshift lies above Z_HEAT_MAX (or above the
    # oldest computed HaloBox) carry no sources: the reference zeroes them
    # rather than clamping to the oldest node (single_field.py:585-597)
    z_shell_max = min(float(z_nodes[-1]), float(so.Z_HEAT_MAX))
    live_shell = zpp_interp < z_shell_max
    sfr_nodes = jnp.stack([t[1].halo_sfr for t in nodes])
    xray_nodes = jnp.stack([t[1].halo_xray for t in nodes])
    use_mini = bool(ao.USE_MINI_HALOS) and all(
        t[1].halo_sfr_mini is not None for t in nodes
    )
    if use_mini:
        sfr_mini_nodes = jnp.stack([t[1].halo_sfr_mini for t in nodes])
        mcrit_nodes = np.array(
            [float(t[1].log10_Mcrit_MCG_ave) for t in nodes]
        )
    else:
        sfr_mini_nodes = jnp.zeros((len(nodes), 1, 1, 1), jnp.float32)

    idx_lo = np.searchsorted(z_nodes, zpp_interp) - 1
    idx_lo = np.clip(idx_lo, 0, len(z_nodes) - 1)
    idx_hi = np.clip(idx_lo + 1, 0, len(z_nodes) - 1)
    denom = np.where(idx_hi > idx_lo, z_nodes[idx_hi] - z_nodes[idx_lo], 1.0)
    w = np.clip((zpp_interp - z_nodes[idx_lo]) / denom, 0.0, 1.0)

    do_filter = ladder.R_inner > 0

    use_ms = bool(ao.LYA_MULTIPLE_SCATTERING)
    n_k = 2048
    if use_ms:
        if previous_ionized_box is not None:
            if previous_ionized_box.neutral_fraction is None:
                raise ValueError(
                    "previous_ionized_box.neutral_fraction is None — the "
                    "coeval chain slimming (drivers/coeval._slim_chain_ion) "
                    "only keeps it on the halo-model path; if a new consumer "
                    "needs it, update keep_xh there."
                )
            x_HI = float(np.mean(np.asarray(previous_ionized_box.neutral_fraction)))
        else:
            x_HI = 1.0
        r_star = lya_diffusion_scale(redshift, inputs, x_HI)
        k_max = float(np.sqrt(3.0) * np.pi * max(
            s / l for s, l in zip(shape, so.box_lens)
        ))
        ms_w = np.ones((n_r, n_k), np.float32)
        for i in range(n_r):
            if ladder.R_inner[i] > 0:
                k_tab, w_tab = filters.ms_filter_table(
                    k_max, float(ladder.R_inner[i]), float(ladder.R[i]), r_star, n_k
                )
                ms_w[i] = w_tab
        ms_k_table = jnp.asarray(
            np.linspace(0.0, k_max, n_k, dtype=np.float32)
        )
        ms_w_tables = jnp.asarray(ms_w)
    else:
        ms_k_table = jnp.zeros(2, jnp.float32)
        ms_w_tables = jnp.zeros((n_r, 2), jnp.float32)

    _ann_args = (
        sfr_nodes,
        xray_nodes,
        sfr_mini_nodes,
        jnp.asarray(idx_lo, jnp.int32),
        jnp.asarray(idx_hi, jnp.int32),
        jnp.asarray(w, jnp.float32),
        jnp.asarray(ladder.R_inner, jnp.float32),
        jnp.asarray(ladder.R, jnp.float32),
        jnp.asarray(do_filter),
        ms_k_table,
        ms_w_tables,
    )
    use_lw = use_ms and use_mini
    _ann_static = dict(
        shape=shape,
        box_lens=so.box_lens,
        use_ms=use_ms,
        use_mini=use_mini,
        use_lw=use_lw,
    )
    if mesh is not None:
        from ..parallel.shardcall import sharded_kernel_call

        shells = sharded_kernel_call(
            mesh, _annulus_scan, _ann_args, _ann_static, shape)
    else:
        shells = _annulus_scan(*_ann_args, **_ann_static)
    if not live_shell.all():
        mask = jnp.asarray(live_shell, jnp.float32)[:, None, None, None]
        shells = tuple(s * mask for s in shells)
    sfr_shells, xray_shells, sfr_mini_shells = shells[:3]
    sfr_lw_shells, sfr_mini_lw_shells = shells[3:] if use_lw else (None, None)
    mean_mcrit = None
    if use_mini:
        # per-shell mean log10 MCG turnover, z-interpolated between nodes
        # (reference single_field.py:580-640, mean_log10_Mcrit_LW); dead
        # shells get the M_TURN floor (single_field.py:592)
        mean_mcrit = jnp.asarray(
            np.where(
                live_shell,
                mcrit_nodes[idx_lo] * (1.0 - w) + mcrit_nodes[idx_hi] * w,
                float(inputs.astro_params.M_TURN),
            ),
            jnp.float32,
        )
    return XraySourceBox(
        redshift=np.float32(redshift),
        filtered_sfr=sfr_shells,
        filtered_sfr_mini=sfr_mini_shells if use_mini else None,
        filtered_xray=xray_shells,
        mean_log10_Mcrit_LW=mean_mcrit,
        filtered_sfr_lw=sfr_lw_shells,
        filtered_sfr_mini_lw=sfr_mini_lw_shells,
    )
