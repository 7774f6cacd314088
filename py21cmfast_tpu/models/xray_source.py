"""XraySourceBox: pre-filtered SFR / X-ray shells for the spin temperature.

TPU-native equivalent of reference UpdateXraySourceBox + one_annular_filter
(SpinTemperatureBox.c:647-804) and the Python-side shell loop
(single_field.py:473-640): for each of the N_STEP_TS concentric shells, the
halo SFR/X-ray grids are interpolated to the shell's emission redshift z''(R)
from the bracketing node HaloBoxes, annulus-filtered (filter type 4), and
stacked.  One `lax.scan` over shells; the interpolation is a gather from the
stacked node grids.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..inputs import InputParameters
from ..ops import fft, filters, grids
from ..outputs import HaloBox, XraySourceBox
from .spintemp import setup_z_edges

__all__ = ["compute_xray_source_field"]


@partial(jax.jit, static_argnames=("shape", "box_lens"))
def _annulus_scan(sfr_nodes, xray_nodes, idx_lo, idx_hi, weights, r_inner, r_outer,
                  do_filter, *, shape, box_lens):
    kmag = grids.kmag_grid(shape, box_lens)

    def shell(_, xs):
        i0, i1, w, r_in, r_out, do_f = xs

        def one(nodes):
            grid = nodes[i0] * (1.0 - w) + nodes[i1] * w
            g_k = fft.rfft3(grid)

            def filt():
                return fft.irfft3(
                    filters.filter_kbox(g_k, kmag, filters.SHELL, r_in, r_out), shape
                )

            out = jax.lax.cond(do_f, filt, lambda: grid)
            return jnp.maximum(out, 0.0)

        return None, (one(sfr_nodes), one(xray_nodes))

    _, (sfr_shells, xray_shells) = jax.lax.scan(
        shell, None, (idx_lo, idx_hi, weights, r_inner, r_outer, do_filter)
    )
    return sfr_shells, xray_shells


def compute_xray_source_field(
    redshift: float,
    inputs: InputParameters,
    halobox_nodes: list,
) -> XraySourceBox:
    """Build the filtered source shells.

    halobox_nodes: list of (z_node, HaloBox) with z_node >= redshift (earlier
    snapshots), in any order; shells interpolate between the bracketing nodes
    (reference interp_halo_boxes, single_field.py:382)."""
    so = inputs.simulation_options
    shape = so.lowres_shape
    ladder = setup_z_edges(redshift, inputs)
    n_r = len(ladder.R)

    nodes = sorted(halobox_nodes, key=lambda t: t[0])
    z_nodes = np.array([t[0] for t in nodes])
    sfr_nodes = jnp.stack([t[1].halo_sfr for t in nodes])
    xray_nodes = jnp.stack([t[1].halo_xray for t in nodes])

    idx_lo = np.searchsorted(z_nodes, ladder.zpp) - 1
    idx_lo = np.clip(idx_lo, 0, len(z_nodes) - 1)
    idx_hi = np.clip(idx_lo + 1, 0, len(z_nodes) - 1)
    denom = np.where(idx_hi > idx_lo, z_nodes[idx_hi] - z_nodes[idx_lo], 1.0)
    w = np.clip((ladder.zpp - z_nodes[idx_lo]) / denom, 0.0, 1.0)

    cell_r = 0.620350491 * so.box_len / so.HII_DIM
    do_filter = ladder.R_inner > 0

    sfr_shells, xray_shells = _annulus_scan(
        sfr_nodes,
        xray_nodes,
        jnp.asarray(idx_lo, jnp.int32),
        jnp.asarray(idx_hi, jnp.int32),
        jnp.asarray(w, jnp.float32),
        jnp.asarray(ladder.R_inner, jnp.float32),
        jnp.asarray(ladder.R, jnp.float32),
        jnp.asarray(do_filter),
        shape=shape,
        box_lens=so.box_lens,
    )
    return XraySourceBox(
        redshift=np.float32(redshift),
        filtered_sfr=sfr_shells,
        filtered_xray=xray_shells,
    )
