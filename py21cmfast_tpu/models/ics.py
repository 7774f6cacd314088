"""Initial conditions: Gaussian random field + Zel'dovich + 2LPT displacements.

TPU-native equivalent of reference InitialConditions.c:547-772.  Key design
differences from the C implementation:

 * The GRF is sampled as *real-space white noise* and colored in k-space
   (d_k = rfftn(white) * sqrt(N P(k) / V)).  This is statistically identical to
   the reference's half-space complex sampling + hermitian fixup
   (InitialConditions.c:103-139), hermitian symmetry is automatic, and it maps
   onto one device RNG fill + one rfftn instead of a scalar k-loop.
 * sqrt(P(k)) comes from a 1D log-k table (host float64 quadrature-normalized)
   gathered on device — no per-mode transcendental-heavy P(k) evaluation.
 * All FFT normalizations use the numpy convention (irfftn includes 1/N); the
   reference's VOLUME/TOT_NUM_PIXELS factors reduce to:
       delta(x)  = irfftn(d_k)
       psi_i(x)  = irfftn(d_k * i k_i / k^2)                      [ZA, Mpc]
       phi_ij(x) = irfftn(-d_k k_i k_j / k^2)
       psi2_i(x) = irfftn(rfftn(sum_{i<j} phi_ii phi_jj - phi_ij^2) * i k_i/k^2)
 * The pipeline is split into several *small* jitted stages rather than one
   super-kernel: XLA's TPU FFT lowering holds multi-hundred-MB temporaries per
   transform, so fusing all ~14 hires FFTs into one graph OOMs at DIM>~512.
   Stage-per-FFT keeps peak HBM ~= persistent grids + one transform's temps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cosmology.constants import physconst
from ..inputs import InputParameters
from ..ops import fft, filters, grids
from ..outputs import InitialConditions

__all__ = ["compute_initial_conditions", "power_amplitude_table"]


def power_amplitude_table(inputs: InputParameters, n: int = 2048):
    """Host-side: ln(k) -> sqrt(P(k)) table covering the box's k range."""
    so = inputs.simulation_options
    cosmo = inputs.cosmology
    k_min = 2 * np.pi / (so.box_len * max(so.NON_CUBIC_FACTOR, 1.0)) / 2
    k_max = 2 * np.pi / so.box_len * so.dim * np.sqrt(3.0)  # > corner of hires box
    ln_k = np.linspace(np.log(k_min), np.log(k_max), n)
    p = cosmo.power_in_k(np.exp(ln_k))
    return jnp.asarray(ln_k, jnp.float32), jnp.asarray(np.sqrt(p), jnp.float32)


# --------------------------------------------------------------- jit stages


@partial(jax.jit, static_argnames=("hi_shape", "box_lens"))
def _sample_dk(key, ln_k_table, sqrtp_table, *, hi_shape, box_lens):
    """White noise -> colored k-space field d_k (rfftn layout)."""
    n_tot = hi_shape[0] * hi_shape[1] * hi_shape[2]
    volume = box_lens[0] * box_lens[1] * box_lens[2]
    white = jax.random.normal(key, hi_shape, dtype=jnp.float32)
    w_k = fft.rfft3(white)
    kmag = grids.kmag_grid(hi_shape, box_lens)
    lnk = jnp.log(jnp.where(kmag > 0, kmag, 1.0))
    x0 = ln_k_table[0]
    inv_dx = (ln_k_table.shape[0] - 1) / (ln_k_table[-1] - ln_k_table[0])
    amp = jnp.where(
        kmag > 0, grids.uniform_lerp(lnk, x0, inv_dx, sqrtp_table), 0.0
    )
    return w_k * (amp * np.float32(np.sqrt(n_tot / volume)))


@partial(jax.jit, static_argnames=("hi_shape",))
def _to_real(d_k, *, hi_shape):
    return fft.irfft3(d_k, hi_shape)


@partial(jax.jit, static_argnames=("hi_shape", "box_lens", "out_shape", "do_filter"))
def _filtered_sample(d_k, *, hi_shape, box_lens, out_shape, do_filter):
    """Tophat-filter at the lowres cell scale, c2r, subsample."""
    if do_filter:
        kmag = grids.kmag_grid(hi_shape, box_lens)
        smooth_R = physconst.l_factor * box_lens[0] / out_shape[0]
        d_k = filters.filter_kbox(d_k, kmag, filters.TOPHAT, smooth_R)
    x = fft.irfft3(d_k, hi_shape)
    if out_shape != hi_shape:
        x = grids.subsample(x, out_shape)
    return x


def _kvec_grid(axis_idx, hi_shape, box_lens):
    """Full k_i grid selected by a *traced* axis index — keeps one compiled
    program for all axes (XLA-TPU FFT programs are expensive to compile)."""
    kx, ky, kz = grids.k_axes(hi_shape, box_lens)
    zero = jnp.zeros(
        (hi_shape[0], hi_shape[1], hi_shape[2] // 2 + 1), jnp.float32
    )
    return jax.lax.switch(
        axis_idx,
        (
            lambda: zero + kx[:, None, None],
            lambda: zero + ky[None, :, None],
            lambda: zero + kz[None, None, :],
        ),
    )


@partial(jax.jit, static_argnames=("hi_shape", "box_lens", "out_shape", "do_filter"))
def _gradient_field_idx(d_k, axis_idx, *, hi_shape, box_lens, out_shape, do_filter):
    """psi_axis = irfftn(d_k i k/k^2), optionally filtered+subsampled."""
    ksq = grids.ksq_grid(hi_shape, box_lens)
    kvec = _kvec_grid(axis_idx, hi_shape, box_lens)
    ksq_safe = jnp.where(ksq > 0, ksq, 1.0)
    g_k = jnp.where(ksq > 0, d_k * (1j * kvec / ksq_safe), 0.0)
    if do_filter:
        kmag = jnp.sqrt(ksq)
        smooth_R = physconst.l_factor * box_lens[0] / out_shape[0]
        g_k = filters.filter_kbox(g_k, kmag, filters.TOPHAT, smooth_R)
    x = fft.irfft3(g_k, hi_shape)
    if out_shape != hi_shape:
        x = grids.subsample(x, out_shape)
    return x


def _gradient_field(d_k, *, hi_shape, box_lens, axis, out_shape, do_filter):
    return _gradient_field_idx(
        d_k, jnp.int32(axis), hi_shape=hi_shape, box_lens=box_lens,
        out_shape=out_shape, do_filter=do_filter,
    )


@partial(jax.jit, static_argnames=("hi_shape", "box_lens"))
def _phi_ij_idx(d_k, ax_i, ax_j, *, hi_shape, box_lens):
    """phi_ij = irfftn(-d_k k_i k_j / k^2) (2LPT potential second derivative)."""
    ksq = grids.ksq_grid(hi_shape, box_lens)
    kv_i = _kvec_grid(ax_i, hi_shape, box_lens)
    kv_j = _kvec_grid(ax_j, hi_shape, box_lens)
    ksq_safe = jnp.where(ksq > 0, ksq, 1.0)
    g_k = jnp.where(ksq > 0, -d_k * (kv_i * kv_j / ksq_safe), 0.0)
    return fft.irfft3(g_k, hi_shape)


def _phi_ij(d_k, *, hi_shape, box_lens, ax_i, ax_j):
    return _phi_ij_idx(
        d_k, jnp.int32(ax_i), jnp.int32(ax_j), hi_shape=hi_shape, box_lens=box_lens
    )


@jax.jit
def _diag_products(phi_xx, phi_yy, phi_zz):
    return phi_xx * phi_yy + phi_xx * phi_zz + phi_yy * phi_zz


@jax.jit
def _subtract_square(s2, phi_od):
    return s2 - phi_od * phi_od


# Above this many hires cells the in-HBM 2LPT staging (4 hires grids + FFT
# temps) exceeds a 16 GB chip.  Host RAM staging is not an option on this
# platform (device<->host runs at 0.03-0.1 GB/s through the axon tunnel), so
# oversized grids compute the 2LPT *source* on a spectrally-truncated copy of
# d_k instead: the psi2 field is only ever sampled on the pt grid (lowres for
# PERTURB_ON_HIGH_RES=False), and the quadratic coupling of the dropped top
# octave of modes into pt-scale s2 power is <~1% of a correction that is
# itself ~5% of the ZA displacement.  Golden-parity sizes (DIM<=150) always
# take the exact path.
_2LPT_MAX_INHBM_CELLS = 640**3
_2LPT_TRUNC_DIM = 512


@partial(jax.jit, static_argnames=("hi_shape", "trunc_shape"))
def _truncate_dk(d_k, *, hi_shape, trunc_shape):
    """Spectral truncation: keep |k_i| < k_nyquist(trunc) modes of the rfftn
    cube (the four kx/ky corners and the low-kz face), rescaled by
    n_total/N_total to preserve real-space amplitude under numpy's 1/N irfftn
    normalization."""
    hx, hy = trunc_shape[0] // 2, trunc_shape[1] // 2
    hz = trunc_shape[2] // 2
    sx = (slice(0, hx), slice(hi_shape[0] - hx, hi_shape[0]))
    sy = (slice(0, hy), slice(hi_shape[1] - hy, hi_shape[1]))
    out = jnp.concatenate(
        [
            jnp.concatenate([d_k[s0, s1, : hz + 1] for s1 in sy], axis=1)
            for s0 in sx
        ],
        axis=0,
    )
    scale = np.prod(trunc_shape) / np.prod(hi_shape)
    return out * jnp.float32(scale)


def _compute_2lpt(d_k, hi_shape, box_lens, pt_shape, do_filter_vel):
    """Scoccimarro 1998 App. D: lap(phi2) = sum_{i<j} phi_ii phi_jj - phi_ij^2,
    staged to keep at most 4 hires grids + one FFT's temps live."""
    phi_xx = _phi_ij(d_k, hi_shape=hi_shape, box_lens=box_lens, ax_i=0, ax_j=0)
    phi_yy = _phi_ij(d_k, hi_shape=hi_shape, box_lens=box_lens, ax_i=1, ax_j=1)
    phi_zz = _phi_ij(d_k, hi_shape=hi_shape, box_lens=box_lens, ax_i=2, ax_j=2)
    s2 = _diag_products(phi_xx, phi_yy, phi_zz)
    del phi_xx, phi_yy, phi_zz
    for ax_i, ax_j in ((0, 1), (0, 2), (1, 2)):
        phi_od = _phi_ij(d_k, hi_shape=hi_shape, box_lens=box_lens, ax_i=ax_i, ax_j=ax_j)
        s2 = _subtract_square(s2, phi_od)
        del phi_od
    s2_k = jax.jit(fft.rfft3)(s2)
    del s2
    return [
        _gradient_field(
            s2_k,
            hi_shape=hi_shape,
            box_lens=box_lens,
            axis=ax,
            out_shape=pt_shape,
            do_filter=do_filter_vel,
        )
        for ax in range(3)
    ]


# ------------------------------------------------------- big-grid jit stages
# Above the staged-FFT threshold every hires transform runs as its own
# top-level dispatch with donation (ops/fft.py): a jit wrapper around
# filter+irfft at 1024^3 keeps d_k + filtered k-grid + FFT buffers + output
# live in one program and exceeds the chip.


def _kt_kcomponents(hi_shape, box_lens):
    """k components broadcast for the kz-major (nz//2+1, nx, ny) layout."""
    kx, ky, kz = grids.k_axes(hi_shape, box_lens)
    return kz[:, None, None], kx[None, :, None], ky[None, None, :]


def _color_white_kt_body(w_k, ln_k_table, sqrtp_table, n_tot, volume, *,
                         hi_shape, box_lens):
    """white spectrum -> d_k in the kz-major layout (donated in place)."""
    kzc, kxc, kyc = _kt_kcomponents(hi_shape, box_lens)
    kmag = jnp.sqrt(kxc * kxc + kyc * kyc + kzc * kzc)
    lnk = jnp.log(jnp.where(kmag > 0, kmag, 1.0))
    x0 = ln_k_table[0]
    inv_dx = (ln_k_table.shape[0] - 1) / (ln_k_table[-1] - ln_k_table[0])
    amp = jnp.where(kmag > 0, grids.uniform_lerp(lnk, x0, inv_dx, sqrtp_table), 0.0)
    return w_k * (amp * jnp.sqrt(n_tot / volume))


_color_white_kt_donated = partial(
    jax.jit, static_argnames=("hi_shape", "box_lens"), donate_argnums=(0,)
)(_color_white_kt_body)


def _filter_kt_only_body(d_k, *, hi_shape, box_lens, do_filter, out_res):
    if not do_filter:
        return d_k + 0.0
    kzc, kxc, kyc = _kt_kcomponents(hi_shape, box_lens)
    kmag = jnp.sqrt(kxc * kxc + kyc * kyc + kzc * kzc)
    smooth_R = physconst.l_factor * box_lens[0] / out_res
    return filters.filter_kbox(d_k, kmag, filters.TOPHAT, smooth_R)


_filter_kt_only_donated = partial(
    jax.jit, static_argnames=("hi_shape", "box_lens", "do_filter", "out_res"),
    donate_argnums=(0,),
)(_filter_kt_only_body)


def _gradient_kt_only_body(d_k, *, hi_shape, box_lens, do_filter, out_res, axis):
    # axis is STATIC (one compile per axis): broadcast the k-vector directly
    # so the whole elementwise chain fuses without materializing k-grids
    kzc, kxc, kyc = _kt_kcomponents(hi_shape, box_lens)
    kvec = (kxc, kyc, kzc)[axis]
    ksq = kxc * kxc + kyc * kyc + kzc * kzc
    ksq_safe = jnp.where(ksq > 0, ksq, 1.0)
    g_k = jnp.where(ksq > 0, d_k * (1j * kvec / ksq_safe), 0.0)
    if do_filter:
        smooth_R = physconst.l_factor * box_lens[0] / out_res
        g_k = filters.filter_kbox(g_k, jnp.sqrt(ksq), filters.TOPHAT, smooth_R)
    return g_k


_gradient_kt_only_donated = partial(
    jax.jit,
    static_argnames=("hi_shape", "box_lens", "do_filter", "out_res", "axis"),
    donate_argnums=(0,),
)(_gradient_kt_only_body)


@partial(jax.jit, static_argnames=("hi_shape", "trunc_shape"))
def _truncate_dk_from_kt(d_kt, *, hi_shape, trunc_shape):
    """Spectral truncation from the kz-major layout to the STANDARD layout
    expected by _compute_2lpt (small output; transpose is cheap)."""
    hx, hy = trunc_shape[0] // 2, trunc_shape[1] // 2
    hz = trunc_shape[2] // 2
    sx = (slice(0, hx), slice(hi_shape[0] - hx, hi_shape[0]))
    sy = (slice(0, hy), slice(hi_shape[1] - hy, hi_shape[1]))
    out = jnp.concatenate(
        [
            jnp.concatenate([d_kt[: hz + 1, s0, s1] for s1 in sy], axis=2)
            for s0 in sx
        ],
        axis=1,
    )
    scale = np.prod(trunc_shape) / np.prod(hi_shape)
    return jnp.transpose(out, (1, 2, 0)) * jnp.float32(scale)


@partial(jax.jit, static_argnames=("out_shape",))
def _subsample_jit(x, *, out_shape):
    return grids.subsample(x, out_shape)


@partial(jax.jit, static_argnames=("out_shape",))
def _irfft3_small(k_small, out_shape):
    return fft.irfft3(k_small, out_shape)


def _big_irfft_owned(g_k_box, hi_shape):
    """Top-level staged inverse of a CONSUMED buffer: pass [g_k] and drop
    your reference (see fft.irfft3_consume for the async-lifetime rationale)."""
    return fft.irfft3_consume(g_k_box, hi_shape)


# --------------------------------------------------------------- public API


def vcb_ratio_table(inputs: InputParameters, n: int = 2048):
    """Host-side: ln(k) -> sqrt(P_vcb(k)/P_m(k)) [km/s] for the relative-velocity
    realization (reference compute_relative_velocities, InitialConditions.c:141)."""
    so = inputs.simulation_options
    cosmo = inputs.cosmology
    k_min = 2 * np.pi / (so.box_len * max(so.NON_CUBIC_FACTOR, 1.0)) / 2
    k_max = 2 * np.pi / so.box_len * so.dim * np.sqrt(3.0)
    ln_k = np.linspace(np.log(k_min), np.log(k_max), n)
    k = np.exp(ln_k)
    ratio = np.sqrt(cosmo.power_vcb(k) / cosmo.power_in_k(k))
    return jnp.asarray(ln_k, jnp.float32), jnp.asarray(ratio, jnp.float32)


@partial(jax.jit, static_argnames=("hi_shape", "box_lens", "out_shape", "do_filter"))
def _vcb_component_idx(
    d_k, axis_idx, ln_k_table, ratio_table, *, hi_shape, box_lens, out_shape, do_filter
):
    """One relative-velocity component: irfftn(d_k * i k_i/k * sqrt(P_vcb/P)),
    filtered to the lowres cell scale and subsampled
    (reference InitialConditions.c:177-233)."""
    kmag = grids.kmag_grid(hi_shape, box_lens)
    kvec = _kvec_grid(axis_idx, hi_shape, box_lens)
    lnk = jnp.log(jnp.where(kmag > 0, kmag, 1.0))
    x0 = ln_k_table[0]
    inv_dx = (ln_k_table.shape[0] - 1) / (ln_k_table[-1] - ln_k_table[0])
    amp = jnp.where(
        kmag > 0, grids.uniform_lerp(lnk, x0, inv_dx, ratio_table), 0.0
    )
    kmag_safe = jnp.where(kmag > 0, kmag, 1.0)
    g_k = d_k * (1j * kvec / kmag_safe) * amp
    if do_filter:
        smooth_R = physconst.l_factor * box_lens[0] / out_shape[0]
        g_k = filters.filter_kbox(g_k, kmag, filters.TOPHAT, smooth_R)
    x = fft.irfft3(g_k, hi_shape)
    if out_shape != hi_shape:
        x = grids.subsample(x, out_shape)
    return x


@partial(jax.jit, static_argnames=())
def _speed(vx, vy, vz):
    return jnp.sqrt(vx * vx + vy * vy + vz * vz)


def compute_vcb_box(inputs: InputParameters, d_k) -> jax.Array:
    """Lowres |v_cb| box in km/s at kinematic decoupling, correlated with the
    density realization exactly as the reference does (same white noise times
    i k_i/k sqrt(P_vcb/P) per component, lowres-filtered, speed at each cell)."""
    so = inputs.simulation_options
    hi_shape = so.hires_shape
    lo_shape = so.lowres_shape
    ln_k, ratio = vcb_ratio_table(inputs)
    comps = [
        _vcb_component_idx(
            d_k, jnp.int32(ax), ln_k, ratio,
            hi_shape=hi_shape, box_lens=so.box_lens, out_shape=lo_shape,
            do_filter=so.dim != so.HII_DIM,
        )
        for ax in range(3)
    ]
    return _speed(*comps)


def compute_initial_conditions(
    inputs: InputParameters, *, initial_density: np.ndarray | None = None
) -> InitialConditions:
    """Generate ICs.  `initial_density` optionally injects a user hires field
    in place of GRF sampling (reference single_field.py:94-113)."""
    so = inputs.simulation_options
    mo = inputs.matter_options
    hi_shape = so.hires_shape
    lo_shape = so.lowres_shape
    pt_shape = hi_shape if mo.PERTURB_ON_HIGH_RES else lo_shape
    box_lens = so.box_lens
    filter_lowres = so.dim != so.HII_DIM
    do_filter_vel = filter_lowres and (pt_shape != hi_shape)

    big = int(np.prod(hi_shape)) >= fft._STAGED_FFT_CELLS

    import os
    import time as _time

    _dbg = bool(os.environ.get("P21_ICS_DEBUG"))
    _t0 = [_time.perf_counter()]

    def _stage(label, *arrs):
        if not _dbg:
            return
        for a in arrs:
            if a is not None:
                jax.block_until_ready(a)
        now = _time.perf_counter()
        print(f"[ics] {label}: {now - _t0[0]:.1f}s", flush=True)
        _t0[0] = now

    if big:
        # top-level staged pipeline in the kz-major spectrum layout (ops/fft
        # rfft3_kt/irfft3_kt_consume): zero lane padding (4.30 GB per 1024^3
        # spectrum vs 5.37 in the standard layout) and every x/y transform
        # chunk is a set of independent kz planes.  ONLY the real hires
        # density persists; each field re-derives the spectrum (~2 s, once
        # per run) so peak HBM is hires + one spectrum + one output.
        if initial_density is not None:
            hires_density = jnp.asarray(initial_density, jnp.float32)
        else:
            ln_k, sqrtp = power_amplitude_table(inputs)
            key = jax.random.PRNGKey(inputs.random_seed)
            white = jax.jit(
                lambda k: jax.random.normal(k, hi_shape, dtype=jnp.float32)
            )(key)
            jax.block_until_ready(white)
            w_kt = fft.rfft3_kt(white)
            del white
            n_tot = float(np.prod(hi_shape))
            volume = float(np.prod(box_lens))
            d_kt = _color_white_kt_donated(
                w_kt, ln_k, sqrtp, jnp.float32(n_tot), jnp.float32(volume),
                hi_shape=hi_shape, box_lens=box_lens,
            )
            del w_kt
            jax.block_until_ready(d_kt)
            box = [d_kt]
            del d_kt
            hires_density = fft.irfft3_kt_consume(box, hi_shape)
        jax.block_until_ready(hires_density)
        _stage("hires_density")

        # cut the (truncated) 2LPT source spectrum NOW, while only the hires
        # density is resident — re-deriving it after the lowres fields
        # accumulate pushes HII_DIM=512 runs over the chip
        d_k_t_early = None
        if mo.PERTURB_ALGORITHM == "2LPT":
            tdim = _2LPT_TRUNC_DIM
            tshape = tuple(int(round(s * tdim / hi_shape[0])) for s in hi_shape)
            if (
                int(np.prod(hi_shape)) >= _2LPT_MAX_INHBM_CELLS
                and all(p <= c for p, c in zip(pt_shape, tshape))
                and all(c % p == 0 for p, c in zip(pt_shape, tshape))
            ):
                kt = fft.rfft3_kt(hires_density)
                d_k_t_early = _truncate_dk_from_kt(
                    kt, hi_shape=hi_shape, trunc_shape=tshape
                )
                jax.block_until_ready(d_k_t_early)
                del kt
                _stage("2lpt truncate")

        def _field(do_filter, out_res, axis=None):
            k = fft.rfft3_kt(hires_density)
            if axis is None:
                k = _filter_kt_only_donated(
                    k, hi_shape=hi_shape, box_lens=box_lens,
                    do_filter=do_filter, out_res=out_res,
                )
            else:
                k = _gradient_kt_only_donated(
                    k, hi_shape=hi_shape, box_lens=box_lens,
                    do_filter=do_filter, out_res=out_res, axis=axis,
                )
            jax.block_until_ready(k)
            out_shape = lo_shape if axis is None else pt_shape
            if out_shape != hi_shape and fft.can_fold(hi_shape, out_shape):
                # fold the spectrum down to the decimated grid's spectrum and
                # inverse-transform at LOWRES: exact (see fold_kt_spectrum),
                # and never materializes a second hires real grid — at
                # DIM=1024 that second grid pushed peak HBM past the chip
                k_small = fft.fold_kt_spectrum(
                    k, hi_shape=hi_shape, out_shape=out_shape
                )
                del k
                out = _irfft3_small(k_small, out_shape)
                jax.block_until_ready(out)
                return out
            kbox = [k]
            del k
            x = fft.irfft3_kt_consume(kbox, hi_shape)
            out = (
                _subsample_jit(x, out_shape=out_shape)
                if out_shape != hi_shape else x
            )
            jax.block_until_ready(out)
            del x
            return out

        lowres_density = _field(filter_lowres, lo_shape[0])
        _stage("lowres_density")
        vel = []
        for ax in range(3):
            vel.append(_field(do_filter_vel, pt_shape[0], axis=ax))
            _stage(f"vel{ax}")
        d_k = None  # standard-layout spectrum never materialized in big path
    elif initial_density is not None:
        hires_density = jnp.asarray(initial_density, jnp.float32)
        d_k = jax.jit(fft.rfft3)(hires_density)
    else:
        ln_k, sqrtp = power_amplitude_table(inputs)
        key = jax.random.PRNGKey(inputs.random_seed)
        d_k = _sample_dk(key, ln_k, sqrtp, hi_shape=hi_shape, box_lens=box_lens)
        hires_density = _to_real(d_k, hi_shape=hi_shape)

    if not big:
        lowres_density = _filtered_sample(
            d_k, hi_shape=hi_shape, box_lens=box_lens, out_shape=lo_shape,
            do_filter=filter_lowres,
        )

        vel = [
            _gradient_field(
                d_k,
                hi_shape=hi_shape,
                box_lens=box_lens,
                axis=ax,
                out_shape=pt_shape,
                do_filter=do_filter_vel,
            )
            for ax in range(3)
        ]

    lowres_vcb = None
    if mo.V_CB_MODEL == "FLUCTS":
        if big:
            d_k = fft._rfft3_staged(hires_density)
        lowres_vcb = compute_vcb_box(inputs, d_k)
        if big:
            del d_k

    vel_2lpt = (None, None, None)
    if mo.PERTURB_ALGORITHM == "2LPT":
        t = _2LPT_TRUNC_DIM
        trunc_shape = tuple(
            int(round(s * t / hi_shape[0])) for s in hi_shape
        )
        if big and d_k_t_early is not None:
            vel_2lpt = _compute_2lpt(
                d_k_t_early, trunc_shape, box_lens, pt_shape, do_filter_vel
            )
            del d_k_t_early
            _stage("2lpt fields", *vel_2lpt)
        else:
            use_trunc = (
                int(np.prod(hi_shape)) >= _2LPT_MAX_INHBM_CELLS
                and all(p <= c for p, c in zip(pt_shape, trunc_shape))
                and all(c % p == 0 for p, c in zip(pt_shape, trunc_shape))
            )
            if big:
                d_k = fft._rfft3_staged(hires_density)
                jax.block_until_ready(d_k)
            if use_trunc:
                d_k_t = _truncate_dk(
                    d_k, hi_shape=hi_shape, trunc_shape=trunc_shape
                )
                jax.block_until_ready(d_k_t)
                if big:
                    del d_k
                vel_2lpt = _compute_2lpt(
                    d_k_t, trunc_shape, box_lens, pt_shape, do_filter_vel
                )
                del d_k_t
            else:
                vel_2lpt = _compute_2lpt(
                    d_k, hi_shape, box_lens, pt_shape, do_filter_vel
                )
                if big:
                    del d_k

    return InitialConditions(
        hires_density=hires_density,
        lowres_density=lowres_density,
        vx=vel[0],
        vy=vel[1],
        vz=vel[2],
        vx_2LPT=vel_2lpt[0],
        vy_2LPT=vel_2lpt[1],
        vz_2LPT=vel_2lpt[2],
        lowres_vcb=lowres_vcb,
    )
