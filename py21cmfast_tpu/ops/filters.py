"""k-space filter bank (device-side, jittable).

Behavioral parity with reference filtering.c:18-307.  Every filter is expressed
as a pure function of the |k| grid so XLA fuses the multiply into surrounding
FFT pre/post work.  Filter ids match the reference:

  0: real-space spherical tophat        W(kR) = 3 (sin kR - kR cos kR)/(kR)^3
  1: sharp-k                            W = [kR * 0.4136 <= 1]
  2: gaussian (width 0.643/R)           W = exp(-0.643^2 (kR)^2/2)
  3: exponential-MFP tophat (Davies & Furlanetto)
  4: spherical shell (annulus R_inner=R_param, R_outer=R)
  5: Ly-a multiple-scattering window (host-tabulated 2F3; see spintemp module)
"""

from __future__ import annotations

import jax.numpy as jnp

TOPHAT = 0
SHARPK = 1
GAUSSIAN = 2
EXP_MFP = 3
SHELL = 4


def w_tophat(kr):
    kr = jnp.asarray(kr)
    safe = jnp.where(kr < 1e-4, 1.0, kr)
    w = 3.0 * (jnp.sin(safe) - safe * jnp.cos(safe)) / safe**3
    return jnp.where(kr < 1e-4, 1.0 - kr * kr / 10.0, w)


def w_sharpk(kr):
    return jnp.where(kr * 0.413566994 > 1.0, 0.0, 1.0)


def w_gaussian_sq(kr_sq):
    return jnp.exp(-0.643 * 0.643 * kr_sq / 2.0)


def w_exp_mfp(k, R, mfp):
    """Davies & Furlanetto exponentially-damped tophat (filtering.c:80-104).

    Window for photons with mean free path `mfp` inside a tophat of radius R.
    """
    kr = k * R
    ratio = mfp / R
    exp_term = jnp.exp(-R / mfp)

    # main expression
    kr_safe = jnp.where(kr < 1e-4, 1.0, kr)
    f = (kr_safe**2 * ratio**2 + 2.0 * ratio + 1.0) * ratio * jnp.cos(kr_safe)
    f = f + (kr_safe**2 * (ratio**2 - ratio**3) + ratio + 1.0) * jnp.sin(kr_safe) / kr_safe
    f = f * exp_term
    f = f - 2.0 * ratio**2
    f = f * (-3.0) * ratio / (kr_safe**2 * ratio**2 + 1.0) ** 2

    # second-order Taylor expansion about kR = 0
    ts_0 = 6.0 * ratio**3 - exp_term * (6.0 * ratio**3 + 6.0 * ratio**2 + 3.0 * ratio)
    taylor = ts_0 + (exp_term * (2.0 * ratio**2 + 0.5 * ratio) - 2.0 * ts_0 * ratio**2) * kr * kr
    return jnp.where(kr < 1e-4, taylor, f)


def w_shell(k, R_inner, R_outer):
    """Spherical-shell (annulus) window (filtering.c:106-117)."""
    kri = k * R_inner
    kro = k * R_outer
    kro_safe = jnp.where(kro < 1e-4, 1.0, kro)
    kri_safe = jnp.where(kro < 1e-4, 0.5, kri)
    w = (
        3.0
        / (kro_safe**3 - kri_safe**3)
        * (
            jnp.sin(kro_safe)
            - jnp.cos(kro_safe) * kro_safe
            - jnp.sin(kri_safe)
            + jnp.cos(kri_safe) * kri_safe
        )
    )
    x = R_inner / R_outer
    taylor = 1.0 - kro * kro / 10.0 * (x**5 - 1.0) / (x**3 - 1.0)
    return jnp.where(kro < 1e-4, taylor, w)


def filter_weights(kmag, filter_type: int, R, R_param=0.0):
    """Return W(k) for the given filter id on the |k| grid (static filter_type)."""
    if filter_type == TOPHAT:
        return w_tophat(kmag * R)
    if filter_type == SHARPK:
        return w_sharpk(kmag * R)
    if filter_type == GAUSSIAN:
        return w_gaussian_sq((kmag * R) ** 2)
    if filter_type == EXP_MFP:
        return w_exp_mfp(kmag, R, R_param)
    if filter_type == SHELL:
        return w_shell(kmag, R, R_param)
    raise ValueError(f"unknown filter type {filter_type}")


def filter_kbox(kbox, kmag, filter_type: int, R, R_param=0.0):
    """Multiply a k-space half-space box by the filter window."""
    return kbox * filter_weights(kmag, filter_type, R, R_param).astype(kbox.real.dtype)
