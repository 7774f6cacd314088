"""21-cm brightness temperature.

TPU-native equivalent of reference BrightnessTemperatureBox.c:22-105: a single
fused elementwise kernel (XLA fuses the whole expression into one HBM pass).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp

from ..cosmology.constants import physconst
from ..inputs import InputParameters
from ..outputs import BrightnessTemp, IonizedBox, PerturbedField, TsBox

__all__ = ["brightness_temperature", "brightness_constant"]


def brightness_constant(inputs: InputParameters, redshift: float) -> float:
    """The saturated-Ts Tb prefactor in mK (BrightnessTemperatureBox.c:49-53)."""
    cp = inputs.cosmo_params
    return (
        27.0
        * (cp.OMb * cp.hlittle**2 / 0.023)
        * ((0.15 / cp.OMm / cp.hlittle**2) * (1.0 + redshift) / 10.0) ** 0.5
    )


@partial(jax.jit, static_argnames=("use_ts",))
def _tb_kernel(xh, delta, ts, const_factor, t_rad, zp1, *, use_ts):
    tb = const_factor * xh * (1.0 + delta)
    if use_ts:
        # optical-depth form: tau21 = prefactors * (1+z)/Ts (in K; the 1000
        # converts the mK prefactor), then Tb = (1-exp(-tau)) (Ts-Tcmb)/(1+z)
        tau = tb * zp1 / (1000.0 * ts)
        tb = (1.0 - jnp.exp(-tau)) * 1000.0 * (ts - t_rad) / zp1
        return tb, tau
    return tb, None


def brightness_temperature(
    inputs: InputParameters,
    ionized_box: IonizedBox,
    perturbed_field: PerturbedField,
    spin_temp: TsBox | None = None,
) -> BrightnessTemp:
    redshift = float(ionized_box.redshift)
    t_rad = physconst.T_cmb * (1 + redshift)
    const_factor = brightness_constant(inputs, redshift)
    tb, tau = _tb_kernel(
        ionized_box.neutral_fraction,
        perturbed_field.density,
        spin_temp.spin_temperature if spin_temp is not None else jnp.float32(1.0),
        jnp.float32(const_factor),
        jnp.float32(t_rad),
        jnp.float32(1.0 + redshift),
        use_ts=spin_temp is not None,
    )
    return BrightnessTemp(redshift=np.float32(redshift), brightness_temp=tb, tau_21=tau)
