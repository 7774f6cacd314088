"""Typed exceptions + output validation.

Equivalent of reference exceptions.h:12-21 + wrapper/exceptions.py:8-117: the C
exit-code protocol becomes plain Python exceptions; NaN/Inf guards that the C
kernels run per-cell (e.g. SpinTemperatureBox.c:1915-1935) become cheap
device-side reductions checked at box boundaries.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = [
    "ParameterError",
    "TableGenerationError",
    "InfinityOrNaNError",
    "PhotonConsError",
    "validate_box",
]


class ParameterError(ValueError):
    """Invalid or inconsistent input parameters."""


class TableGenerationError(RuntimeError):
    """An interpolation table could not be built (bad limits, non-finite)."""


class InfinityOrNaNError(FloatingPointError):
    """A computed box contains non-finite values."""


class PhotonConsError(RuntimeError):
    """The photon-conservation correction failed (e.g. stalled reionization)."""


def validate_box(output, fields=None, context=""):
    """Raise InfinityOrNaNError if any named array field is non-finite.

    Mirrors the reference's per-kernel isfinite sweeps (SpinTemperatureBox.c:
    1915-1935, IonisationBox.c:1610).  Called per snapshot by the drivers when
    `config["validate_outputs"]` is on (the default).  jax arrays are reduced
    on device (one scalar transfer per field), never pulled to host."""
    for f in dataclasses.fields(output):
        if fields is not None and f.name not in fields:
            continue
        val = getattr(output, f.name)
        if val is None:
            continue
        if hasattr(val, "dtype") and hasattr(val, "device"):
            # jax array: device-side reduction, one scalar transfer
            if np.dtype(val.dtype).kind != "f":
                continue
            import jax.numpy as jnp

            bad = int(jnp.sum(~jnp.isfinite(val)))
        else:
            arr = np.asarray(val)
            if arr.dtype.kind != "f":
                continue
            bad = int(np.sum(~np.isfinite(arr)))
        if bad:
            raise InfinityOrNaNError(
                f"{type(output).__name__}.{f.name} has {bad} non-finite values"
                + (f" ({context})" if context else "")
            )
    return output


def validate_snapshot(z, *outputs):
    """Validate every box of a snapshot if config['validate_outputs'] is set."""
    from ._cfg import config

    if not config.get("validate_outputs", True):
        return
    for out in outputs:
        if out is not None and dataclasses.is_dataclass(out):
            validate_box(out, context=f"z={z:.3f}")
