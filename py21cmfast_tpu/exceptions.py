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

    Mirrors the reference's per-kernel isfinite sweeps; call after computing a
    box when debugging or in drivers' strict mode."""
    for f in dataclasses.fields(output):
        if fields is not None and f.name not in fields:
            continue
        val = getattr(output, f.name)
        if val is None:
            continue
        arr = np.asarray(val)
        if arr.dtype.kind == "f" and not np.all(np.isfinite(arr)):
            n_bad = int(np.sum(~np.isfinite(arr)))
            raise InfinityOrNaNError(
                f"{type(output).__name__}.{f.name} has {n_bad} non-finite values"
                + (f" ({context})" if context else "")
            )
    return output
