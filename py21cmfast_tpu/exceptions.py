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
    check_nonfinite(begin_validate_snapshot(z, *outputs))


def begin_validate_snapshot(z, *outputs):
    """Launch the non-finite sweep for a snapshot WITHOUT syncing.

    Returns an opaque pending handle (or None) for `check_nonfinite`.  All
    float fields of every box are counted in ONE fused device program whose
    small result vector is fetched later — the scroll drivers check node i's
    sweep while node i+1 computes, so validation costs no pipeline bubble
    (a per-field `int(jnp.sum(...))` forces ~15 blocking scalar transfers
    per snapshot)."""
    from ._cfg import config

    if not config.get("validate_outputs", True):
        return None
    import jax

    names, dev_arrays, host_bad = [], [], []
    for out in outputs:
        if out is None or not dataclasses.is_dataclass(out):
            continue
        for f in dataclasses.fields(out):
            val = getattr(out, f.name)
            if val is None:
                continue
            label = f"{type(out).__name__}.{f.name}"
            if isinstance(val, jax.Array):
                if np.dtype(val.dtype).kind == "f" and val.ndim > 0:
                    names.append(label)
                    dev_arrays.append(val)
            else:
                arr = np.asarray(val)
                if arr.dtype.kind == "f":
                    n = int(np.sum(~np.isfinite(arr)))
                    if n:
                        host_bad.append((label, n))
    counts = _nonfinite_counts(dev_arrays) if dev_arrays else None
    return (float(z), names, counts, host_bad)


_COUNT_JIT = None


def _nonfinite_counts(arrays):
    import jax
    import jax.numpy as jnp

    global _COUNT_JIT
    if _COUNT_JIT is None:
        # module-level singleton: the jit cache is per-wrapper, and it keys
        # on pytree structure + shapes (constant across a scroll)
        _COUNT_JIT = jax.jit(
            lambda arrs: jnp.stack([jnp.sum(~jnp.isfinite(a)) for a in arrs])
        )
    out = _COUNT_JIT(list(arrays))
    # begin the D2H now so the later check is a cheap wait, not a round trip
    try:
        out.copy_to_host_async()
    except Exception:
        pass
    return out


def check_nonfinite(pending):
    """Fetch a `begin_validate_snapshot` handle and raise on any bad count."""
    if pending is None:
        return
    z, names, counts, host_bad = pending
    bad = list(host_bad)
    if counts is not None:
        vals = np.asarray(counts)
        bad += [(n, int(v)) for n, v in zip(names, vals) if v]
    if bad:
        msgs = ", ".join(f"{n} has {v} non-finite values" for n, v in bad)
        raise InfinityOrNaNError(f"{msgs} (z={z:.3f})")
