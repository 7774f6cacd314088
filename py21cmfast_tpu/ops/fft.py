"""3D real FFT wrappers (single-device path).

All physics code calls `rfft3`/`irfft3` rather than jnp.fft directly so that the
sharded (mesh) implementation in `parallel.pfft` can be swapped in transparently.
Conventions: forward = unnormalized sum (numpy default), inverse includes 1/N —
i.e. `irfft3(rfft3(x)) == x`.  See models/ics.py for how this maps onto the
reference's FFTW normalization bookkeeping.

Large grids take a staged low-memory path: the XLA TPU lowering of a monolithic
1024^3 c2r holds ~16 GB of HLO temps (measured on v5e: two 4 GB relayout
fusions + four 2 GB remat copies — more than the whole chip), because the rfftn
is compiled as one program with every transpose materialized.  `_fft_pass`
instead runs one axis at a time as its own dispatch, chunk-scanned along a
perpendicular axis with the carry donated, so peak HBM is in + out + one
chunk's transform temps (~2 grids + ~0.5 GB at 1024^3 instead of ~4.5 grids).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Above this many cells, route through the staged per-axis path.
_STAGED_FFT_CELLS = 600**3
# Target chunk footprint (complex64 elements) per scan step.
_CHUNK_ELEMS = 8 * 1024 * 1024


def _nchunks(shape, chunk_axis):
    other = int(np.prod(shape) // shape[chunk_axis])
    per_chunk = max(1, _CHUNK_ELEMS // max(other, 1))
    n = max(1, shape[chunk_axis] // max(per_chunk, 1))
    while shape[chunk_axis] % n:
        n += 1
    return n


def _fft_pass_body(y, *, axis, nchunks, kind):
    """One complex->complex FFT pass along `axis`, chunk-scanned along a
    perpendicular axis.  `kind` is 'fft' or 'ifft'."""
    chunk_axis = 2 if axis != 2 else 0
    n = y.shape[chunk_axis]
    step = n // nchunks
    op = jnp.fft.fft if kind == "fft" else jnp.fft.ifft

    def body(carry, i):
        sl = jax.lax.dynamic_slice_in_dim(carry, i * step, step, axis=chunk_axis)
        sl = op(sl, axis=axis)
        carry = jax.lax.dynamic_update_slice_in_dim(
            carry, sl, i * step, axis=chunk_axis
        )
        return carry, None

    y, _ = jax.lax.scan(body, y, jnp.arange(nchunks))
    return y


# Donating variant for intermediate buffers we own; non-donating for the first
# pass over a caller-held array (donation would free the caller's buffer).
# Donation only helps (and only avoids warnings) on TPU at top level.
_fft_pass_donating = partial(
    jax.jit, static_argnames=("axis", "nchunks", "kind"), donate_argnums=(0,)
)(_fft_pass_body)
_fft_pass = partial(jax.jit, static_argnames=("axis", "nchunks", "kind"))(
    _fft_pass_body
)


def _fft_pass_inplace(y, **kw):
    if not isinstance(y, jax.core.Tracer) and jax.default_backend() == "tpu":
        return _fft_pass_donating(y, **kw)
    return _fft_pass(y, **kw)


@partial(jax.jit, static_argnames=("nchunks",))
def _rfft_z_pass(x, *, nchunks):
    """f32 (nx, ny, nz) -> c64 (nx, ny, nz//2+1) along the last axis."""
    nx, ny, nz = x.shape
    step = nx // nchunks
    out = jnp.zeros((nx, ny, nz // 2 + 1), jnp.complex64)

    def body(carry, i):
        sl = jax.lax.dynamic_slice_in_dim(x, i * step, step, axis=0)
        carry = jax.lax.dynamic_update_slice_in_dim(
            carry, jnp.fft.rfft(sl, axis=2), i * step, axis=0
        )
        return carry, None

    out, _ = jax.lax.scan(body, out, jnp.arange(nchunks))
    return out


def _irfft_z_pass_body(kx, *, nz, nchunks):
    """c64 (nx, ny, nz//2+1) -> f32 (nx, ny, nz) along the last axis."""
    nx = kx.shape[0]
    step = nx // nchunks
    out = jnp.zeros((nx, kx.shape[1], nz), jnp.float32)

    def body(carry, i):
        sl = jax.lax.dynamic_slice_in_dim(kx, i * step, step, axis=0)
        carry = jax.lax.dynamic_update_slice_in_dim(
            carry, jnp.fft.irfft(sl, n=nz, axis=2), i * step, axis=0
        )
        return carry, None

    out, _ = jax.lax.scan(body, out, jnp.arange(nchunks))
    return out


_irfft_z_pass_donating = partial(
    jax.jit, static_argnames=("nz", "nchunks"), donate_argnums=(0,)
)(_irfft_z_pass_body)
_irfft_z_pass_plain = partial(jax.jit, static_argnames=("nz", "nchunks"))(
    _irfft_z_pass_body
)


def _irfft_z_pass(kx, **kw):
    if not isinstance(kx, jax.core.Tracer) and jax.default_backend() == "tpu":
        return _irfft_z_pass_donating(kx, **kw)
    return _irfft_z_pass_plain(kx, **kw)


# Above this many k-cells the c2c passes serialize (block + free between
# dispatches): async enqueue would transiently hold three padded
# half-spectra (~16 GB at 1024^3) whether or not donation is accepted.
_SERIALIZE_K_CELLS = 512 * 512 * 512


def _rfft3_staged(x):
    shape = x.shape
    y = _rfft_z_pass(x, nchunks=_nchunks(shape, 0))
    serialize = (
        int(np.prod(y.shape)) >= _SERIALIZE_K_CELLS
        and not isinstance(y, jax.core.Tracer)
    )
    for axis in (1, 0):
        if serialize:
            jax.block_until_ready(y)
        y2 = _fft_pass_inplace(
            y, axis=axis, nchunks=_nchunks(y.shape, 2), kind="fft"
        )
        del y
        y = y2
    return y


def irfft3_consume(kx_box, shape):
    """Staged inverse transform that CONSUMES its input spectrum.

    `kx_box` is a single-element list; the caller must drop every other
    reference before calling.  Each pass blocks and frees its predecessor
    before the next allocates: at 1024^3 the c64 half-spectrum pads
    513 -> 640 lanes (5.37 GB), and without this discipline the async
    dispatch transiently holds three of them (~16 GB > chip) even when
    buffer donation is accepted."""
    kx = kx_box.pop()
    y = _fft_pass_inplace(kx, axis=0, nchunks=_nchunks(kx.shape, 2), kind="ifft")
    jax.block_until_ready(y)
    del kx
    y2 = _fft_pass_inplace(y, axis=1, nchunks=_nchunks(y.shape, 2), kind="ifft")
    jax.block_until_ready(y2)
    del y
    return _irfft_z_pass(y2, nz=shape[2], nchunks=_nchunks(y2.shape, 0))


def _irfft3_staged(kx, shape, own_input=False):
    # by default the first pass must NOT donate: the caller may still hold kx
    # (e.g. d_k reused across several gradient fields).  `own_input=True`
    # (caller-owned temporary) lets the whole chain run in place — at 1024^3
    # the extra 4.3 GB buffer is the difference between fitting and OOM.
    first = _fft_pass_inplace if own_input else _fft_pass
    y = first(kx, axis=0, nchunks=_nchunks(kx.shape, 2), kind="ifft")
    y = _fft_pass_inplace(y, axis=1, nchunks=_nchunks(y.shape, 2), kind="ifft")
    return _irfft_z_pass(y, nz=shape[2], nchunks=_nchunks(y.shape, 0))


def rfft3(x):
    if int(np.prod(x.shape)) >= _STAGED_FFT_CELLS:
        return _rfft3_staged(x)
    return jnp.fft.rfftn(x, axes=(0, 1, 2))


def irfft3(kx, shape=None):
    if shape is None:
        n0, n1, nzh = kx.shape
        shape = (n0, n1, 2 * (nzh - 1))
    if int(np.prod(shape)) >= _STAGED_FFT_CELLS:
        return _irfft3_staged(kx, shape)
    return jnp.fft.irfftn(kx, s=shape, axes=(0, 1, 2))
