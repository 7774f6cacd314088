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


# Above this many k-cells the x/y c2c transforms run as a z-chunked python
# loop writing back into ONE donated buffer: the x/y FFTs are independent
# per kz-plane, so peak HBM is the spectrum + one slab's transform temps.
# (A pass-per-axis pipeline transiently holds 2-3 padded half-spectra —
# 5.37 GB each at 1024^3 since the 513-lane dim tiles to 640 — and sits
# ~100 MB from the ceiling: it OOMed intermittently.)
_SERIALIZE_K_CELLS = 512 * 512 * 512
_XY_Z_CHUNK = 128  # lanes per slab


def _xy_fft_slab_body(y, z0, *, zw, kind):
    sl = jax.lax.dynamic_slice_in_dim(y, z0, zw, axis=2)
    op = jnp.fft.fft if kind == "fft" else jnp.fft.ifft
    sl = op(op(sl, axis=1), axis=0)
    return jax.lax.dynamic_update_slice_in_dim(y, sl, z0, axis=2)


_xy_fft_slab = partial(
    jax.jit, static_argnames=("zw", "kind"), donate_argnums=(0,)
)(_xy_fft_slab_body)


def _fft_passes_xy(y, kind, owned):
    """Both x/y c2c passes.  For big owned buffers: z-chunked in-place loop
    (donated slab updates); otherwise the per-axis chunk-scanned passes."""
    big = int(np.prod(y.shape)) >= _SERIALIZE_K_CELLS
    if big and owned and not isinstance(y, jax.core.Tracer):
        nz = y.shape[2]
        z0 = 0
        while z0 < nz:
            zw = min(_XY_Z_CHUNK, nz - z0)
            y = _xy_fft_slab(y, z0, zw=zw, kind=kind)
            jax.block_until_ready(y)
            z0 += zw
        return y
    first = _fft_pass_inplace if owned else _fft_pass
    axes = (1, 0) if kind == "fft" else (0, 1)
    y = first(y, axis=axes[0], nchunks=_nchunks(y.shape, 2), kind=kind)
    y = _fft_pass_inplace(y, axis=axes[1], nchunks=_nchunks(y.shape, 2), kind=kind)
    return y


def _rfft3_staged(x):
    shape = x.shape
    y = _rfft_z_pass(x, nchunks=_nchunks(shape, 0))
    if not isinstance(y, jax.core.Tracer):
        jax.block_until_ready(y)
    return _fft_passes_xy(y, "fft", owned=True)


def irfft3_consume(kx_box, shape):
    """Staged inverse transform that CONSUMES its input spectrum.

    `kx_box` is a single-element list; the caller must drop every other
    reference before calling — the x/y passes then run in place through the
    z-chunked donated loop (see _fft_passes_xy)."""
    kx = kx_box.pop()
    y = _fft_passes_xy(kx, "ifft", owned=True)
    del kx
    if not isinstance(y, jax.core.Tracer):
        jax.block_until_ready(y)
    return _irfft_z_pass(y, nz=shape[2], nchunks=_nchunks(y.shape, 0))


@jax.jit
def _copy(x):
    return x + 0.0


def _irfft3_staged(kx, shape, own_input=False):
    # the caller may still hold kx (e.g. d_k reused across several gradient
    # fields): copy first, then run the in-place z-chunked passes on the copy
    if not own_input and not isinstance(kx, jax.core.Tracer):
        kx = _copy(kx)
        jax.block_until_ready(kx)
    y = _fft_passes_xy(kx, "ifft", owned=True)
    del kx
    if not isinstance(y, jax.core.Tracer):
        jax.block_until_ready(y)
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


# ---------------------------------------------------------------------------
# kz-major transposed spectrum layout ("kT": (nz//2+1, nx, ny)) for the big
# ICs pipeline.  In the standard (nx, ny, nz//2+1) layout the 513-wide lane
# dim tiles to 640 (each 1024^3 spectrum is 5.37 GB instead of 4.30) and the
# x/y transforms must chunk along a data-carrying axis; kz-major removes the
# padding AND makes every x/y transform chunk a set of independent kz-planes.


@partial(jax.jit, static_argnames=("shape",))
def _czeros(shape):
    """Eager complex64 zeros built ON DEVICE from real zeros: the axon
    transfer path cannot upload complex constants after the first D2H
    (UNIMPLEMENTED), so `jnp.zeros(..., complex64)` at the top level is
    unreliable; inside a jit the constant lowers into the program instead."""
    z = jnp.zeros(shape, jnp.float32)
    return jax.lax.complex(z, z)


def _kt_chunks(nzh):
    z0 = 0
    while z0 < nzh:
        zw = min(128, nzh - z0)
        yield z0, zw
        z0 += zw


def _rfft_to_kt_body(x, out, x0, *, sx):
    sl = jax.lax.dynamic_slice_in_dim(x, x0, sx, axis=0)
    k = jnp.fft.rfft(sl, axis=2)            # (sx, ny, nzh)
    k = jnp.transpose(k, (2, 0, 1))          # (nzh, sx, ny)
    return jax.lax.dynamic_update_slice_in_dim(out, k, x0, axis=1)


_rfft_to_kt = partial(jax.jit, static_argnames=("sx",), donate_argnums=(1,))(
    _rfft_to_kt_body
)


def _xy_kt_slab_body(y, z0, *, zw, kind):
    sl = jax.lax.dynamic_slice_in_dim(y, z0, zw, axis=0)
    op = jnp.fft.fft if kind == "fft" else jnp.fft.ifft
    sl = op(op(sl, axis=2), axis=1)
    return jax.lax.dynamic_update_slice_in_dim(y, sl, z0, axis=0)


_xy_kt_slab = partial(
    jax.jit, static_argnames=("zw", "kind"), donate_argnums=(0,)
)(_xy_kt_slab_body)


def _irfft_from_kt_body(y, out, x0, *, sx, nz):
    sl = jax.lax.dynamic_slice_in_dim(y, x0, sx, axis=1)  # (nzh, sx, ny)
    sl = jnp.transpose(sl, (1, 2, 0))                      # (sx, ny, nzh)
    r = jnp.fft.irfft(sl, n=nz, axis=2)
    return jax.lax.dynamic_update_slice_in_dim(out, r, x0, axis=0)


_irfft_from_kt = partial(
    jax.jit, static_argnames=("sx", "nz"), donate_argnums=(1,)
)(_irfft_from_kt_body)


def _x_slab_width(shape):
    per_row = shape[1] * (shape[2] // 2 + 1)
    sx = max(1, _CHUNK_ELEMS // per_row)
    while shape[0] % sx:
        sx -= 1
    return sx


def rfft3_kt(x):
    """(nx, ny, nz) f32 -> kz-major (nz//2+1, nx, ny) c64 spectrum."""
    nx, ny, nz = x.shape
    nzh = nz // 2 + 1
    sx = _x_slab_width(x.shape)
    out = _czeros((nzh, nx, ny))
    for x0 in range(0, nx, sx):
        out = _rfft_to_kt(x, out, x0, sx=sx)
        jax.block_until_ready(out)
    for z0, zw in _kt_chunks(nzh):
        out = _xy_kt_slab(out, z0, zw=zw, kind="fft")
        jax.block_until_ready(out)
    return out


def _fold_kt_spectrum_body(y, *, hi_shape, out_shape):
    """Alias-fold a kz-major hires spectrum down to the STANDARD-layout
    spectrum of its stride-decimated real field (exact identity: taking
    every R-th sample of an N-point IDFT equals the IDFT of the spectrum
    folded modulo N/R, X'[k'] = (1/R) sum_m X[k' + m N/R]).

    This lets the big-grid ICs path produce its lowres fields WITHOUT ever
    materializing a second hires real grid (reference filters-then-decimates
    in real space, InitialConditions.c:700-740; the decimation step commutes
    with the inverse FFT via this fold).  Requires integer ratios.
    """
    nx, ny, nz = hi_shape
    ox, oy, oz = out_shape
    rx, ry, rz = nx // ox, ny // oy, nz // oz
    nzh = nz // 2 + 1
    ozh = oz // 2 + 1
    assert y.shape == (nzh, nx, ny)
    # fold the two full-FFT axes: k = k' + m*(N/R) with the block index major
    y2 = y.reshape(nzh, rx, ox, ry, oy).sum(axis=(1, 3))
    # fold the rfft half-axis: contributions beyond nz/2 come from the
    # Hermitian mirror conj(Y[nz-k, -kx, -ky]) (fold and xy-flip commute)
    flip = None
    kzp = np.arange(ozh)
    acc = None
    for m in range(rz):
        k = kzp + m * oz
        direct = k <= nz // 2
        if direct.all():
            term = jax.lax.dynamic_slice_in_dim(y2, m * oz, ozh, axis=0)
        else:
            if flip is None:
                flip = jnp.conj(
                    jnp.roll(y2[:, ::-1, ::-1], (1, 1), axis=(1, 2))
                )
            idx_d = jnp.asarray(np.where(direct, k, 0))
            idx_m = jnp.asarray(np.where(direct, 0, nz - k))
            term = jnp.where(
                jnp.asarray(direct)[:, None, None],
                jnp.take(y2, idx_d, axis=0),
                jnp.take(flip, idx_m, axis=0),
            )
        acc = term if acc is None else acc + term
    acc = acc * jnp.float32(1.0 / (rx * ry * rz))
    # kz-major (ozh, ox, oy) -> standard (ox, oy, ozh)
    return jnp.transpose(acc, (1, 2, 0))


# no donation: the output is a small spectrum, never reusable as the input
fold_kt_spectrum = partial(
    jax.jit, static_argnames=("hi_shape", "out_shape")
)(_fold_kt_spectrum_body)


def can_fold(hi_shape, out_shape) -> bool:
    """Fold decimation applies when every axis ratio is an exact integer
    (then grids.resample_indices is exactly stride-R with offset 0)."""
    return all(h % o == 0 for h, o in zip(hi_shape, out_shape))


def irfft3_kt_consume(y_box, shape):
    """kz-major spectrum -> (nx, ny, nz) f32; consumes its input."""
    y = y_box.pop()
    nzh = y.shape[0]
    nx, ny, nz = shape
    for z0, zw in _kt_chunks(nzh):
        y = _xy_kt_slab(y, z0, zw=zw, kind="ifft")
        jax.block_until_ready(y)
    out = jnp.zeros(shape, jnp.float32)
    sx = _x_slab_width(shape)
    for x0 in range(0, nx, sx):
        out = _irfft_from_kt(y, out, x0, sx=sx, nz=nz)
        jax.block_until_ready(out)
    del y
    return out
