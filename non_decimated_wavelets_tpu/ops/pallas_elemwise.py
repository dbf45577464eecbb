"""Fused elementwise Pallas kernels for iterative solvers on shapes too
large for the resident/flat whole-solve kernels (``pallas_flat``'s
multi-iterate modes cap at ~130K elements of VMEM-resident state).

Motivation (measured on the tunneled v5e): XLA elementwise programs move
data at only ~55 GB/s on this device while the Pallas DMA path sustains
200-250 GB/s, and each XLA op is a separate full-array pass. A FISTA
iterate's glue — momentum extrapolation plus the masked-image data term,

    z = x_new + mom * (x_new - x_prev)
    v = z - step * M(M z - b)

— is ~7 XLA ops (5 full-array reads + several writes); fused here it is
ONE grid pass: 4 reads + 1 write at the DMA ceiling. Together with the
shrink fused into the tiled dec kernels (``pallas_kernels._make_dec_kernel``
``lam``) this makes the big-shape FISTA iterate end-to-end Pallas.

The arrays are viewed flat as ``(R, 1024)`` (row-major, so every operand
tile is one contiguous DMA) — valid for any shape whose numel is a
multiple of 1024; the dispatcher falls back to XLA otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _up

_LANES = 1024
# 5 operand tiles live at once (4 in + 1 out) plus compute temps, against
# the 16MB scoped VMEM at Mosaic's ~2.4x accounting.
_MAX_TILE_ROWS = 128


def _layout(numel: int):
    """(R, TR) flat-view rows and tile rows, or None if unsupported."""
    if numel % _LANES:
        return None
    R = numel // _LANES
    tr = _MAX_TILE_ROWS
    while R % tr:
        tr //= 2
    return R, tr


def supported(shape, dtype) -> bool:
    return (
        jnp.dtype(dtype) in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))
        and _layout(int(np.prod(shape))) is not None
    )


def mag_shrink_pair(y_pair, lam: float):
    """Joint re/im magnitude soft-threshold of a split-complex band-first
    array ``(2, B, *spatial)``, detail bands only — one fused pass (both
    components read+written once) instead of the XLA magnitude/concat
    chain. Band 0 (the approximation) passes through, selected in-kernel
    by flat row index (requires the per-band numel to be a multiple of
    the flat lane width; the dispatcher falls back otherwise)."""
    two, B = y_pair.shape[:2]
    sp = y_pair.shape[2:]
    numel_b = int(np.prod((B,) + sp))
    numel_sp = int(np.prod(sp))
    lay = _layout(numel_b)
    if lay is None or numel_sp % _LANES:
        return None
    R, tr = lay
    rows0 = numel_sp // _LANES  # rows belonging to the approximation band
    dt = y_pair.dtype

    def kernel(y0_ref, y1_ref, o0_ref, o1_ref):
        i = pl.program_id(0)
        y0 = _up(y0_ref[...])
        y1 = _up(y1_ref[...])
        mag = jnp.sqrt(y0 * y0 + y1 * y1)
        fac = jnp.maximum(mag - lam, 0.0) / jnp.maximum(mag, 1e-30)
        row = (
            i * np.int32(tr)
            + jax.lax.broadcasted_iota(jnp.int32, y0.shape, 0)
        )
        fac = jnp.where(row < np.int32(rows0), 1.0, fac)
        o0_ref[...] = (y0 * fac).astype(o0_ref.dtype)
        o1_ref[...] = (y1 * fac).astype(o1_ref.dtype)

    tile = pl.BlockSpec((tr, _LANES), lambda i: (i, np.int32(0)))
    o0, o1 = pl.pallas_call(
        kernel,
        grid=(R // tr,),
        in_specs=[tile, tile],
        out_specs=(tile, tile),
        out_shape=(
            jax.ShapeDtypeStruct((R, _LANES), dt),
            jax.ShapeDtypeStruct((R, _LANES), dt),
        ),
    )(
        y_pair[0].reshape(R, _LANES),
        y_pair[1].reshape(R, _LANES),
    )
    return jnp.stack(
        [o0.reshape((B,) + sp), o1.reshape((B,) + sp)]
    )


def fista_step(x_new, x_prev, mask, b, mom, step: float):
    """One fused FISTA glue pass: returns ``v = z - step*M(Mz - b)`` with
    ``z = x_new + mom*(x_new - x_prev)``. ``mom`` is a traced scalar (the
    per-iteration momentum coefficient, carried through ``lax.scan``);
    ``step`` is static. All four arrays share ``x_new``'s shape."""
    shape = x_new.shape
    numel = int(np.prod(shape))
    R, tr = _layout(numel)
    dt = x_new.dtype

    def kernel(mom_ref, xn_ref, xp_ref, m_ref, b_ref, v_ref):
        mom_v = mom_ref[0]
        xn = _up(xn_ref[...])
        z = xn + mom_v * (xn - _up(xp_ref[...]))
        m = _up(m_ref[...])
        v = z - step * (m * (m * z - _up(b_ref[...])))
        v_ref[...] = v.astype(v_ref.dtype)

    tile = pl.BlockSpec((tr, _LANES), lambda i: (i, np.int32(0)))
    out = pl.pallas_call(
        kernel,
        grid=(R // tr,),
        in_specs=[
            pl.BlockSpec(
                (1,), lambda i: (np.int32(0),), memory_space=pltpu.SMEM
            ),
            tile, tile, tile, tile,
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((R, _LANES), dt),
    )(
        jnp.asarray(mom, jnp.float32).reshape(1),
        x_new.reshape(R, _LANES),
        jnp.asarray(x_prev, dt).reshape(R, _LANES),
        jnp.asarray(mask, dt).reshape(R, _LANES),
        jnp.asarray(b, dt).reshape(R, _LANES),
    )
    return out.reshape(shape)
