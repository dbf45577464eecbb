"""Padded big-odd mode: the tiled level kernels on LARGE odd shapes.

The round-5 ragged row-grid kernels (``pallas_ragged.py``) serve any
shape whose trailing-axes flat volume fits one VMEM value chain
(~26K padded words, e.g. the reference's own [164,64,40]); shapes above
that with a non-128-multiple last axis — 250³-class volumes — had no
kernel family and were refused on accelerators. This module closes them
by running the PROVEN tiled kernels (``pallas_kernels``) on a padded
"work" shape:

* **Leading axes**: rounded up to tile multiples; the circular wrap is
  supplied by XLA wrap-concat (``[x tail | x | x head | garbage]``) and
  the kernels run in their existing ``padded`` concat-valid mode (single
  contiguous aligned segment reads — sublane DMA starts must be PROVABLY
  8-aligned on this hardware, probed r5, so direct ragged addressing of
  odd row extents is impossible and pre-padding is the general answer).
  Garbage rows beyond the true extent produce garbage bands, discarded
  at the final slice.
* **Last (lane) axis**: padded to a 128 multiple; in-kernel circular
  rolls wrap at the LOGICAL extent via masked double-rotates
  (``pallas_kernels._lane_roll_logical`` — the ``pallas_4d`` masked
  rotate pattern), so the odd periodic boundary is exact.

Cost model: the kernels run on (1+ε)× the volume at full tiled-kernel
speed; the XLA glue adds ~4 passes over the volume per dec level (wrap
concats) plus one band-array pass at each API boundary (the output
slice in ``dec``, the band wrap-pad in ``rec``). Fused pairs could keep
the padded layout internally; v1 keeps the plan API simple.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import pallas_kernels as pk


def _roundup(n, m):
    return -(-n // m) * m


def _work_shape(shape):
    """Leading axes to 32-multiples (every tile table divides 32), lanes
    to 128."""
    return tuple(
        _roundup(s, 128 if ax == len(shape) - 1 else 32)
        for ax, s in enumerate(shape)
    )


def supported(shape, dtype, taps_np) -> bool:
    if len(shape) not in (2, 3):
        return False
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    work = _work_shape(shape)
    # halos must fit inside the true extents (wrap slices read x[-w:], x[:w])
    dec_h = pk._dec_halos(len(shape), taps_np)
    rec_h = pk._rec_halos(len(shape), taps_np)
    for ax in range(len(shape) - 1):
        w = max(dec_h[ax][0], dec_h[ax][1], rec_h[ax][0], rec_h[ax][1])
        if shape[ax] < w:
            return False
    if max(t.shape[1] for t in taps_np) > shape[-1]:
        return False
    masked = work[-1] != shape[-1]
    return (
        pk._supported(work, dtype)
        and pk._dec_tiles(work, taps_np, masked_lanes=masked) is not None
        and pk._rec_tiles(work, taps_np, masked_lanes=masked) is not None
    )


def _wrap_pad_axis(a, ax, n_valid, w_l, w_r, n_work):
    """[wrap_l | valid | wrap_r | garbage] along ``ax``; ``a``'s first
    ``n_valid`` entries on ``ax`` are the valid data (rows beyond are
    padded garbage from a previous kernel's work shape, or absent)."""
    def sl(start, stop):
        idx = [slice(None)] * a.ndim
        idx[ax] = slice(start, stop)
        return a[tuple(idx)]

    parts = []
    if w_l:
        parts.append(sl(n_valid - w_l, n_valid))
    parts.append(sl(0, n_valid))
    tail = w_r + (n_work - n_valid)
    if tail:
        parts.append(sl(0, min(tail, n_valid)))
        if tail > n_valid:  # degenerate tiny axes: top up with zeros
            shp = list(a.shape)
            shp[ax] = tail - n_valid
            parts.append(jnp.zeros(shp, a.dtype))
    return jnp.concatenate(parts, axis=ax) if len(parts) > 1 else a


def _prep_input(a, shape, work, halos):
    """Lane-pad to the work lane extent and wrap-pad every leading axis
    by its kernel halo (+ work-rounding garbage). ``a`` may already carry
    work-shaped lanes/rows (approx carry); only its valid region is
    read."""
    ndim = len(shape)
    if a.shape[-1] == shape[-1] and work[-1] != shape[-1]:
        a = jnp.pad(
            a, [(0, 0)] * (ndim - 1) + [(0, work[-1] - shape[-1])]
        )
    for ax in range(ndim - 1):
        w_l, w_r = halos[ax][0], halos[ax][1]
        a = _wrap_pad_axis(a, ax, shape[ax], w_l, w_r, work[ax])
    return a


def dec_padded(x, taps_np, level: int, lam: float = 0.0):
    """Multilevel analysis of a big odd shape; returns compact
    (B, *shape)."""
    shape = x.shape
    ndim = len(shape)
    work = _work_shape(shape)
    halos = pk._dec_halos(ndim, taps_np)
    padded = (True,) * (ndim - 1)
    nb = 2**ndim
    B = nb + (nb - 1) * (level - 1)
    # plain rolls when the lane axis is already a 128-multiple (only the
    # leading axes were ragged)
    lane_log = shape[-1] if work[-1] != shape[-1] else None
    big = jnp.empty((B,) + work, x.dtype)
    approx = x
    off = B
    for lvl in range(level):
        off -= nb - 1
        final = lvl == level - 1
        xp = _prep_input(approx, shape, work, halos)
        out = pk._fused_dec_level(
            xp, big, off, taps_np, shape=work, padded=padded,
            approx_to_big=final, lam=lam, lane_logical=lane_log,
        )
        if final:
            big = out
        else:
            big, approx = out
    sl = (slice(None),) + tuple(slice(0, s) for s in shape)
    return big[sl]


def rec_padded(y, taps_np, level: int, preserve_l2: bool):
    """Multilevel synthesis from compact (B, *shape) bands of a big odd
    shape; returns (shape)."""
    shape = y.shape[1:]
    ndim = len(shape)
    work = _work_shape(shape)
    halos = pk._rec_halos(ndim, taps_np)
    padded = (True,) * (ndim - 1)
    nb = 2**ndim
    scale = 1.0 if preserve_l2 else 1.0 / nb
    lane_log = shape[-1] if work[-1] != shape[-1] else None
    # One wrap-pad of the whole band array (lead axes by the rec halos).
    yp = _prep_input(y, (y.shape[0],) + shape,
                     (y.shape[0],) + work,
                     [(0, 0)] + list(halos))
    band_src = [("y", b) for b in range(nb)]
    acc = pk._fused_rec_level(
        yp, None, band_src, taps_np, scale, shape=work, padded=padded,
        lane_logical=lane_log,
    )
    pos = nb
    for _ in range(1, level):
        accp = _prep_input(acc, shape, work, halos)
        band_src = [("a", 0)] + [("y", pos + b - 1) for b in range(1, nb)]
        acc = pk._fused_rec_level(
            yp, accp, band_src, taps_np, scale, shape=work, padded=padded,
            lane_logical=lane_log,
        )
        pos += nb - 1
    return acc[tuple(slice(0, s) for s in shape)]
