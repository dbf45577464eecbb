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
the padded layout internally; v1 keeps the plan API simple. MEMORY
caveat: the boundary conversions hold ~3 concurrent copies of the band
array inside a jitted dec+rec pair (work bands + sliced bands + rec's
wrap-padded bands), so the largest single-chip volume is ~HBM/ (3·B·4)
voxels (hardware: 64x64x100x25 db4 L3 fits a 16GB v5e at 127 Mvox/s;
96x96x100x25 OOMs HBM). Larger volumes belong on the sharded path.

4D: the same idea through the two-stage ``pallas_4d`` kernels — X/Y
wrap-padded lead stage (its ``padded`` mode), and the lane stage's
flattened (Z,T) rolls generalized to LOGICAL extents inside a padded
``(Zp, Tp)`` lane layout (``_pick_geom4`` keeps the lane chunk at
exactly zc*Tp = 128, the hard zct cap). Hardware-verified r5:
previously-refused dynamic-MRI-class shapes (odd frame/slice counts)
run oracle-exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import pallas_kernels as pk


def _pick_geom4(Z, T):
    """(Z, T, Zp, Tp, zc) for the padded 4D lane layout, or None.

    Tp is the smallest power of two >= T in {8,16,32,64,128} so the lane
    chunk is exactly zc*Tp = 128 (zct is hard-capped at 128 on this
    backend — CLAUDE.md REJECTED); Zp rounds Z up to the chunk count.
    The in-kernel rolls wrap at the LOGICAL (Z, T)."""
    for Tp in (8, 16, 32, 64, 128):
        if Tp >= T:
            zc = 128 // Tp
            Zp = _roundup(Z, zc)
            return (Z, T, Zp, Tp, zc)
    return None


def _roundup(n, m):
    return -(-n // m) * m


def _work_shape(shape):
    """Leading axes to 32-multiples (every tile table divides 32), lanes
    to 128."""
    return tuple(
        _roundup(s, 128 if ax == len(shape) - 1 else 32)
        for ax, s in enumerate(shape)
    )


def inflation(shape) -> float:
    """Padded-work voxel inflation — the cost model against the ragged
    kernels on shapes both serve. Measured (r5 A/B on hardware):
    padded wins at 3.7x inflation (164x64x40: 91.7 vs 58.5 Mvox/s pair)
    and at 1.9x (64x64x20x10: 78.5 vs 73.1) — the tiled kernels' plain
    rolls beat the ragged blocked rotates until the lane padding has to
    move several-fold more bytes."""
    if len(shape) == 4:
        g = _pick_geom4(shape[2], shape[3])
        if g is None:
            return float("inf")
        work_vox = (_roundup(shape[0], 32) * _roundup(shape[1], 32)
                    * g[2] * g[3])
    else:
        work_vox = int(np.prod(_work_shape(shape)))
    return work_vox / float(np.prod(shape))


# dispatch preference vs the ragged kernels (see ``inflation``): below
# this the padded tiled kernels win despite moving more bytes.
PREFER_INFLATION = 4.0


def supported(shape, dtype, taps_np) -> bool:
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    if len(shape) == 4:
        return _supported4(shape, dtype, taps_np)
    if len(shape) not in (2, 3):
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
    if x.ndim == 4:
        return dec_padded4(x, taps_np, level, lam=lam)
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
    if y.ndim == 5:
        return rec_padded4(y, taps_np, level, preserve_l2)
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


# ---------------------------------------------------------------------------
# 4D padded mode (the two-stage pallas_4d kernels on a padded work shape)
# ---------------------------------------------------------------------------


def _supported4(shape, dtype, taps_np) -> bool:
    from . import pallas_4d as p4

    if len(taps_np) != 4:
        return False
    X, Y, Z, T = shape
    gz = _pick_geom4(Z, T)
    if gz is None:
        return False
    Zl, Tl, Zp, Tp, zc = gz
    Xp, Yp = _roundup(X, 32), _roundup(Y, 32)
    Lp = Zp * Tp
    K0, K1 = taps_np[0].shape[1], taps_np[1].shape[1]
    K_lane = max(taps_np[2].shape[1], taps_np[3].shape[1])
    if taps_np[2].shape[1] > Z or taps_np[3].shape[1] > T:
        return False
    halos = p4._lead_halos(K0, K1, adjoint=False)
    rhalos = p4._lead_halos(K0, K1, adjoint=True)
    if X < max(halos[0] + rhalos[0]) or Y < max(halos[1] + rhalos[1]):
        return False
    return (
        p4._lane_tiles(Xp, Yp, Lp, K_lane) is not None
        and p4._lead_tiles(Xp, Yp, zc * Tp, K0, K1) is not None
    )


def _lift4(x, shape, geom, Xp, Yp):
    """(X, Y, Z, T) -> work (Xp, Yp, Lp) with zero row/lane padding.
    ``x`` may already be work-shaped (approx carry: (Xp, Yp, Lp))."""
    X, Y, Z, T = shape
    Zl, Tl, Zp, Tp, zc = geom
    if x.ndim == 3:
        return x  # already lifted work layout
    xp = jnp.pad(
        x, ((0, Xp - X), (0, Yp - Y), (0, Zp - Z), (0, Tp - T))
    )
    return xp.reshape(Xp, Yp, Zp * Tp)


def dec_padded4(x, taps_np, level: int, lam: float = 0.0):
    """Multilevel 4D analysis of a big odd shape; returns (B, *shape)."""
    from . import pallas_4d as p4

    shape = x.shape
    X, Y, Z, T = shape
    geom = _pick_geom4(Z, T)
    Zl, Tl, Zp, Tp, zc = geom
    Xp, Yp = _roundup(X, 32), _roundup(Y, 32)
    Lp = Zp * Tp
    zct = zc * Tp
    Zcnt = Zp // zc
    g4 = (Zl, Tl, Zp, Tp)
    K_lane = max(taps_np[2].shape[1], taps_np[3].shape[1])
    lane_t = p4._lane_tiles(Xp, Yp, Lp, K_lane)
    lead_t = p4._lead_tiles(Xp, Yp, zct, taps_np[0].shape[1],
                            taps_np[1].shape[1])
    halos = p4._lead_halos(taps_np[0].shape[1], taps_np[1].shape[1],
                           adjoint=False)
    nb = 16
    B = nb + (nb - 1) * (level - 1)
    big5 = jnp.empty((B, Xp, Yp, Zcnt, zct), x.dtype)
    approx = _lift4(x, shape, geom, Xp, Yp)
    off = B
    for lvl in range(level):
        off -= nb - 1
        final = lvl == level - 1
        temp5 = p4._lane_dec_call(
            approx, taps_np, Tp, lane_t, geom=g4
        ).reshape(4, Xp, Yp, Zcnt, zct)
        # X/Y wrap-pad of the valid region (+ work-rounding garbage)
        for ax, (n_valid, n_work) in enumerate(((X, Xp), (Y, Yp))):
            w_l, w_r = halos[ax]
            temp5 = _wrap_pad_axis(temp5, 1 + ax, n_valid, w_l, w_r,
                                   n_work)
        out = p4._lead_dec_call(
            temp5, big5, off, taps_np, lead_t, zct,
            shape_xy=(Xp, Yp), padded=(True, True),
            approx_to_big=final, lam=lam,
        )
        if final:
            big5 = out
        else:
            big5, app = out
            approx = app.reshape(Xp, Yp, Lp)
    y = big5.reshape(B, Xp, Yp, Zp, Tp)
    return y[:, :X, :Y, :Z, :T]


def rec_padded4(y, taps_np, level: int, preserve_l2: bool):
    """Multilevel 4D synthesis from compact bands of a big odd shape."""
    from . import pallas_4d as p4

    shape = y.shape[1:]
    X, Y, Z, T = shape
    B = y.shape[0]
    geom = _pick_geom4(Z, T)
    Zl, Tl, Zp, Tp, zc = geom
    Xp, Yp = _roundup(X, 32), _roundup(Y, 32)
    Lp = Zp * Tp
    zct = zc * Tp
    Zcnt = Zp // zc
    g4 = (Zl, Tl, Zp, Tp)
    K_lane = max(taps_np[2].shape[1], taps_np[3].shape[1])
    lane_t = p4._lane_tiles(Xp, Yp, Lp, K_lane)
    lead_t = p4._lead_tiles(Xp, Yp, zct, taps_np[0].shape[1],
                            taps_np[1].shape[1])
    halos = p4._lead_halos(taps_np[0].shape[1], taps_np[1].shape[1],
                           adjoint=True)
    nb = 16
    scale = 1.0 if preserve_l2 else 1.0 / nb

    yp = jnp.pad(
        y, ((0, 0), (0, Xp - X), (0, Yp - Y), (0, Zp - Z), (0, Tp - T))
    ).reshape(B, Xp, Yp, Zcnt, zct)
    for ax, (n_valid, n_work) in enumerate(((X, Xp), (Y, Yp))):
        w_l, w_r = halos[ax]
        yp = _wrap_pad_axis(yp, 1 + ax, n_valid, w_l, w_r, n_work)

    def pad_acc(acc5):
        out = acc5
        for ax, (n_valid, n_work) in enumerate(((X, Xp), (Y, Yp))):
            w_l, w_r = halos[ax]
            out = _wrap_pad_axis(out, 1 + ax, n_valid, w_l, w_r, n_work)
        return out

    band_src = [("y", b) for b in range(nb)]
    partial = p4._lead_adj_call(
        yp, None, band_src, taps_np, lead_t, zct,
        shape_xy=(Xp, Yp), padded=(True, True),
    )
    acc = p4._lane_adj_call(
        partial.reshape(4, Xp, Yp, Lp), taps_np, Tp, lane_t, scale,
        geom=g4,
    )
    pos = nb
    for _ in range(1, level):
        band_src = [("a", 0)] + [("y", pos + b - 1) for b in range(1, nb)]
        acc5 = pad_acc(acc.reshape(1, Xp, Yp, Zcnt, zct))
        partial = p4._lead_adj_call(
            yp, acc5, band_src, taps_np, lead_t, zct,
            shape_xy=(Xp, Yp), padded=(True, True),
        )
        acc = p4._lane_adj_call(
            partial.reshape(4, Xp, Yp, Lp), taps_np, Tp, lane_t, scale,
            geom=g4,
        )
        pos += nb - 1
    return acc.reshape(Xp, Yp, Zp, Tp)[:X, :Y, :Z, :T]
