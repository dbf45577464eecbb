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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    if len(shape) == 1:
        return _supported1(shape, dtype, taps_np)
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
    if x.ndim == 1:
        return dec_padded1(x, taps_np, level, lam=lam)
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
    if y.ndim == 2:
        return rec_padded1(y, taps_np, level, preserve_l2)
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


# ---------------------------------------------------------------------------
# 1D padded mode (chunked long signals — flat kernels cap at ~196K samples)
# ---------------------------------------------------------------------------
#
# A 1D chunk of CH samples (CH a multiple of 1024) lives as CH/128 rows of
# a lifted (rows, 128) view; chunk boundaries at CH multiples make every
# sublane DMA offset an 8-row multiple. The signal is wrap-extended by
# 1024 samples on each side (one XLA concat per level), so every chunk
# reads ONE contiguous aligned row range [i*CH, i*CH + CH + 2048) and the
# K-tap correlation is a chain of flat shifts of the halo'd buffer
# (lane rotate + sublane rotate + carry select, one live at a time in an
# i32 while_loop with taps in SMEM).

_PAD1 = 1024  # halo samples each side; covers K <= 1024 filters


def _chunk1(N):
    """Chunk size: enough rows to amortize, small enough for VMEM."""
    for CH in (131072, 65536, 32768, 16384, 8192, 4096, 2048, 1024):
        if CH <= _roundup(N, 1024):
            return CH
    return 1024


def _supported1(shape, dtype, taps_np) -> bool:
    if len(shape) != 1 or len(taps_np) != 1:
        return False
    K = taps_np[0].shape[1]
    return K <= _PAD1 and shape[0] >= _PAD1


def _ext1(x_valid, N, N_w):
    """[wrap_l(1024) | valid | wrap_r(1024) | garbage] lifted to
    (rows, 128); ``x_valid`` is 1D with valid samples [0, N)."""
    parts = [x_valid[N - _PAD1:N], x_valid[:N], x_valid[:_PAD1]]
    tail = N_w - N
    if tail:
        parts.append(jnp.zeros((tail,), x_valid.dtype))
    ext = jnp.concatenate(parts)
    return ext.reshape(-1, 128)


def _flat_shift1(v, s):
    """rows-major flat shift: out[m] = v[m + s] (s traced i32 >= 0;
    positions past the end wrap — callers only read the in-range head)."""
    R = v.shape[0]
    r = jax.lax.rem(s, np.int32(128))
    q = jax.lax.div(s, np.int32(128))
    lr = pltpu.roll(v, jax.lax.rem(np.int32(128) - r, np.int32(128)),
                    axis=1)
    a = pltpu.roll(lr, jax.lax.rem(np.int32(R) - q, np.int32(R)), axis=0)
    b = pltpu.roll(
        lr, jax.lax.rem(np.int32(2 * R) - q - np.int32(1), np.int32(R)),
        axis=0,
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(lane >= np.int32(128) - r, b, a)


def _corr1(buf, taps_ref, sel, K, anchor, out_rows, reverse):
    """K-tap correlation of the halo'd chunk: y[n] = sum_j t v[n+j-o]
    (or the adjoint with reversed taps at the mirrored anchor)."""

    def cond(c):
        return c[0] < np.int32(K)

    def body(c):
        j, acc = c
        s = np.int32(_PAD1) - np.int32(anchor) + j
        r = _flat_shift1(buf, s)[: out_rows]
        tap_idx = (np.int32(K - 1) - j) if reverse else j
        t = taps_ref[np.int32(sel), tap_idx]
        return (j + np.int32(1), acc + t * r)

    j0 = jnp.asarray(0, jnp.int32)
    z = jnp.zeros((out_rows, 128), buf.dtype)
    return jax.lax.while_loop(cond, body, (j0, z))[1]


def _corr1_pair(buf, taps_ref, K, o, out_rows):
    """(lo, hi) analysis pair sharing every shift."""

    def cond(c):
        return c[0] < np.int32(K)

    def body(c):
        j, alo, ahi = c
        s = np.int32(_PAD1 - o) + j
        r = _flat_shift1(buf, s)[: out_rows]
        return (
            j + np.int32(1),
            alo + taps_ref[np.int32(0), j] * r,
            ahi + taps_ref[np.int32(1), j] * r,
        )

    j0 = jnp.asarray(0, jnp.int32)
    z = jnp.zeros((out_rows, 128), buf.dtype)
    _, lo, hi = jax.lax.while_loop(cond, body, (j0, z, z))
    return lo, hi


def _dec1_level(ext, big, band_off, taps_op, K, N_w, CH, final):
    """One 1D analysis level: ext (rows,128) -> detail into aliased big
    (+ approx output unless final, where it goes to big[0])."""
    from .pallas_kernels import _up as up

    G = N_w // CH
    rows_out = CH // 128
    rows_in = (CH + 2 * _PAD1) // 128
    o = K // 2 - 1

    def kernel(ext_ref, taps_ref, big_in, big_ref, *rest):
        del big_in
        if final:
            app_ref = None
            buf, stage, sem_in, sem_out = rest
        else:
            app_ref = rest[0]
            buf, stage, sem_in, sem_out = rest[1:]
        i = pl.program_id(0)
        r0 = pl.multiple_of(i * np.int32(rows_out), 8)
        cp = pltpu.make_async_copy(
            ext_ref.at[pl.ds(r0, rows_in), :], buf, sem_in
        )
        cp.start()
        cp.wait()
        lo, hi = _corr1_pair(up(buf[...]), taps_ref, K, o, rows_out)
        cps = []
        for slot, (b, val) in enumerate(((0, lo), (1, hi))):
            stage[np.int32(slot)] = val.astype(stage.dtype)
            if b == 0 and not final:
                dst = app_ref.at[pl.ds(r0, rows_out), :]
            else:
                band = 0 if b == 0 else band_off
                dst = big_ref.at[np.int32(band), pl.ds(r0, rows_out), :]
            c = pltpu.make_async_copy(
                stage.at[np.int32(slot)], dst, sem_out.at[np.int32(slot)]
            )
            c.start()
            cps.append(c)
        for c in cps:
            c.wait()

    smem_spec = pl.BlockSpec(
        taps_op.shape, lambda i: (np.int32(0), np.int32(0)),
        memory_space=pltpu.SMEM,
    )
    B = big.shape[0]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    out_shape = [jax.ShapeDtypeStruct((B, N_w // 128, 128), big.dtype)]
    if not final:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct((N_w // 128, 128), big.dtype)
        )
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), smem_spec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(out_specs) if not final else out_specs[0],
        out_shape=tuple(out_shape) if not final else out_shape[0],
        input_output_aliases={2: 0},
        scratch_shapes=[
            pltpu.VMEM((rows_in, 128), big.dtype),
            pltpu.VMEM((2, rows_out, 128), big.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(ext, taps_op, big)


def _rec1_level(y_ext, a_ext, det_band, taps_op, K, N_w, CH, scale):
    """One 1D synthesis level from wrap-extended band rows: approx from
    ``a_ext`` (or band 0 of y_ext when None), detail from band
    ``det_band`` of ``y_ext``; returns compact (N_w/128, 128)."""
    from .pallas_kernels import _up as up

    G = N_w // CH
    rows_out = CH // 128
    rows_in = (CH + 2 * _PAD1) // 128

    def kernel(*args):
        args = list(args)
        y_ref = args.pop(0)
        a_ref = args.pop(0) if a_ext is not None else None
        taps_ref = args.pop(0)
        out_ref = args.pop(0)
        bufs, sem_in, stage, sem_out = args
        i = pl.program_id(0)
        r0 = pl.multiple_of(i * np.int32(rows_out), 8)
        cps = []
        for c, (src, band) in enumerate(
            (
                (y_ref if a_ref is None else a_ref,
                 0 if a_ref is None else None),
                (y_ref, det_band),
            )
        ):
            idx = (pl.ds(r0, rows_in), slice(None))
            if band is not None:
                idx = (np.int32(band),) + idx
            cps.append(pltpu.make_async_copy(
                src.at[idx], bufs.at[np.int32(c)], sem_in.at[np.int32(c)]
            ))
        for c in cps:
            c.start()
        for c in cps:
            c.wait()
        acc = None
        for sel in range(2):
            v = _corr1(up(bufs[np.int32(sel)]), taps_ref, sel, K, K // 2,
                       rows_out, True)
            acc = v if acc is None else acc + v
        if scale != 1.0:
            acc = acc * np.float32(scale)
        stage[...] = acc.astype(stage.dtype)
        cp = pltpu.make_async_copy(
            stage, out_ref.at[pl.ds(r0, rows_out), :], sem_out
        )
        cp.start()
        cp.wait()

    smem_spec = pl.BlockSpec(
        taps_op.shape, lambda i: (np.int32(0), np.int32(0)),
        memory_space=pltpu.SMEM,
    )
    operands = [y_ext]
    if a_ext is not None:
        operands.append(a_ext)
    operands.append(taps_op)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (len(operands) - 1)
        + [smem_spec],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N_w // 128, 128), y_ext.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows_in, 128), y_ext.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((rows_out, 128), y_ext.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(*operands)


def dec_padded1(x, taps_np, level: int, lam: float = 0.0):
    """Chunked 1D multilevel analysis; (N,) -> (B, N)."""
    from .pallas_kernels import _compute_dtype, _shrink_details_xla

    N = x.shape[0]
    CH = _chunk1(N)
    N_w = _roundup(N, CH)
    K = taps_np[0].shape[1]
    taps_op = jnp.asarray(taps_np[0], _compute_dtype(x.dtype))
    B = 1 + level
    big = jnp.empty((B, N_w // 128, 128), x.dtype)
    approx_valid = x  # 1D valid samples
    for lvl in range(level):
        final = lvl == level - 1
        ext = _ext1(approx_valid.reshape(-1)[:N], N, N_w)
        out = _dec1_level(ext, big, B - 1 - lvl, taps_op, K, N_w, CH,
                          final)
        if final:
            big = out
        else:
            big, app = out
            approx_valid = app.reshape(-1)
    y = big.reshape(B, N_w)[:, :N]
    return _shrink_details_xla(y, lam) if lam else y


def rec_padded1(y, taps_np, level: int, preserve_l2: bool):
    """Chunked 1D multilevel synthesis; (B, N) -> (N,)."""
    from .pallas_kernels import _compute_dtype

    B, N = y.shape
    CH = _chunk1(N)
    N_w = _roundup(N, CH)
    K = taps_np[0].shape[1]
    taps_op = jnp.asarray(taps_np[0], _compute_dtype(y.dtype))
    scale = 1.0 if preserve_l2 else 0.5
    # one wrap-ext of the whole band array (B small: 1 + level)
    y_ext = jnp.stack([_ext1(y[b], N, N_w) for b in range(B)])
    acc = _rec1_level(y_ext, None, 1, taps_op, K, N_w, CH, scale)
    for lvl in range(1, level):
        a_ext = _ext1(acc.reshape(-1)[:N], N, N_w)
        acc = _rec1_level(y_ext, a_ext, 1 + lvl, taps_op, K, N_w, CH,
                          scale)
    return acc.reshape(-1)[:N]
