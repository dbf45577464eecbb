"""Multi-device spatial decomposition for the non-decimated DWT.

The reference's only scaling axis is shared-memory threading (8 hard-coded
FFTW threads, ``mex/nddwt.c:103``; OpenMP pointwise multiply,
``mex/nddwt.c:73``). The TPU-native scaling axis is *spatial-domain
decomposition* over a ``jax.sharding.Mesh``: spatial axes of the volume are
sharded across devices, and each K-tap circular-correlation axis pass
exchanges a constant ``K-1``-sample periodic halo with its ring neighbors
via ``jax.lax.ppermute`` — the circular wrap of the periodic boundary
condition maps exactly onto the mesh ring (first and last shard linked).

Because the reference's cascade re-filters the full-resolution approximation
with *undilated* filters every level (``Functions/nd_dwt_1D.m:181``), the
halo width is constant across levels — no growing overlap.

Collectives used: ``ppermute`` only (halo exchange rides the ICI ring);
``psum`` appears only in tests. All communication is expressed inside a
single ``jax.shard_map`` region per transform so XLA can overlap the halo
transfers with the interior stencil computation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..oracle import level_from_bands, num_bands
from ..ops import direct_path
from ..plan import NDDWT


def make_mesh(axis_sizes: dict, devices=None) -> Mesh:
    """Build a Mesh from {axis_name: size}; devices default to all."""
    if devices is None:
        devices = jax.devices()
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes[n] for n in names)
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(
            f"mesh needs {total} devices, only {len(devices)} available"
        )
    arr = np.array(devices[:total]).reshape(sizes)
    return Mesh(arr, names)


# --------------------------------------------------------------------------
# Halo-exchanged axis passes (run inside shard_map).
# --------------------------------------------------------------------------


def _ring_perms(P_: int):
    fwd = [(i, (i + 1) % P_) for i in range(P_)]
    bwd = [(i, (i - 1) % P_) for i in range(P_)]
    return fwd, bwd


def _halo_pad(x, axis, axis_name, left_w, right_w):
    """Concatenate periodic halos from ring neighbors along ``axis``.

    ``left_w`` samples come from the left neighbor's tail, ``right_w`` from
    the right neighbor's head; with a single shard this degenerates to the
    local circular wrap.
    """
    size = jax.lax.axis_size(axis_name)
    n = x.shape[axis]
    parts = []
    if left_w:
        tail = jax.lax.slice_in_dim(x, n - left_w, n, axis=axis)
        if size > 1:
            fwd, _ = _ring_perms(size)
            tail = jax.lax.ppermute(tail, axis_name, fwd)
        parts.append(tail)
    parts.append(x)
    if right_w:
        head = jax.lax.slice_in_dim(x, 0, right_w, axis=axis)
        if size > 1:
            _, bwd = _ring_perms(size)
            head = jax.lax.ppermute(head, axis_name, bwd)
        parts.append(head)
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else x


def _corr_pair_halo(x, taps, axis, axis_name):
    """Sharded-axis analysis pass: y_c[n] = sum_j t[j] x[n + j - o]."""
    K = taps.shape[1]
    o = K // 2 - 1
    n = x.shape[axis]
    xp = _halo_pad(x, axis, axis_name, left_w=o, right_w=K - 1 - o)
    acc_lo = None
    acc_hi = None
    for j in range(K):
        sl = jax.lax.slice_in_dim(xp, j, j + n, axis=axis)
        tl = taps[0, j] * sl
        th = taps[1, j] * sl
        acc_lo = tl if acc_lo is None else acc_lo + tl
        acc_hi = th if acc_hi is None else acc_hi + th
    return acc_lo, acc_hi


def _adj_pair_halo(lo, hi, taps, axis, axis_name):
    """Sharded-axis synthesis pass: x[m] = sum_j t[j] y[m - j + o]."""
    K = taps.shape[1]
    o = K // 2 - 1
    n = lo.shape[axis]
    # m - j + o ranges over [m - (K-1-o), m + o]
    lp = _halo_pad(lo, axis, axis_name, left_w=K - 1 - o, right_w=o)
    hp = _halo_pad(hi, axis, axis_name, left_w=K - 1 - o, right_w=o)
    acc = None
    for j in range(K):
        # padded index for output m: m + (K-1-o) - j + o - ... careful:
        # y[m - j + o] lives at padded position m + (K-1-o) + o - j.
        start = K - 1 - j
        sl = taps[0, j] * jax.lax.slice_in_dim(lp, start, start + n, axis=axis)
        sh = taps[1, j] * jax.lax.slice_in_dim(hp, start, start + n, axis=axis)
        term = sl + sh
        acc = term if acc is None else acc + term
    return acc


# Unsharded-axis passes reuse the single-chip circular pad+slice forms
# (measured ~1.5x faster than jnp.roll copy chains on TPU,
# ops/direct_path.py:48-70): the halo'd passes above are the same stencils
# with the pad sourced from ring neighbors instead of the local wrap.
_corr_pair_local = direct_path._corr_pair
_adj_pair_local = direct_path._adj_pair


# --------------------------------------------------------------------------
# Sharded multilevel transform (the body passed to shard_map).
# --------------------------------------------------------------------------


def _level1_dec_sharded(x, taps, axis_names):
    """(2^d, *local spatial) bands; ``axis_names[k]`` is the mesh axis
    sharding spatial axis k (or None)."""
    ndim = len(taps)
    T = x[None]
    for ax in range(ndim):
        sp_axis = T.ndim - ndim + ax
        if axis_names[ax] is None:
            lo, hi = _corr_pair_local(T, taps[ax], sp_axis)
        else:
            lo, hi = _corr_pair_halo(T, taps[ax], sp_axis, axis_names[ax])
        T = jnp.concatenate([lo, hi], axis=0)
    return T


def _level1_rec_sharded(group, taps, axis_names):
    ndim = len(taps)
    T = group
    for ax in reversed(range(ndim)):
        nb = T.shape[0]
        sp_axis = T.ndim - ndim + ax
        lo, hi = T[: nb // 2], T[nb // 2 :]
        if axis_names[ax] is None:
            T = _adj_pair_local(lo, hi, taps[ax], sp_axis)
        else:
            T = _adj_pair_halo(lo, hi, taps[ax], sp_axis, axis_names[ax])
    return T[0]


def _dec_body(x, taps, level, axis_names):
    groups = []
    approx = x
    for _ in range(level):
        bands = _level1_dec_sharded(approx, taps, axis_names)
        approx = bands[0]
        groups.append(bands[1:])
    parts = [approx[None]]
    for g in reversed(groups):
        parts.append(g)
    return jnp.concatenate(parts, axis=0)


def _rec_body(y, taps, level, preserve_l2, axis_names):
    ndim = len(taps)
    nb = 2**ndim

    def synth(group):
        acc = _level1_rec_sharded(group, taps, axis_names)
        if not preserve_l2:
            acc = acc / nb
        return acc

    acc = synth(y[:nb])
    pos = nb
    for _ in range(1, level):
        group = jnp.concatenate([acc[None], y[pos : pos + nb - 1]], axis=0)
        acc = synth(group)
        pos += nb - 1
    return acc


# --------------------------------------------------------------------------
# Pallas-accelerated shard bodies ('valid'-mode fused level kernels fed by
# ppermute halos — the sharded counterpart of the single-chip Pallas path,
# so per-chip multi-chip throughput matches single-chip instead of the
# ~8x-slower XLA roll/pad lowering).
# --------------------------------------------------------------------------


def _pad_sharded_axes(arr, axis_names, halos, ndim, lead_off):
    """Halo-pad every *sharded* leading spatial axis of ``arr`` via
    ppermute (widths from the kernel halo table); unsharded axes stay — the
    kernel handles their periodic wrap with L/C/R segment DMAs locally."""
    for ax in range(ndim - 1):
        name = axis_names[ax]
        if name is None:
            continue
        w_l, w_r, _ = halos[ax]
        arr = _halo_pad(arr, lead_off + ax, name, w_l, w_r)
    return arr


def _halo_slab(arr, axis, axis_name, w_l, w_r):
    """Small ``(w_l + w_r)``-row slab [left-neighbor tail | right-neighbor
    head] along ``axis`` — the minimal periodic exchange for one sharded
    axis. Feeds the kernels' slab 'valid' mode, which reads L/R halo
    segments from this operand instead of a full-size concat-padded copy
    of the array (the pad copy was ~1/3 of the sharded pair's runtime).
    Zero-width sides are skipped (no degenerate ppermute — zero-element
    collectives are a hazard on the target backend)."""
    size = jax.lax.axis_size(axis_name)
    n = arr.shape[axis]
    fwd, bwd = _ring_perms(size)
    parts = []
    if w_l:
        tail = jax.lax.slice_in_dim(arr, n - w_l, n, axis=axis)
        if size > 1:
            tail = jax.lax.ppermute(tail, axis_name, fwd)
        parts.append(tail)
    if w_r:
        head = jax.lax.slice_in_dim(arr, 0, w_r, axis=axis)
        if size > 1:
            head = jax.lax.ppermute(head, axis_name, bwd)
        parts.append(head)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=axis)


def _slab_axes_for(axis_names, n_lead, halos, tiles):
    """The sharded leading axes as a tuple if the slab 'valid' mode can
    serve them, else None (fall back to concat-pad). Slab mode covers one
    or two sharded leading axes (a pair adds the corner slab — diagonal
    neighbors via a two-hop exchange) with halo widths within one tile
    (the L/R source split per axis is binary: shard-boundary tile -> slab,
    interior tile -> local rows)."""
    sharded = [ax for ax in range(n_lead) if axis_names[ax] is not None]
    if not sharded or len(sharded) > 2 or tiles is None:
        return None
    for ax in sharded:
        w_l, w_r = halos[ax][0], halos[ax][1]  # 3D (w,w,aligned) / 4D (w,w)
        if w_l > tiles[ax] or w_r > tiles[ax]:
            return None
    return tuple(sharded)


def _build_slabs(arr, slab_axes, axis_names, halos, lead_off):
    """Per-axis halo slabs plus (for an axis pair) the corner slab: the
    second axis's slab OF the first axis's slab — two ppermute hops reach
    the diagonal neighbors, so the kernels' boundary-corner segments have
    an exact periodic source."""
    slabs = []
    for ax in sorted(slab_axes):
        w_l, w_r = halos[ax][0], halos[ax][1]
        slabs.append(
            _halo_slab(arr, lead_off + ax, axis_names[ax], w_l, w_r)
        )
    if len(slab_axes) == 2:
        ax0, ax1 = sorted(slab_axes)
        w_l, w_r = halos[ax1][0], halos[ax1][1]
        slabs.append(
            _halo_slab(slabs[0], lead_off + ax1, axis_names[ax1], w_l, w_r)
        )
    return tuple(slabs)


def _slab_from_edges(edges, axis, axis_name, w_l, w_r):
    """Next level's slab from a kernel-emitted edges output
    (``[my tail | my head]``, see ``pallas_kernels._edge_copies``): at
    mesh-axis size 1 the edges buffer IS the slab (the periodic neighbor
    is self — zero XLA ops per level, vs 2 full-array slices + a concat
    for ``_halo_slab``); at size > 1 the two sides ride two tiny
    ppermutes + a slab-sized concat (the big array is never sliced)."""
    size = jax.lax.axis_size(axis_name)
    if size == 1:
        return edges
    fwd, bwd = _ring_perms(size)
    parts = []
    if w_l:
        tail = jax.lax.slice_in_dim(edges, 0, w_l, axis=axis)
        parts.append(jax.lax.ppermute(tail, axis_name, fwd))
    if w_r:
        head = jax.lax.slice_in_dim(edges, w_l, w_l + w_r, axis=axis)
        parts.append(jax.lax.ppermute(head, axis_name, bwd))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=axis)


def _slabs_from_edges(edges, slab_axes, axis_names, halos, lead_off):
    """Per-axis slabs (plus the corner for an axis pair) from the
    kernel-emitted edges outputs — the steady-state counterpart of
    ``_build_slabs`` once the level kernels emit their own boundary rows.
    The corner is still the axis-1 slab of the axis-0 slab, but built from
    the small axis-0 slab buffer rather than the full array."""
    axes = sorted(slab_axes)
    slabs = []
    for n, ax in enumerate(axes):
        w_l, w_r = halos[ax][0], halos[ax][1]
        slabs.append(
            _slab_from_edges(edges[n], lead_off + ax, axis_names[ax],
                             w_l, w_r)
        )
    if len(axes) == 2:
        ax0, ax1 = axes
        w_l, w_r = halos[ax1][0], halos[ax1][1]
        slabs.append(
            _halo_slab(slabs[0], lead_off + ax1, axis_names[ax1], w_l, w_r)
        )
    return tuple(slabs)


def _wrap_split(slab_axes, axis_names):
    """Partition slab-eligible axes into ``(real, wrap)``: axes whose mesh
    axis has size 1 take the kernels' local-wrap segment variant (the
    periodic neighbor is the shard itself — no slab operand, no exchange,
    zero XLA glue per level), the rest ride ppermuted slab operands."""
    wrap = tuple(
        ax for ax in slab_axes if jax.lax.axis_size(axis_names[ax]) == 1
    )
    real = tuple(ax for ax in slab_axes if ax not in wrap)
    return real, wrap


def _dec_body_pallas(x, taps_np, level, axis_names, local_shape, lam=0.0):
    from ..ops import pallas_kernels as pk

    ndim = len(taps_np)
    nb = 2**ndim
    B = nb + (nb - 1) * (level - 1)
    halos = pk._dec_halos(ndim, taps_np)
    padded = tuple(axis_names[ax] is not None for ax in range(ndim - 1))
    slab_axes = _slab_axes_for(
        axis_names, ndim - 1, halos, pk._dec_tiles(tuple(local_shape), taps_np)
    )
    big = jnp.empty((B,) + tuple(local_shape), x.dtype)
    approx = x
    off = B
    slabs = None
    for lvl in range(level):
        off -= nb - 1
        final = lvl == level - 1
        if slab_axes is not None:
            real, wrap = _wrap_split(slab_axes, axis_names)
            emit = bool(real) and not final
            if slabs is None:
                slabs = _build_slabs(approx, real, axis_names, halos, 0)
            out = pk._fused_dec_level(
                approx, big, off, taps_np, shape=tuple(local_shape),
                approx_to_big=final, slab_axes=real, slabs=slabs,
                lam=lam, emit_edges=emit, wrap_axes=wrap,
            )
            if not final:
                if emit:
                    big, approx = out[0], out[1]
                    slabs = _slabs_from_edges(
                        out[2:], real, axis_names, halos, 0
                    )
                else:
                    big, approx = out
                continue
        else:
            xp = _pad_sharded_axes(approx, axis_names, halos, ndim, 0)
            out = pk._fused_dec_level(
                xp, big, off, taps_np, shape=tuple(local_shape),
                padded=padded, approx_to_big=final, lam=lam,
            )
        if final:
            return out
        big, approx = out


def _rec_body_pallas(y, taps_np, level, preserve_l2, axis_names, local_shape):
    from ..ops import pallas_kernels as pk

    ndim = len(taps_np)
    nb = 2**ndim
    halos = pk._rec_halos(ndim, taps_np)
    padded = tuple(axis_names[ax] is not None for ax in range(ndim - 1))
    slab_axes = _slab_axes_for(
        axis_names, ndim - 1, halos, pk._rec_tiles(tuple(local_shape), taps_np)
    )
    scale = 1.0 if preserve_l2 else 1.0 / nb
    band_src = [("y", b) for b in range(nb)]

    if slab_axes is not None:
        real, wrap = _wrap_split(slab_axes, axis_names)
        y_slabs = _build_slabs(y, real, axis_names, halos, 1)
        emit = bool(real) and level > 1
        out = pk._fused_rec_level(
            y, None, band_src, taps_np, scale, shape=tuple(local_shape),
            slab_axes=real, y_slabs=y_slabs, emit_edges=emit,
            wrap_axes=wrap,
        )
        acc, edges = (out[0], out[1:]) if emit else (out, ())
        pos = nb
        for lvl in range(1, level):
            emit = bool(real) and lvl < level - 1
            a_slabs = _slabs_from_edges(edges, real, axis_names, halos, 0)
            band_src = [("a", 0)] + [("y", pos + b - 1) for b in range(1, nb)]
            out = pk._fused_rec_level(
                y, acc, band_src, taps_np, scale, shape=tuple(local_shape),
                slab_axes=real, y_slabs=y_slabs, a_slabs=a_slabs,
                emit_edges=emit, wrap_axes=wrap,
            )
            acc, edges = (out[0], out[1:]) if emit else (out, ())
            pos += nb - 1
        return acc

    yp = _pad_sharded_axes(y, axis_names, halos, ndim, 1)
    acc = pk._fused_rec_level(
        yp, None, band_src, taps_np, scale,
        shape=tuple(local_shape), padded=padded,
    )
    pos = nb
    for _ in range(1, level):
        accp = _pad_sharded_axes(acc, axis_names, halos, ndim, 0)
        band_src = [("a", 0)] + [("y", pos + b - 1) for b in range(1, nb)]
        acc = pk._fused_rec_level(
            yp, accp, band_src, taps_np, scale,
            shape=tuple(local_shape), padded=padded,
        )
        pos += nb - 1
    return acc


def _dec_body_pallas4(x, taps_np, level, axis_names, local_shape, lam=0.0):
    """4D sharded analysis: lane stage local (Z,T unsharded by
    construction), leading stage 'valid'-mode over ppermute'd X/Y halos."""
    from ..ops import pallas_4d as p4

    X, Y, Z, T = local_shape
    L = Z * T
    zc = p4._chunk(Z, T)
    zct = zc * T
    Zcnt = Z // zc
    lane_t = p4._lane_tiles(X, Y, L, max(taps_np[2].shape[1], taps_np[3].shape[1]))
    lead_t = p4._lead_tiles(X, Y, zct, taps_np[0].shape[1], taps_np[1].shape[1])
    halos = p4._lead_halos(taps_np[0].shape[1], taps_np[1].shape[1],
                           adjoint=False)
    padded = (axis_names[0] is not None, axis_names[1] is not None)
    nb = 16
    B = nb + (nb - 1) * (level - 1)

    slab_axes = _slab_axes_for(axis_names[:2], 2, halos, lead_t)
    big5 = jnp.empty((B, X, Y, Zcnt, zct), x.dtype)
    approx = x.reshape(X, Y, L)
    off = B
    for lvl in range(level):
        off -= nb - 1
        final = lvl == level - 1
        if slab_axes is not None:
            # Lane stage emits the X/Y boundary rows of its own output, so
            # the per-level slab build costs no slices of the (4,...) temp.
            real, wrap = _wrap_split(slab_axes, axis_names)
            lane_out = p4._lane_dec_call(
                approx, taps_np, T, lane_t,
                edge_spec=(real, halos) if real else None,
            )
            if real:
                temp5 = lane_out[0].reshape(4, X, Y, Zcnt, zct)
                edges5 = [
                    e.reshape(e.shape[:-1] + (Zcnt, zct))
                    for e in lane_out[1:]
                ]
                slabs = _slabs_from_edges(edges5, real, axis_names,
                                          halos, 1)
            else:
                temp5 = lane_out.reshape(4, X, Y, Zcnt, zct)
                slabs = ()
            out = p4._lead_dec_call(
                temp5, big5, off, taps_np, lead_t, zct,
                shape_xy=(X, Y), approx_to_big=final,
                slab_axes=real, slabs=slabs, lam=lam, wrap_axes=wrap,
            )
        else:
            temp5 = p4._lane_dec_call(approx, taps_np, T, lane_t).reshape(
                4, X, Y, Zcnt, zct
            )
            if padded[0]:
                temp5 = _halo_pad(temp5, 1, axis_names[0],
                                  halos[0][0], halos[0][1])
            if padded[1]:
                temp5 = _halo_pad(temp5, 2, axis_names[1],
                                  halos[1][0], halos[1][1])
            out = p4._lead_dec_call(
                temp5, big5, off, taps_np, lead_t, zct,
                shape_xy=(X, Y), padded=padded, approx_to_big=final,
                lam=lam,
            )
        if final:
            big5 = out
        else:
            big5, app = out
            approx = app.reshape(X, Y, L)
    return big5.reshape((B,) + tuple(local_shape))


def _rec_body_pallas4(y, taps_np, level, preserve_l2, axis_names, local_shape):
    from ..ops import pallas_4d as p4

    X, Y, Z, T = local_shape
    L = Z * T
    zc = p4._chunk(Z, T)
    zct = zc * T
    Zcnt = Z // zc
    lane_t = p4._lane_tiles(X, Y, L, max(taps_np[2].shape[1], taps_np[3].shape[1]))
    lead_t = p4._lead_tiles(X, Y, zct, taps_np[0].shape[1], taps_np[1].shape[1])
    halos = p4._lead_halos(taps_np[0].shape[1], taps_np[1].shape[1],
                           adjoint=True)
    padded = (axis_names[0] is not None, axis_names[1] is not None)
    nb = 16
    B = y.shape[0]
    scale = 1.0 if preserve_l2 else 1.0 / nb

    slab_axes = _slab_axes_for(axis_names[:2], 2, halos, lead_t)

    def pad_xy(arr5):
        if padded[0]:
            arr5 = _halo_pad(arr5, 1, axis_names[0], halos[0][0], halos[0][1])
        if padded[1]:
            arr5 = _halo_pad(arr5, 2, axis_names[1], halos[1][0], halos[1][1])
        return arr5

    band_src = [("y", b) for b in range(nb)]
    if slab_axes is not None:
        # The lane-adjoint stage emits the X/Y boundary rows of each
        # intermediate acc, so per-level a_slab builds cost no XLA slices.
        real, wrap = _wrap_split(slab_axes, axis_names)
        espec = (real, halos)
        y5 = y.reshape(B, X, Y, Zcnt, zct)
        y_slabs = _build_slabs(y5, real, axis_names, halos, 1)
        emit = bool(real) and level > 1
        partial = p4._lead_adj_call(
            y5, None, band_src, taps_np, lead_t, zct,
            shape_xy=(X, Y), slab_axes=real, y_slabs=y_slabs,
            wrap_axes=wrap,
        )
        lane_out = p4._lane_adj_call(
            partial.reshape(4, X, Y, L), taps_np, T, lane_t, scale,
            edge_spec=espec if emit else None,
        )
        acc, edges = (lane_out[0], lane_out[1:]) if emit else (lane_out, ())
        pos = nb
        for lvl in range(1, level):
            emit = bool(real) and lvl < level - 1
            band_src = [("a", 0)] + [("y", pos + b - 1) for b in range(1, nb)]
            acc5 = acc.reshape(1, X, Y, Zcnt, zct)
            edges5 = [
                e.reshape((1,) + e.shape[:-1] + (Zcnt, zct)) for e in edges
            ]
            a_slabs = _slabs_from_edges(edges5, real, axis_names, halos, 1)
            partial = p4._lead_adj_call(
                y5, acc5, band_src, taps_np, lead_t, zct,
                shape_xy=(X, Y), slab_axes=real, y_slabs=y_slabs,
                a_slabs=a_slabs, wrap_axes=wrap,
            )
            lane_out = p4._lane_adj_call(
                partial.reshape(4, X, Y, L), taps_np, T, lane_t, scale,
                edge_spec=espec if emit else None,
            )
            acc, edges = (
                (lane_out[0], lane_out[1:]) if emit else (lane_out, ())
            )
            pos += nb - 1
        return acc.reshape(tuple(local_shape))

    y5 = pad_xy(y.reshape(B, X, Y, Zcnt, zct))
    partial = p4._lead_adj_call(
        y5, None, band_src, taps_np, lead_t, zct,
        shape_xy=(X, Y), padded=padded,
    )
    acc = p4._lane_adj_call(
        partial.reshape(4, X, Y, L), taps_np, T, lane_t, scale
    )
    pos = nb
    for _ in range(1, level):
        band_src = [("a", 0)] + [("y", pos + b - 1) for b in range(1, nb)]
        acc5 = pad_xy(acc.reshape(1, X, Y, Zcnt, zct))
        partial = p4._lead_adj_call(
            y5, acc5, band_src, taps_np, lead_t, zct,
            shape_xy=(X, Y), padded=padded,
        )
        acc = p4._lane_adj_call(
            partial.reshape(4, X, Y, L), taps_np, T, lane_t, scale
        )
        pos += nb - 1
    return acc.reshape(tuple(local_shape))


def _streamed_pair(x, dec_approx, dec_full, rec1, level):
    """Level-streamed fused iterate: dec -> shrink(details) -> rec with the
    cascade re-ordered so the full ``(B, *local)`` band array is NEVER
    materialized — the memory layout that makes BASELINE config #5
    (512^3 x 64 db4 L3: a 1.58 TB band array) tractable (SURVEY §7 hard
    part 4; DESIGN.md "Config #5 memory layout").

    Structure: recompute-on-the-way-up. Descending, only the running
    approximation is computed (``dec_approx``); ascending, each level's
    full band set is (re)computed, its details shrunk in-kernel, and the
    level synthesized immediately (``dec_full`` + ``rec1``). Peak live
    bands = ONE level's ``2^d`` plus the ``level`` retained approximations
    — ``(level + 2^d + O(1)) x numel`` instead of ``(B + O(1)) x numel``.
    Cost: one extra analysis pass per non-deepest level (~+25% pair FLOPs
    at 4D L3), the classic rematerialization trade."""

    def go(a, lvl):
        if lvl == level - 1:
            bands = dec_full(a)
            deep = bands[0]
        else:
            deep = go(dec_approx(a), lvl + 1)
            bands = dec_full(a)
        return rec1(jnp.concatenate([deep[None], bands[1:]], axis=0))

    return go(x, 0)


class ShardedNDDWT:
    """A plan bound to a mesh and a spatial partitioning.

    ``spec`` maps each spatial axis to a mesh axis name or ``None``
    (replicated/local), e.g. ``('x', 'y', None)`` for a 3D volume sharded
    over a 2D mesh. Band arrays are band-first ``(B, *spatial)`` with the
    band axis unsharded (each device holds all bands of its spatial tile —
    the right layout for thresholding/recon loops, which are pointwise in
    space).

    Shard sizes must divide evenly (``shard_map`` constraint); the plan
    validates this at construction.
    """

    def __init__(self, plan: NDDWT, mesh: Mesh, spec, batch_spec=(),
                 use_pallas="auto"):
        spec = tuple(spec)
        batch_spec = tuple(batch_spec)
        if len(spec) != plan.ndim:
            raise ValueError(
                f"spec must name {plan.ndim} spatial axes, got {len(spec)}"
            )
        for ax, name in enumerate(spec):
            if name is None:
                continue
            if name not in mesh.shape:
                raise ValueError(f"mesh has no axis {name!r}")
            psize = mesh.shape[name]
            if plan.shape[ax] % psize:
                raise ValueError(
                    f"spatial axis {ax} (size {plan.shape[ax]}) not divisible "
                    f"by mesh axis {name!r} (size {psize})"
                )
            local = plan.shape[ax] // psize
            # The XLA halo-exchange body needs max(K//2, K//2-1) = K//2
            # rows from each ring neighbor; the Pallas bodies' (rounded)
            # halo requirements are checked separately in _pallas_feasible
            # and fall back to the XLA body when unmet.
            halo = plan.filter_lengths[ax] // 2
            if local < halo:
                raise ValueError(
                    f"local shard of axis {ax} ({local}) is smaller than the "
                    f"filter halo ({halo}); use fewer shards or shorter filters"
                )
        self.plan = plan
        self.mesh = mesh
        self.spec = spec
        self.batch_spec = batch_spec
        self.x_spec = P(*batch_spec, *spec)
        self.y_spec = P(None, *batch_spec, *spec)
        self.x_sharding = NamedSharding(mesh, self.x_spec)
        self.y_sharding = NamedSharding(mesh, self.y_spec)
        self._dec_cache = {}
        self._rec_cache = {}

        self._local_shape = tuple(
            plan.shape[ax] // (mesh.shape[spec[ax]] if spec[ax] else 1)
            for ax in range(plan.ndim)
        )
        feasible = self._pallas_feasible()
        if use_pallas == "auto":
            # Interpreter-mode Pallas on CPU is test-only; real meshes on
            # an accelerator get the fused kernels whenever they tile.
            import jax as _jax

            self.use_pallas = feasible and _jax.default_backend() != "cpu"
            if not feasible and _jax.default_backend() != "cpu":
                # The XLA shard bodies are correct but on this TPU backend
                # odd-shape XLA programs have wedged the remote worker
                # (CLAUDE.md); unlike the single-chip plan (which refuses,
                # plan._resolve_path), sharded users may be on hardware
                # where the XLA lowering is fine — warn loudly instead.
                import warnings

                warnings.warn(
                    f"local shard shape {self._local_shape} does not "
                    "support the fused Pallas kernels; the sharded "
                    "transform will use XLA shard bodies, which are both "
                    "~8x slower and a known odd-shape wedge hazard on "
                    "tunneled v5e backends. Prefer shard counts/extents "
                    "with a 128-multiple local lane axis.",
                    stacklevel=2,
                )
        else:
            self.use_pallas = bool(use_pallas)
            if self.use_pallas and not feasible:
                raise ValueError(
                    "use_pallas=True but the local shard shape "
                    f"{self._local_shape} / dtype / spec does not support "
                    "the fused kernels (lane axis must be unsharded and a "
                    "multiple of 128, no batch axes, f32/bf16, halo <= "
                    "local extent)"
                )

    def _pallas_feasible(self) -> bool:
        from ..ops import pallas_kernels as pk

        plan = self.plan
        if self.batch_spec:
            return False
        if self.spec[-1] is not None:
            return False  # lane axis must be local (kernel wrap = lane roll)
        taps_np = tuple(np.asarray(t) for t in plan.taps)
        ls = self._local_shape
        if plan.ndim == 4:
            # 4D: (Z, T) flatten into lanes, so both must be local; X/Y
            # halos ride ppermute into the 'valid'-mode leading stage.
            from ..ops import pallas_4d as p4

            if self.spec[2] is not None or self.spec[3] is not None:
                return False
            if not p4.supported(ls, plan.real_dtype, taps_np):
                return False
            K0, K1 = taps_np[0].shape[1], taps_np[1].shape[1]
            from ..ops.pallas_kernels import _round8

            if self.spec[0] is not None and ls[0] < K0 - 1:
                return False
            if self.spec[1] is not None and ls[1] < _round8(K1 // 2):
                return False
            return True
        if not pk._supported(ls, plan.real_dtype):
            return False
        if pk._dec_tiles(ls, taps_np) is None or pk._rec_tiles(ls, taps_np) is None:
            return False
        dec_h = pk._dec_halos(plan.ndim, taps_np)
        rec_h = pk._rec_halos(plan.ndim, taps_np)
        for ax in range(plan.ndim - 1):
            if self.spec[ax] is None:
                continue
            w = max(dec_h[ax][0], dec_h[ax][1], rec_h[ax][0], rec_h[ax][1])
            if ls[ax] < w:
                return False
        return True

    # ------------------------------------------------------------------ dec
    def dec_fn(self, level: int):
        """Jitted sharded analysis: (sharded x) -> (B, *spatial) sharded."""
        level = int(level)
        if level not in self._dec_cache:
            if self.use_pallas:
                taps_np = tuple(np.asarray(t) for t in self.plan.taps_hp)
                dec_body = (
                    _dec_body_pallas4 if self.plan.ndim == 4
                    else _dec_body_pallas
                )
                body = partial(
                    dec_body, taps_np=taps_np, level=level,
                    axis_names=self.spec, local_shape=self._local_shape,
                )
                mapped = jax.shard_map(
                    body, mesh=self.mesh,
                    in_specs=(self.x_spec,), out_specs=self.y_spec,
                    check_vma=False,  # pallas_call emits vma-less avals
                )
                self._dec_cache[level] = jax.jit(mapped)
            else:
                body = partial(
                    _dec_body, level=level, axis_names=self.spec
                )
                mapped = jax.shard_map(
                    lambda x, taps: body(x, taps),
                    mesh=self.mesh,
                    in_specs=(self.x_spec, P()),
                    out_specs=self.y_spec,
                )
                self._dec_cache[level] = jax.jit(
                    lambda x: mapped(x, self.plan.taps)
                )
        return self._dec_cache[level]

    def dec(self, x, level: int):
        return self.dec_fn(level)(x)

    # ------------------------------------------------------------------ rec
    def rec_fn(self, level: int):
        level = int(level)
        if level not in self._rec_cache:
            if self.use_pallas:
                taps_np = tuple(np.asarray(t) for t in self.plan.taps_hp)
                rec_body = (
                    _rec_body_pallas4 if self.plan.ndim == 4
                    else _rec_body_pallas
                )
                body = partial(
                    rec_body, taps_np=taps_np, level=level,
                    preserve_l2=self.plan.preserve_l2,
                    axis_names=self.spec, local_shape=self._local_shape,
                )
                mapped = jax.shard_map(
                    body, mesh=self.mesh,
                    in_specs=(self.y_spec,), out_specs=self.x_spec,
                    check_vma=False,  # pallas_call emits vma-less avals
                )
                self._rec_cache[level] = jax.jit(mapped)
            else:
                body = partial(
                    _rec_body,
                    level=level,
                    preserve_l2=self.plan.preserve_l2,
                    axis_names=self.spec,
                )
                mapped = jax.shard_map(
                    lambda y, taps: body(y, taps),
                    mesh=self.mesh,
                    in_specs=(self.y_spec, P()),
                    out_specs=self.x_spec,
                )
                self._rec_cache[level] = jax.jit(
                    lambda y: mapped(y, self.plan.taps)
                )
        return self._rec_cache[level]

    def rec(self, y):
        level = level_from_bands(self.plan.ndim, y.shape[0])
        return self.rec_fn(level)(y)

    # --------------------------------------------------------- fused iterate
    def dec_rec_fn(self, level: int, threshold: float = 0.0):
        """Jitted fused sharded iterate: analysis -> soft-threshold(details)
        -> synthesis in ONE ``shard_map`` region, returning ``(bands, x)``.

        On the Pallas path the shrink rides the dec kernels' band writes
        (in-register, ``pallas_kernels._make_dec_kernel`` ``lam``) — the
        sharded counterpart of ``NDDWT.dec_rec``, so a multi-chip FISTA
        iterate has no separate XLA detail-band pass."""
        level = int(level)
        threshold = float(threshold)
        key = ("pair", level, threshold)
        if key not in self._dec_cache:
            if self.use_pallas:
                taps_np = tuple(np.asarray(t) for t in self.plan.taps_hp)
                is4 = self.plan.ndim == 4
                dec_body = _dec_body_pallas4 if is4 else _dec_body_pallas
                rec_body = _rec_body_pallas4 if is4 else _rec_body_pallas

                def body(x):
                    y = dec_body(
                        x, taps_np=taps_np, level=level,
                        axis_names=self.spec, local_shape=self._local_shape,
                        lam=threshold,
                    )
                    xr = rec_body(
                        y, taps_np=taps_np, level=level,
                        preserve_l2=self.plan.preserve_l2,
                        axis_names=self.spec, local_shape=self._local_shape,
                    )
                    return y, xr

                mapped = jax.shard_map(
                    body, mesh=self.mesh, in_specs=(self.x_spec,),
                    out_specs=(self.y_spec, self.x_spec),
                    check_vma=False,
                )
                self._dec_cache[key] = jax.jit(mapped)
            else:

                def body(x, taps):
                    y = _dec_body(x, taps, level, self.spec)
                    if threshold:
                        from ..ops.pallas_kernels import _shrink_details_xla

                        y = _shrink_details_xla(y, threshold)
                    xr = _rec_body(
                        y, taps, level, self.plan.preserve_l2, self.spec
                    )
                    return y, xr

                mapped = jax.shard_map(
                    body, mesh=self.mesh,
                    in_specs=(self.x_spec, P()),
                    out_specs=(self.y_spec, self.x_spec),
                )
                self._dec_cache[key] = jax.jit(
                    lambda x: mapped(x, self.plan.taps)
                )
        return self._dec_cache[key]

    def dec_rec(self, x, level: int, threshold: float = 0.0):
        return self.dec_rec_fn(level, threshold)(x)

    # ------------------------------------------------- level-streamed iterate
    def dec_rec_streamed_fn(self, level: int, threshold: float = 0.0):
        """Jitted level-streamed fused iterate ``x -> reconstruction``
        (bands are never returned — not materializing them is the point).

        This is the BASELINE-config-#5 memory layout (see
        :func:`_streamed_pair` and DESIGN.md): per-chip peak band memory
        is ``(level + 2^d + O(1))`` local volumes instead of
        ``B + O(1) = 2^d + (2^d-1)(level-1) + O(1)`` — for 4D db4 L3,
        ~25x the local volume instead of ~51x, at ~+25% analysis FLOPs.
        Use :meth:`dec_rec` when the band array is needed or fits."""
        level = int(level)
        threshold = float(threshold)
        key = ("streamed", level, threshold)
        if key not in self._dec_cache:
            if self.use_pallas:
                taps_np = tuple(np.asarray(t) for t in self.plan.taps_hp)
                is4 = self.plan.ndim == 4
                dec_body = _dec_body_pallas4 if is4 else _dec_body_pallas
                rec_body = _rec_body_pallas4 if is4 else _rec_body_pallas
                dec1 = partial(
                    dec_body, taps_np=taps_np, level=1,
                    axis_names=self.spec, local_shape=self._local_shape,
                )
                rec1 = partial(
                    rec_body, taps_np=taps_np, level=1,
                    preserve_l2=self.plan.preserve_l2,
                    axis_names=self.spec, local_shape=self._local_shape,
                )

                def body(x):
                    return _streamed_pair(
                        x,
                        dec_approx=lambda a: dec1(a)[0],
                        dec_full=lambda a: dec1(a, lam=threshold),
                        rec1=rec1,
                        level=level,
                    )

                mapped = jax.shard_map(
                    body, mesh=self.mesh, in_specs=(self.x_spec,),
                    out_specs=self.x_spec, check_vma=False,
                )
                self._dec_cache[key] = jax.jit(mapped)
            else:

                def body(x, taps):
                    def dec1_full(a):
                        bands = _level1_dec_sharded(a, taps, self.spec)
                        if threshold:
                            from ..ops.pallas_kernels import (
                                _shrink_details_xla,
                            )

                            bands = _shrink_details_xla(bands, threshold)
                        return bands

                    def rec1(group):
                        acc = _level1_rec_sharded(group, taps, self.spec)
                        if not self.plan.preserve_l2:
                            acc = acc / (2**self.plan.ndim)
                        return acc

                    return _streamed_pair(
                        x,
                        dec_approx=lambda a: _level1_dec_sharded(
                            a, taps, self.spec
                        )[0],
                        dec_full=dec1_full,
                        rec1=rec1,
                        level=level,
                    )

                mapped = jax.shard_map(
                    body, mesh=self.mesh, in_specs=(self.x_spec, P()),
                    out_specs=self.x_spec,
                )
                self._dec_cache[key] = jax.jit(
                    lambda x: mapped(x, self.plan.taps)
                )
        return self._dec_cache[key]

    def dec_rec_streamed(self, x, level: int, threshold: float = 0.0):
        return self.dec_rec_streamed_fn(level, threshold)(x)

    def peak_memory_model(self, level: int) -> dict:
        """Per-chip peak-memory model (bytes) of the two iterate layouts
        — the feasibility math for BASELINE config #5 (documented with
        worked numbers in DESIGN.md "Config #5 memory layout")."""
        level = int(level)
        nb = 2**self.plan.ndim
        B = num_bands(self.plan.ndim, level)
        local_vox = int(np.prod(self._local_shape))
        item = jnp.dtype(self.plan.real_dtype).itemsize
        # two-stage 4D kernels hold a (4, *local) temp per level; 2D/3D
        # write bands straight from VMEM staging.
        temp = 4 if self.plan.ndim == 4 else 1
        full = (B + 2 + temp) * local_vox * item
        streamed = (level + 1 + nb + 1 + temp) * local_vox * item
        return {
            "local_voxels": local_vox,
            "full_band_layout_bytes": int(full),
            "streamed_layout_bytes": int(streamed),
            "ratio": full / streamed,
        }

    # ---------------------------------------------------------- split-complex
    # Complex data on the complex-less TPU backend rides as a split re/im
    # pair (real filters => components transform independently; the
    # reference handles complex natively, Functions/nd_dwt_3D.m:150-154).
    # The pair axis leads, unsharded: each device holds both components of
    # its spatial tile, and both ride the SAME shard_map region — the
    # multi-chip Pallas path now serves complex MRI volumes (VERDICT r2
    # item 4b).

    def _split_specs(self):
        if self.batch_spec:
            raise ValueError(
                "split-complex sharded transforms do not compose with "
                "batch axes; drop batch_spec or transform per item"
            )
        return P(None, *self.spec), P(None, None, *self.spec)

    def dec_split_fn(self, level: int):
        """Jitted sharded split-complex analysis:
        ``(2, *spatial) -> (2, B, *spatial)``, pair and band axes unsharded."""
        level = int(level)
        key = ("split", level)
        if key not in self._dec_cache:
            xs, ys = self._split_specs()
            if self.use_pallas:
                taps_np = tuple(np.asarray(t) for t in self.plan.taps_hp)
                dec_body = (
                    _dec_body_pallas4 if self.plan.ndim == 4
                    else _dec_body_pallas
                )
                one = partial(
                    dec_body, taps_np=taps_np, level=level,
                    axis_names=self.spec, local_shape=self._local_shape,
                )
                body = lambda xp: jnp.stack([one(xp[0]), one(xp[1])])
                mapped = jax.shard_map(
                    body, mesh=self.mesh, in_specs=(xs,), out_specs=ys,
                    check_vma=False,
                )
                self._dec_cache[key] = jax.jit(mapped)
            else:
                body = partial(_dec_body, level=level, axis_names=self.spec)
                # _dec_body carries leading batch axes natively:
                # (2, *local) -> (B, 2, *local); pair axis back to front.
                mapped = jax.shard_map(
                    lambda xp, taps: jnp.moveaxis(body(xp, taps), 1, 0),
                    mesh=self.mesh,
                    in_specs=(xs, P()),
                    out_specs=ys,
                )
                self._dec_cache[key] = jax.jit(
                    lambda xp: mapped(xp, self.plan.taps)
                )
        return self._dec_cache[key]

    def dec_split(self, x_pair, level: int):
        return self.dec_split_fn(level)(x_pair)

    def rec_split_fn(self, level: int):
        """Jitted sharded split-complex synthesis:
        ``(2, B, *spatial) -> (2, *spatial)``."""
        level = int(level)
        key = ("split", level)
        if key not in self._rec_cache:
            xs, ys = self._split_specs()
            if self.use_pallas:
                taps_np = tuple(np.asarray(t) for t in self.plan.taps_hp)
                rec_body = (
                    _rec_body_pallas4 if self.plan.ndim == 4
                    else _rec_body_pallas
                )
                one = partial(
                    rec_body, taps_np=taps_np, level=level,
                    preserve_l2=self.plan.preserve_l2,
                    axis_names=self.spec, local_shape=self._local_shape,
                )
                body = lambda yp: jnp.stack([one(yp[0]), one(yp[1])])
                mapped = jax.shard_map(
                    body, mesh=self.mesh, in_specs=(ys,), out_specs=xs,
                    check_vma=False,
                )
                self._rec_cache[key] = jax.jit(mapped)
            else:
                body = partial(
                    _rec_body, level=level,
                    preserve_l2=self.plan.preserve_l2, axis_names=self.spec,
                )
                # _rec_body carries a trailing-of-band batch axis natively:
                # feed (B, 2, *local), get (2, *local).
                mapped = jax.shard_map(
                    lambda yp, taps: body(jnp.moveaxis(yp, 0, 1), taps),
                    mesh=self.mesh,
                    in_specs=(ys, P()),
                    out_specs=xs,
                )
                self._rec_cache[key] = jax.jit(
                    lambda yp: mapped(yp, self.plan.taps)
                )
        return self._rec_cache[key]

    def rec_split(self, y_pair):
        level = level_from_bands(self.plan.ndim, y_pair.shape[1])
        return self.rec_split_fn(level)(y_pair)

    def dec_rec_split_fn(self, level: int, threshold: float = 0.0):
        """Jitted fused sharded split-complex iterate: dec both components,
        joint re/im magnitude shrink (the prox of the complex l1 norm —
        the reference's MRI contract, ``Functions/nd_dwt_1D.m:57-61``),
        rec — all in ONE ``shard_map`` region. The shrink itself is local
        XLA (it couples the two components, so it cannot ride the
        per-component dec kernels), but the whole iterate is a single
        region/dispatch. Returns ``(bands, x_pair)``."""
        level = int(level)
        threshold = float(threshold)
        key = ("splitpair", level, threshold)
        if key not in self._dec_cache:
            xs, ys = self._split_specs()

            def mag_shrink(y):
                if not threshold:
                    return y
                from ..models.denoise import soft_threshold_mag_pair

                return soft_threshold_mag_pair(y, threshold)

            if self.use_pallas:
                taps_np = tuple(np.asarray(t) for t in self.plan.taps_hp)
                is4 = self.plan.ndim == 4
                dec_body = _dec_body_pallas4 if is4 else _dec_body_pallas
                rec_body = _rec_body_pallas4 if is4 else _rec_body_pallas
                dec_one = partial(
                    dec_body, taps_np=taps_np, level=level,
                    axis_names=self.spec, local_shape=self._local_shape,
                )
                rec_one = partial(
                    rec_body, taps_np=taps_np, level=level,
                    preserve_l2=self.plan.preserve_l2,
                    axis_names=self.spec, local_shape=self._local_shape,
                )

                def body(xp):
                    y = mag_shrink(jnp.stack([dec_one(xp[0]), dec_one(xp[1])]))
                    xr = jnp.stack([rec_one(y[0]), rec_one(y[1])])
                    return y, xr

                mapped = jax.shard_map(
                    body, mesh=self.mesh, in_specs=(xs,),
                    out_specs=(ys, xs), check_vma=False,
                )
                self._dec_cache[key] = jax.jit(mapped)
            else:

                def body(xp, taps):
                    y = jnp.moveaxis(_dec_body(xp, taps, level, self.spec),
                                     1, 0)
                    y = mag_shrink(y)
                    xr = _rec_body(
                        jnp.moveaxis(y, 0, 1), taps, level,
                        self.plan.preserve_l2, self.spec,
                    )
                    return y, xr

                mapped = jax.shard_map(
                    body, mesh=self.mesh, in_specs=(xs, P()),
                    out_specs=(ys, xs),
                )
                self._dec_cache[key] = jax.jit(
                    lambda xp: mapped(xp, self.plan.taps)
                )
        return self._dec_cache[key]

    def dec_rec_split(self, x_pair, level: int, threshold: float = 0.0):
        return self.dec_rec_split_fn(level, threshold)(x_pair)

    def shard_input_split(self, x_pair):
        """Place a (2, *spatial) split pair: pair axis unsharded, spatial
        axes per ``spec``."""
        return jax.device_put(
            x_pair, NamedSharding(self.mesh, P(None, *self.spec))
        )

    # ------------------------------------------------------------- helpers
    def shard_input(self, x):
        return jax.device_put(x, self.x_sharding)

    def num_bands(self, level: int) -> int:
        return num_bands(self.plan.ndim, level)
