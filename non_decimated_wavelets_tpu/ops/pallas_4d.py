"""Fused Pallas TPU kernels for the 4D non-decimated DWT.

The reference's 4D engine is either 16 full-size frequency kernels
(``Functions/nd_dwt_4D.m:394-444``) or 600 hand-unrolled Haar stencil lines
(``Functions/harr_nddwt_4D.m:248-552``). The XLA direct path here moves
~45 full-size arrays through HBM per analysis level (the separable fan-out's
intermediates). These kernels cut that to ~25 by fusing each level into TWO
``pallas_call``s per direction:

* **lane stage** (axes 2,3): the trailing two axes are flattened into the
  TPU lane dimension (``L = Z*T``, element ``(z,t)`` at lane ``z*T+t``).
  A circular Z-correlation is then a *free lane rotate by multiples of T*
  (``(z-s) mod Z`` preserves ``t`` exactly), and a circular T-correlation is
  a masked double-rotate: lanes with ``t < s`` take the rotate by ``s-T``,
  the rest the rotate by ``s`` — both exact periodic wraps. One grid step
  reads one ``(tx,ty,L)`` tile and writes all 4 (z,t)-band tiles.
* **leading stage** (axes 0,1): operates on a lane-chunked view
  ``(.., X, Y, Z/Zc, Zc*T)`` (``Zc*T`` a multiple of 128) so tiles stay
  small; periodic halos in X/Y are loaded straight from the unpadded array
  via L/C/R wrap-segment DMAs (sublane extents 8-aligned — the empirical
  v5e DMA constraint shared with ``pallas_kernels``). Analysis streams the
  4 lane-stage bands through a double-buffered scratch and emits all 16
  final bands: details via staged DMAs written *in place* into the aliased
  multilevel output (concat-free), the approximation via a lane-blocked
  output. Synthesis streams all 16 band tiles (double-buffered) and
  accumulates the 4 partial (z,t)-bands.

Synthesis is the exact adjoint of both stages in reverse order, with the
reference's per-level ``1/16`` (``Functions/nd_dwt_4D.m`` rec
normalization) folded into the lane-stage accumulator. Multilevel synthesis
is concat-free via the same band-source-table trick as
``pallas_kernels._make_rec_kernel``: band 0 of each shallower group streams
from the previous level's output operand at a static source choice.

Band-order contract (identical to ``ops/direct_path.py``): engine band
index ``b`` has bit ``k`` = high-pass on spatial axis ``k``, bit 0 fastest
(``Functions/nd_dwt_4D.m:370-385``). With the leading stage producing
``a = xbit + 2*ybit`` and the lane stage ``c = zbit + 2*tbit``, the final
index is ``b = a + 4*c`` — separable correlations commute, so the stage
order does not change the values, only the (explicit) indexing.

Dispatched from ``pallas_kernels.dec_pallas``/``rec_pallas`` when
:func:`supported` holds; anything else falls back to the XLA direct path.
"""

from __future__ import annotations

from math import gcd

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import (_combo_src, _compute_dtype, _CondCopy,
                             _n_slab_ops, _round8, _slab_axis_segs,
                             _slab_ref_dict, _up)

# Live-VMEM budget in f32 words (Mosaic's scoped-VMEM accounting is ~2.4x a
# naive stage-sum; this bound maps to the 16MB limit — see
# pallas_kernels._dec_tiles).
_BUDGET = 2_400_000


def _chunk(Z: int, T: int):
    """Smallest Zc with ``Zc*T % 128 == 0`` and ``Z % Zc == 0`` (lane-chunk
    size for the leading stage), or None."""
    zc0 = 128 // gcd(T, 128)
    zc = zc0
    while zc <= Z:
        if Z % zc == 0:
            return zc
        zc += zc0
    return None


def _lane_tiles(X, Y, L, K=8):
    """(tx, ty, static) for the lane stage.

    ``static=True``: fully unrolled taps with static roll shifts — measured
    2.2x (analysis) / 1.6x (adjoint) over the while_loop form, but Mosaic
    keeps every unrolled roll output live, so the tile must satisfy
    ``(3.5K + 10) * tile_words <= budget`` (calibrated on v5e: K=8 at 64K
    words compiles and runs; an 8x8x4096 unrolled db4 kernel OOM'd at
    23.7MB scoped). Falls back to the loop-ified dynamic-shift form
    (``static=False``, ~10 live tiles) for long filters / huge L."""
    static_cap = _BUDGET / (3.5 * K + 10)
    if K <= 8:
        # The 64K-word K=8 point is calibrated known-good on v5e; the
        # linear liveness model lands just under it (63.2K) — floor at the
        # measured point so 8x8x1024 tiles stay on the fast static form.
        static_cap = max(static_cap, 65536)
    for tx, ty in ((8, 8), (4, 8), (2, 8), (1, 8)):
        if X % tx == 0 and Y % ty == 0 and tx * ty * L <= static_cap:
            return (tx, ty, True)
    for tx, ty in ((8, 8), (4, 8), (2, 8), (1, 8)):
        if X % tx == 0 and Y % ty == 0 and 10 * tx * ty * L <= _BUDGET:
            return (tx, ty, False)
    return None


def _lead_tiles(X, Y, zct, K0, K1):
    """(tx, ty) for the leading stage: 2 halo'd bufs + ~6 band tiles + 2
    stage slots, all at lane extent ``zct``."""
    for tx, ty in ((32, 32), (16, 32), (16, 16), (8, 16), (8, 8)):
        if X % tx == 0 and Y % ty == 0:
            ex0 = tx + K0 - 1
            ey = ty + 2 * _round8(K1 // 2)
            live = 2 * ex0 * ey * zct + 8 * tx * ty * zct
            if live <= _BUDGET:
                return (tx, ty)
    return None


def _lead_kgroup(Zcnt, tiles, zct, K0, K1):
    """Lane-chunk group G (k-chunks staged per band write). The idea:
    the dec lead stage is WRITE-bandwidth-bound (~133 GB/s, 512B strided
    runs at zct=128); grouping G adjacent k-chunks per DMA lengthens the
    contiguous runs to ``G*zct*4`` bytes without touching the (hard-capped,
    see CLAUDE.md REJECTED) per-chunk zct.

    MEASURED DEAD-END (r3, ``scripts/exp_4d_kgroup.py``, 64^3x32 db4):
    (32,32) G=1 4.43 ms/level; every G>1 combo either FAILS remote Mosaic
    compile ((16,32) G=2, (16,16) G=4 — liveness-feasible per the model,
    HTTP 500 from the compile helper) or is catastrophically slower on
    smaller tiles ((16,16) G=2 20.4 ms, (8,16) G=4 33.2 ms — tile shrink
    costs far more than run-length buys). Interpret-mode CI cannot catch
    the compile failures, so auto-selection of G>1 is a hardware landmine
    for small-X/Y shapes; pinned to 1. The ``kgroup`` plumbing stays for
    explicit experiments if the Mosaic toolchain updates."""
    return 1


def supported(shape, dtype, taps_np) -> bool:
    if len(shape) != 4:
        return False
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return False
    X, Y, Z, T = shape
    L = Z * T
    if L % 128:
        return False
    zc = _chunk(Z, T)
    if zc is None:
        return False
    K0, K1 = taps_np[0].shape[1], taps_np[1].shape[1]
    K_lane = max(taps_np[2].shape[1], taps_np[3].shape[1])
    return (
        _lane_tiles(X, Y, L, K_lane) is not None
        and _lead_tiles(X, Y, zc * T, K0, K1) is not None
    )


# ---------------------------------------------------------------------------
# Lane-axis correlation machinery (Z and T live in the lane dimension).
#
# Two forms, picked by ``_lane_tiles``:
# * static (preferred): taps fully unrolled, every roll shift a compile-time
#   constant (plain ``tpu.rotate``); the T-block wrap's second rotate is by
#   the constant ``L - T`` and the boundary mask compare is hoisted per tap
#   against a once-computed ``lane mod T``. Measured 2.2x faster analysis /
#   1.6x adjoint than the loop form on v5e (the VPU cost is the rolls, not
#   the FMAs).
# * dynamic: i32 while_loop with ``tpu.dynamic_rotate`` — one rotate live
#   at a time, used when unrolled liveness would blow the 16MB scoped VMEM
#   (long filters x large L; see ``_lane_tiles``).
# ---------------------------------------------------------------------------


def _roll_z_static(v, s, g, z_idx):
    """Static circular Z-shift on the flattened (Zp,Tp) lane axis: a lane
    rotate by ``s*Tp`` (t is preserved exactly). With a padded Z
    (``Zp > Z``, the padded big-odd mode), blocks with ``z < s`` crossed
    the LOGICAL boundary and take the extra rotate by ``-Z*Tp``."""
    Z, T, Zp, Tp = g
    L = v.shape[-1]
    s = s % Z
    if s == 0:
        return v
    r_main = pltpu.roll(v, np.int32((s * Tp) % L), axis=v.ndim - 1)
    if Zp == Z:
        return r_main  # the end-of-lane wrap IS the z wrap
    r_wrap = pltpu.roll(r_main, np.int32((L - Z * Tp) % L),
                        axis=v.ndim - 1)
    return jnp.where(z_idx < np.int32(s), r_wrap, r_main)


def _roll_t_static(v, s, g, lane_mod_T):
    """Static circular T-shift: lanes with ``t < s`` crossed a T-block
    boundary and take the extra constant rotate by ``-T`` (mod L). With
    a padded T (``Tp > T``) the wrap is at the LOGICAL T inside
    Tp-strided blocks; garbage lanes ``t >= T`` stay garbage."""
    Z, T, Zp, Tp = g
    L = v.shape[-1]
    s = s % T
    if s == 0:
        return v
    r_main = pltpu.roll(v, np.int32(s), axis=v.ndim - 1)
    r_wrap = pltpu.roll(r_main, np.int32((L - T) % L), axis=v.ndim - 1)
    return jnp.where(lane_mod_T < np.int32(s), r_wrap, r_main)


def _lane_mod_T(shape, Tp):
    """lane mod Tp (the PHYSICAL block stride)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return jax.lax.rem(lane, np.int32(Tp))


def _z_idx(shape, Tp):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return jax.lax.div(lane, np.int32(Tp))


def _pair_static(v, taps_np, g, is_t, lane_mod_T, z_idx):
    """(lo, hi) analysis pair, unrolled static shifts (anchor K//2 - 1);
    both filter rows share every roll."""
    K = taps_np.shape[1]
    o = K // 2 - 1
    N = g[1] if is_t else g[0]
    alo = ahi = None
    for j in range(K):
        s = (o - j) % N
        r = (_roll_t_static(v, s, g, lane_mod_T) if is_t
             else _roll_z_static(v, s, g, z_idx))
        tl = float(taps_np[0, j]) * r
        th = float(taps_np[1, j]) * r
        alo = tl if alo is None else alo + tl
        ahi = th if ahi is None else ahi + th
    return alo, ahi


def _adj_static(v, taps_np, sel, g, is_t, lane_mod_T, z_idx):
    """Adjoint single-row correlation, unrolled static shifts (reversed
    taps at the mirrored anchor K//2)."""
    K = taps_np.shape[1]
    anchor = K // 2
    N = g[1] if is_t else g[0]
    trow = taps_np[sel]
    acc = None
    for j in range(K):
        s = (anchor - j) % N
        r = (_roll_t_static(v, s, g, lane_mod_T) if is_t
             else _roll_z_static(v, s, g, z_idx))
        term = float(trow[K - 1 - j]) * r
        acc = term if acc is None else acc + term
    return acc


def _lane_shift_dyn(v, g, is_t: bool, shift):
    """Rotate ``v``'s flattened (Zp,Tp) lane axis circularly along the
    LOGICAL Z (``is_t=False``) or T (masked double-rotate at the logical
    extent inside Tp-strided blocks). ``shift`` is a traced i32 (already
    reduced mod the logical extent)."""
    Z, T, Zp, Tp = g
    L = v.shape[-1]
    ax = v.ndim - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    if not is_t:
        r_main = pltpu.roll(v, shift * np.int32(Tp), axis=ax)
        if Zp == Z:
            return r_main
        r_wrap = pltpu.roll(
            v,
            jax.lax.rem(
                (shift - np.int32(Z)) * np.int32(Tp) + np.int32(2 * L),
                np.int32(L),
            ),
            axis=ax,
        )
        return jnp.where(
            jax.lax.div(lane, np.int32(Tp)) < shift, r_wrap, r_main
        )
    s = shift
    r_main = pltpu.roll(v, s, axis=ax)
    r_wrap = pltpu.roll(v, jax.lax.rem(s - np.int32(T) + np.int32(L), np.int32(L)),
                        axis=ax)
    return jnp.where(jax.lax.rem(lane, np.int32(Tp)) < s, r_wrap, r_main)


def _lane_corr_fori(v, taps_ref, sel, g, is_t, o, reverse):
    """K-tap correlation along the lane-resident Z or T axis as an i32
    while_loop — ONE rotate live at a time. An unrolled tap chain keeps
    every rotate output on Mosaic's 16MB scoped stack (a db4 (8,8,4096)
    lane kernel compiled to a 23.7MB allocation — same lesson as
    ``pallas_resident``); the loop form compiles in budget.

    ``reverse=False``: y[n] = sum_j t[j] v[n+j-o]  (shift by o-j).
    ``reverse=True``: adjoint — reversed taps at the mirrored anchor."""
    K = taps_ref.shape[1]
    anchor = (K - 1 - o) if reverse else o
    N = g[1] if is_t else g[0]

    def cond(carry):
        return carry[0] < np.int32(K)

    def body(carry):
        j, acc = carry
        s = jax.lax.rem(np.int32(anchor) - j + np.int32(16 * N), np.int32(N))
        r = _lane_shift_dyn(v, g, is_t, s)
        tap_idx = (np.int32(K - 1) - j) if reverse else j
        t = taps_ref[np.int32(sel), tap_idx]
        return (j + np.int32(1), acc + t * r)

    j0 = jnp.asarray(0, jnp.int32)
    return jax.lax.while_loop(cond, body, (j0, jnp.zeros_like(v)))[1]


def _lane_pair(v, taps_ref, g, is_t: bool):
    """(lo, hi) analysis correlations along Z or T (anchor ``K//2 - 1``),
    sharing every rotate between the two filter rows (one loop, both
    accumulators in the carry)."""
    K = taps_ref.shape[1]
    o = K // 2 - 1
    N = g[1] if is_t else g[0]

    def cond(carry):
        return carry[0] < np.int32(K)

    def body(carry):
        j, alo, ahi = carry
        s = jax.lax.rem(np.int32(o) - j + np.int32(16 * N), np.int32(N))
        r = _lane_shift_dyn(v, g, is_t, s)
        return (
            j + np.int32(1),
            alo + taps_ref[np.int32(0), j] * r,
            ahi + taps_ref[np.int32(1), j] * r,
        )

    j0 = jnp.asarray(0, jnp.int32)
    z = jnp.zeros_like(v)
    _, lo, hi = jax.lax.while_loop(cond, body, (j0, z, z))
    return lo, hi


def _lane_adj(v, taps_ref, sel: int, g, is_t: bool):
    """Adjoint pass for one filter row: reversed taps at the mirrored
    anchor ``o' = K//2`` (same convention as pallas_kernels synthesis)."""
    K = taps_ref.shape[1]
    o = K // 2 - 1
    return _lane_corr_fori(v, taps_ref, sel, g, is_t, o, True)


# ---------------------------------------------------------------------------
# Wrap-segment halo DMAs for the leading stage (X outer, Y sublane-aligned).
# ---------------------------------------------------------------------------


def _lead_halos(K0, K1, adjoint: bool):
    """((h0_l, h0_r), (W, W)): X halos exact, Y halos 8-aligned."""
    if adjoint:
        h0 = (K0 // 2, K0 // 2 - 1)
        h1w = _round8(max(K1 // 2, K1 // 2 - 1))
    else:
        h0 = (K0 // 2 - 1, K0 // 2)
        h1w = _round8(max(K1 // 2 - 1, K1 // 2))
    return h0, (h1w, h1w)


def _halo_copies(src_ref, buf_ref, sem, band, XY, tiles, halos, i, j, k, slot,
                 padded=None, slab_axes=(), slab_refs=None, kgroup=1,
                 wrap_axes=()):
    """L/C/R wrap-segment copies of one halo'd (X,Y) tile: src
    (Bands, X, Y, Zcnt, ZcT) at band ``band`` (static) and lane chunk ``k``
    (traced scalar, collapsed) -> buf (slots, ex0, ey, ZcT).

    ``padded[ax]`` marks axes whose source is already halo-padded (the
    concat 'valid' mode used inside ``shard_map`` — ppermute supplies the
    periodic halo): the three wrap segments collapse to one contiguous copy
    at offset ``i*t``.

    ``slab_axes``/``slab_refs``: the slab 'valid' mode (see
    ``pallas_kernels._seg_copies_one``) — the main array stays unpadded;
    shard-boundary tiles' L/R segments read the small ppermuted slabs
    (per-axis, plus the two-hop corner slab for an X,Y pair), interior
    tiles read local rows, selected with ``_CondCopy`` pairs. Requires
    halo widths within one tile (caller gates)."""
    per_axis = []  # (src_start, dst_off, extent, variant-or-None)
    for ax in range(2):
        N = XY[ax]
        t = tiles[ax]
        w_l, w_r = halos[ax]
        gi = (i, j)[ax]
        base = gi * np.int32(t)
        if ax in slab_axes or ax in wrap_axes:
            per_axis.append(
                _slab_axis_segs(base, gi, t, N, w_l, w_r, ax == 1, ax,
                                local_wrap=ax in wrap_axes)
            )
            continue
        if padded is not None and padded[ax]:
            s0 = pl.multiple_of(base, 8) if ax == 1 else base
            per_axis.append([(s0, 0, w_l + t + w_r, None)])
            continue
        sL = jax.lax.rem(base + np.int32(N - w_l), np.int32(N))
        sC = base
        sR = jax.lax.rem(base + np.int32(t), np.int32(N))
        if ax == 1:
            # Mosaic must prove sublane alignment of the wrap starts.
            sL = pl.multiple_of(sL, 8)
            sC = pl.multiple_of(sC, 8)
            sR = pl.multiple_of(sR, 8)
        segs = [(sL, 0, w_l, None), (sC, w_l, t, None),
                (sR, w_l + t, w_r, None)]
        per_axis.append([s for s in segs if s[2] > 0])
    copies = []
    for cx in per_axis[0]:
        for cy in per_axis[1]:
            variants = [s[3] for s in (cx, cy) if s[3] is not None]
            ref, cond = _combo_src(variants, src_ref, slab_refs)
            kidx = (
                k if kgroup == 1
                else pl.ds(k * np.int32(kgroup), kgroup)
            )
            src = (
                np.int32(band),
                pl.ds(cx[0], cx[2]),
                pl.ds(cy[0], cy[2]),
                kidx,
                slice(None),
            )
            dst = (
                np.int32(slot),
                slice(cx[1], cx[1] + cx[2]),
                slice(cy[1], cy[1] + cy[2]),
            ) + ((slice(None),) if kgroup > 1 else ()) + (slice(None),)
            cp = pltpu.make_async_copy(ref.at[src], buf_ref.at[dst], sem)
            copies.append(cp if cond is None else _CondCopy(cond, cp))
    return copies


def _lane_edge_copies(out_ref, edge_refs, sem_edge, XY, tiles, halos, i, j,
                      slab_axes, has_band):
    """Conditional DMAs writing the lane-stage output tile's shard-boundary
    X/Y rows into per-slab-axis edges outputs (``[my tail | my head]`` in
    the ``(4?, X, Y, L)`` lane view) — the lead stage's slab source, so the
    4D per-level XLA slab build of the temp/acc arrays disappears (see
    ``pallas_kernels._edge_copies``). Safe extents: X regions carry the
    full ty sublane; Y widths are the 8-aligned lead halos."""
    copies = []
    cnt = 0
    lead = (slice(None),) if has_band else ()
    for n, ax in enumerate(sorted(slab_axes)):
        w_l, w_r = halos[ax]
        t = tiles[ax]
        n_tiles = XY[ax] // t
        gi = (i, j)[ax]
        first = gi == np.int32(0)
        last = gi == np.int32(n_tiles - 1)
        er = edge_refs[n]

        def _dst(off, e, ax=ax):
            sp = tuple(
                pl.ds(np.int32(off), e) if a == ax
                else pl.ds((i, j)[a] * np.int32(tiles[a]), tiles[a])
                for a in range(2)
            )
            return lead + sp + (slice(None),)

        def _src(s0, e, ax=ax):
            sp = tuple(
                slice(s0, s0 + e) if a == ax else slice(None)
                for a in range(2)
            )
            return lead + sp + (slice(None),)

        if w_l:
            cp = pltpu.make_async_copy(
                out_ref.at[_src(t - w_l, w_l)],
                er.at[_dst(0, w_l)],
                sem_edge.at[np.int32(cnt)],
            )
            copies.append(_CondCopy(last, cp))
            cnt += 1
        if w_r:
            cp = pltpu.make_async_copy(
                out_ref.at[_src(0, w_r)],
                er.at[_dst(w_l, w_r)],
                sem_edge.at[np.int32(cnt)],
            )
            copies.append(_CondCopy(first, cp))
            cnt += 1
    return copies


def _lane_edge_out(X, Y, L, halos, slab_axes, dtype, has_band):
    """(out_specs, out_shapes) for the lane-view edges outputs."""
    specs, shapes = [], []
    lead = (4,) if has_band else ()
    for ax in sorted(slab_axes):
        w_l, w_r = halos[ax]
        sp = (w_l + w_r, Y) if ax == 0 else (X, w_l + w_r)
        specs.append(pl.BlockSpec(memory_space=pl.ANY))
        shapes.append(jax.ShapeDtypeStruct(lead + sp + (L,), dtype))
    return specs, shapes


# ---------------------------------------------------------------------------
# Analysis
# ---------------------------------------------------------------------------


def _lane_dec_call(x3, taps_np, T, tiles, edge_spec=None, geom=None):
    """(X, Y, L) -> (4, X, Y, L): all four (z,t)-bands per input read.
    ``geom=(Z, T, Zp, Tp)``: logical extents inside a lane-padded layout
    (padded big-odd mode); default = unpadded.

    Static path runs the masked (expensive) T-pair ONCE on the input and
    the cheap Z-pairs on its two outputs — ~20% fewer vector ops than the
    Z-first order, on top of the static-shift win.

    ``edge_spec``: ``(slab_axes, lead_halos)`` — additionally emit one
    ``[my tail | my head]`` edges output per slab axis (the lead stage's
    slab source, see ``_lane_edge_copies``); returns ``(out, *edges)``."""
    X, Y, L = x3.shape
    g = geom if geom is not None else (L // T, T, L // T, T)
    Z, T = g[0], g[1]
    tx, ty, static = tiles
    tz_np, tt_np = taps_np[2], taps_np[3]
    # SMEM taps in the compute dtype (f32 for bf16 arrays — see _up).
    tdt = _compute_dtype(x3.dtype)
    taps_ops = [jnp.asarray(taps_np[2], tdt), jnp.asarray(taps_np[3], tdt)]
    slab_axes, halos = edge_spec if edge_spec is not None else ((), None)

    def kernel(x_ref, tz_ref, tt_ref, out_ref, *rest):
        v = _up(x_ref[...])
        od = out_ref.dtype
        if static:
            lmt = _lane_mod_T(v.shape, g[3])
            zix = _z_idx(v.shape, g[3]) if g[2] != g[0] else None
            tlo, thi = _pair_static(v, tt_np, g, True, lmt, zix)
            for tbit, vt in enumerate((tlo, thi)):
                zlo, zhi = _pair_static(vt, tz_np, g, False, lmt, zix)
                out_ref[np.int32(2 * tbit)] = zlo.astype(od)  # c = zbit+2*tbit
                out_ref[np.int32(2 * tbit + 1)] = zhi.astype(od)
        else:
            zlo, zhi = _lane_pair(v, tz_ref, g, is_t=False)
            for zbit, vz in enumerate((zlo, zhi)):
                tlo, thi = _lane_pair(vz, tt_ref, g, is_t=True)
                out_ref[np.int32(zbit)] = tlo.astype(od)
                out_ref[np.int32(zbit + 2)] = thi.astype(od)
        if edge_spec is not None:
            edge_refs, sem_edge = rest[:-1], rest[-1]
            cps = _lane_edge_copies(
                out_ref, edge_refs, sem_edge, (X, Y), (tx, ty), halos,
                pl.program_id(0), pl.program_id(1), slab_axes, True,
            )
            for c in cps:
                c.start()
            for c in cps:
                c.wait()

    out_specs = pl.BlockSpec(
        (4, tx, ty, L),
        lambda i, j: (np.int32(0), i, j, np.int32(0)),
        # Explicit VMEM: the edge DMAs source this blocked output; with the
        # default space the interpret runtime resolves the DMA source to a
        # nonexistent 'any' backing buffer (KeyError).
        memory_space=pltpu.VMEM if edge_spec is not None else None,
    )
    out_shape = jax.ShapeDtypeStruct((4, X, Y, L), x3.dtype)
    scratch = []
    if edge_spec is not None:
        e_specs, e_shapes = _lane_edge_out(
            X, Y, L, halos, slab_axes, x3.dtype, True
        )
        out_specs = tuple([out_specs] + e_specs)
        out_shape = tuple([out_shape] + e_shapes)
        scratch = [pltpu.SemaphoreType.DMA((4,))]

    return pl.pallas_call(
        kernel,
        grid=(X // tx, Y // ty),
        in_specs=[
            pl.BlockSpec((tx, ty, L), lambda i, j: (i, j, np.int32(0)))
        ]
        + [
            # explicit np.int32 index maps (x64-safe, see pallas_resident)
            pl.BlockSpec(
                t.shape,
                lambda i, j: (np.int32(0), np.int32(0)),
                memory_space=pltpu.SMEM,
            )
            for t in taps_ops
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(x3, *taps_ops)


def _lead_dec_call(temp5, big5, band_off, taps_np, tiles, zct,
                   shape_xy=None, padded=None, approx_to_big=False,
                   slab_axes=(), slabs=(), lam=0.0, kgroup=1,
                   wrap_axes=()):
    """Leading-axes fan-out: temp (4, X, Y, Zcnt, ZcT) -> 15 detail bands
    DMA'd in place into the aliased ``big5`` at ``band_off``, plus the next
    approximation as a lane-blocked output (X, Y, L).

    ``shape_xy``/``padded``: 'valid' mode — ``temp5`` is halo-padded on the
    ``padded`` (X, Y) axes by the ``_lead_halos`` widths and ``shape_xy``
    is the unpadded output extent. ``approx_to_big``: final level — the
    approximation is DMA'd into band 0 of ``big5`` like a detail (no
    blocked approx output, no trailing XLA ``at[0].set`` copy).
    ``kgroup``: stage G adjacent k-chunks per band DMA (both directions:
    halo'd loads and detail writes move (..., G, zct) blocks), lengthening
    the strided runs from ``zct*4`` to ``G*zct*4`` bytes — the write path
    is DMA-run-length-bound (measured ~133 GB/s at 512B runs vs the
    ~250 GB/s ceiling; see ``_lead_kgroup``)."""
    _, X, Y, Zcnt, _ = temp5.shape
    if shape_xy is not None:
        X, Y = shape_xy
        Zcnt = temp5.shape[3]
    tx, ty = tiles
    t0, t1 = taps_np[0], taps_np[1]
    K0, K1 = t0.shape[1], t1.shape[1]
    halos = _lead_halos(K0, K1, adjoint=False)
    ex0 = tx + K0 - 1
    ey = ty + 2 * halos[1][0]
    start1 = halos[1][0] - (K1 // 2 - 1)

    n_slabs = _n_slab_ops(slab_axes)
    G = int(kgroup)

    def shrink(val, b):
        if lam and b != 0:
            # In-register detail shrink (fused prox step — the XLA
            # equivalent is a separate full-band pass at ~55 GB/s).
            mag = jnp.abs(val)
            val = val * (
                jnp.maximum(mag - lam, 0.0) / jnp.maximum(mag, 1e-30)
            )
        return val

    def kernel_grouped(temp_hbm, *rest):
        t_slabs = _slab_ref_dict(slab_axes, rest[:n_slabs])
        rest = rest[n_slabs:]
        big_in, big_ref, rest = rest[0], rest[1], rest[2:]
        if approx_to_big:
            app_ref = None
            buf, stage, sem_in, sem_out = rest
        else:
            app_ref, buf, stage, sem_in, sem_out = rest
        del big_in  # aliased to big_ref (input_output_aliases)
        i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        def load(c, slot):
            return _halo_copies(
                temp_hbm, buf, sem_in.at[np.int32(slot)], c, (X, Y),
                (tx, ty), halos, i, j, k, slot, padded,
                slab_axes=slab_axes, slab_refs=t_slabs, kgroup=G,
                wrap_axes=wrap_axes,
            )

        for cp in load(0, 0):
            cp.start()
        inflight = [None, None]
        out_slot = 0
        for c in range(4):
            if c + 1 < 4:
                for cp in load(c + 1, (c + 1) % 2):
                    cp.start()
            for cp in load(c, c % 2):
                cp.wait()
            # All 4 (ybit, xbit) band tiles for every chunk g of this temp
            # band, retained so each band's G chunks go out as ONE DMA.
            vals = [[None] * G for _ in range(4)]
            for g in range(G):
                v = _up(buf[np.int32(c % 2), :, :, np.int32(g), :])
                ylo = yhi = None
                for jj in range(K1):
                    r = v[:, start1 + jj : start1 + jj + ty, :]
                    tl = float(t1[0, jj]) * r
                    th = float(t1[1, jj]) * r
                    ylo = tl if ylo is None else ylo + tl
                    yhi = th if yhi is None else yhi + th
                for ybit, vy in enumerate((ylo, yhi)):
                    xlo = xhi = None
                    for jj in range(K0):
                        r = vy[jj : jj + tx, :, :]
                        tl = float(t0[0, jj]) * r
                        th = float(t0[1, jj]) * r
                        xlo = tl if xlo is None else xlo + tl
                        xhi = th if xhi is None else xhi + th
                    vals[2 * ybit + 0][g] = xlo
                    vals[2 * ybit + 1][g] = xhi
            for sub in range(4):
                b = 4 * c + sub
                if b == 0 and not approx_to_big:
                    for g in range(G):
                        app_ref[
                            :, :, g * zct : (g + 1) * zct
                        ] = vals[sub][g].astype(app_ref.dtype)
                    continue
                if inflight[out_slot] is not None:
                    inflight[out_slot].wait()
                for g in range(G):
                    stage[
                        np.int32(out_slot), :, :, np.int32(g), :
                    ] = shrink(vals[sub][g], b).astype(stage.dtype)
                out_band = 0 if b == 0 else band_off + b - 1
                cpy = pltpu.make_async_copy(
                    stage.at[np.int32(out_slot)],
                    big_ref.at[
                        (
                            np.int32(out_band),
                            pl.ds(i * np.int32(tx), tx),
                            pl.ds(j * np.int32(ty), ty),
                            pl.ds(k * np.int32(G), G),
                            slice(None),
                        )
                    ],
                    sem_out.at[np.int32(out_slot)],
                )
                cpy.start()
                inflight[out_slot] = cpy
                out_slot ^= 1
        for cpy in inflight:
            if cpy is not None:
                cpy.wait()

    def kernel(temp_hbm, *rest):
        t_slabs = _slab_ref_dict(slab_axes, rest[:n_slabs])
        rest = rest[n_slabs:]
        big_in, big_ref, rest = rest[0], rest[1], rest[2:]
        if approx_to_big:
            app_ref = None
            buf, stage, sem_in, sem_out = rest
        else:
            app_ref, buf, stage, sem_in, sem_out = rest
        del big_in  # aliased to big_ref (input_output_aliases)
        i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        def load(c, slot):
            return _halo_copies(
                temp_hbm, buf, sem_in.at[np.int32(slot)], c, (X, Y),
                (tx, ty), halos, i, j, k, slot, padded,
                slab_axes=slab_axes, slab_refs=t_slabs,
                wrap_axes=wrap_axes,
            )

        for cp in load(0, 0):
            cp.start()
        # 2 staging slots: probed 3/4 on v5e — the detail-write path is
        # DMA-bandwidth-bound, deeper staging measured slightly slower.
        inflight = [None, None]
        out_slot = 0
        for c in range(4):
            if c + 1 < 4:
                for cp in load(c + 1, (c + 1) % 2):
                    cp.start()
            for cp in load(c, c % 2):
                cp.wait()
            v = _up(buf[np.int32(c % 2)])
            # Axis 1 (sublane) first so extents shrink before the axis-0
            # fan-out; the aligned surplus halo is absorbed into the slice
            # starts (no trimming copy).
            ylo = yhi = None
            for jj in range(K1):
                r = v[:, start1 + jj : start1 + jj + ty, :]
                tl = float(t1[0, jj]) * r
                th = float(t1[1, jj]) * r
                ylo = tl if ylo is None else ylo + tl
                yhi = th if yhi is None else yhi + th
            for ybit, vy in enumerate((ylo, yhi)):
                xlo = xhi = None
                for jj in range(K0):
                    r = vy[jj : jj + tx, :, :]
                    tl = float(t0[0, jj]) * r
                    th = float(t0[1, jj]) * r
                    xlo = tl if xlo is None else xlo + tl
                    xhi = th if xhi is None else xhi + th
                for xbit, val in enumerate((xlo, xhi)):
                    b = 4 * c + 2 * ybit + xbit
                    val = shrink(val, b)
                    if b == 0 and not approx_to_big:
                        app_ref[...] = val.astype(app_ref.dtype)
                        continue
                    if inflight[out_slot] is not None:
                        inflight[out_slot].wait()
                    stage[np.int32(out_slot)] = val.astype(stage.dtype)
                    out_band = 0 if b == 0 else band_off + b - 1
                    cpy = pltpu.make_async_copy(
                        stage.at[np.int32(out_slot)],
                        big_ref.at[
                            (
                                np.int32(out_band),
                                pl.ds(i * np.int32(tx), tx),
                                pl.ds(j * np.int32(ty), ty),
                                k,
                                slice(None),
                            )
                        ],
                        sem_out.at[np.int32(out_slot)],
                    )
                    cpy.start()
                    inflight[out_slot] = cpy
                    out_slot ^= 1
        for cpy in inflight:
            if cpy is not None:
                cpy.wait()

    B = big5.shape[0]
    if approx_to_big:
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
        out_shape = jax.ShapeDtypeStruct(big5.shape, temp5.dtype)
    else:
        out_specs = (
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (tx, ty, G * zct), lambda i, j, k: (i, j, k)
            ),
        )
        out_shape = (
            jax.ShapeDtypeStruct(big5.shape, temp5.dtype),
            jax.ShapeDtypeStruct((X, Y, Zcnt * zct), temp5.dtype),
        )
    operands = (temp5,) + tuple(slabs)
    if G > 1:
        buf_shape = (2, ex0, ey, G, zct)
        stage_shape = (2, tx, ty, G, zct)
    else:
        buf_shape = (2, ex0, ey, zct)
        stage_shape = (2, tx, ty, zct)
    return pl.pallas_call(
        kernel_grouped if G > 1 else kernel,
        grid=(X // tx, Y // ty, Zcnt // G),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (len(operands) + 1),
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={len(operands): 0},
        scratch_shapes=[
            pltpu.VMEM(buf_shape, temp5.dtype),
            pltpu.VMEM(stage_shape, temp5.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(*operands, big5)


def dec4(x, taps_np, level: int, lam: float = 0.0):
    """Multilevel 4D analysis; (X,Y,Z,T) -> (B, X,Y,Z,T). Two fused
    pallas_calls per level; the only XLA data movement is the final
    approx-band write. ``lam``: detail soft-threshold fused into the
    lead-stage band writes."""
    X, Y, Z, T = x.shape
    L = Z * T
    zc = _chunk(Z, T)
    zct = zc * T
    Zcnt = Z // zc
    lane_t = _lane_tiles(X, Y, L, max(taps_np[2].shape[1], taps_np[3].shape[1]))
    lead_t = _lead_tiles(X, Y, zct, taps_np[0].shape[1], taps_np[1].shape[1])
    kg = _lead_kgroup(Zcnt, lead_t, zct, taps_np[0].shape[1],
                      taps_np[1].shape[1])
    nb = 16
    B = nb + (nb - 1) * (level - 1)

    big5 = jnp.empty((B, X, Y, Zcnt, zct), x.dtype)
    approx = x.reshape(X, Y, L)
    off = B
    for lvl in range(level):
        off -= nb - 1
        final = lvl == level - 1
        temp5 = _lane_dec_call(approx, taps_np, T, lane_t).reshape(
            4, X, Y, Zcnt, zct
        )
        out = _lead_dec_call(temp5, big5, off, taps_np, lead_t, zct,
                             approx_to_big=final, lam=lam, kgroup=kg)
        if final:
            big5 = out
        else:
            big5, app = out
            approx = app.reshape(X, Y, L)
    return big5.reshape(B, X, Y, Z, T)


# ---------------------------------------------------------------------------
# Synthesis (exact adjoint, streaming, concat-free multilevel)
# ---------------------------------------------------------------------------


def _lead_adj_call(y5, approx, band_src, taps_np, tiles, zct,
                   shape_xy=None, padded=None, slab_axes=(), y_slabs=(),
                   a_slabs=(), wrap_axes=()):
    """Adjoint leading stage -> partial (4, X, Y, L) with
    ``partial[c] = sum_a adj(band[4c+a])``.

    ``band_src[b]`` is ``("y", idx)`` (band ``idx`` of ``y5``) or
    ``("a", 0)`` (the running approximation operand, shape (X, Y, L)) — the
    concat-free multilevel trick shared with ``pallas_kernels``. All 16
    band tiles stream through a 2-slot double buffer.
    ``shape_xy``/``padded``: 'valid' mode (sources halo-padded on the
    ``padded`` axes by the adjoint ``_lead_halos`` widths)."""
    _, X, Y, Zcnt, _ = y5.shape
    if shape_xy is not None:
        X, Y = shape_xy
        Zcnt = y5.shape[3]
    tx, ty = tiles
    t0, t1 = taps_np[0], taps_np[1]
    K0, K1 = t0.shape[1], t1.shape[1]
    halos = _lead_halos(K0, K1, adjoint=True)
    ex0 = tx + K0 - 1
    ey = ty + 2 * halos[1][0]
    start1 = halos[1][0] - K1 // 2
    has_approx = any(kind == "a" for kind, _ in band_src)

    n_slabs = _n_slab_ops(slab_axes)

    def kernel(*args):
        args = list(args)
        y_hbm = args.pop(0)
        y_refs = _slab_ref_dict(slab_axes, args[:n_slabs])
        del args[:n_slabs]
        if has_approx:
            a_hbm = args.pop(0)
            a_refs = _slab_ref_dict(slab_axes, args[:n_slabs])
            del args[:n_slabs]
        else:
            a_hbm, a_refs = None, {}
        out_ref, buf, sem_in = args
        i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        def load(b, slot):
            kind, idx = band_src[b]
            src = y_hbm if kind == "y" else a_hbm
            refs = y_refs if kind == "y" else a_refs
            return _halo_copies(
                src, buf, sem_in.at[np.int32(slot)], idx, (X, Y),
                (tx, ty), halos, i, j, k, slot, padded,
                slab_axes=slab_axes, slab_refs=refs,
                wrap_axes=wrap_axes,
            )

        # Pair-tree adjoint (the 3D `_stream_band_tree` idea): the Y
        # adjoint is applied per band, the X adjoint to the SUM of the
        # two bands sharing an X filter — 4*K1 Y-passes + 2*K0 X-passes
        # per group instead of 4*(K1+K0), ~23% less lead-stage VPU work
        # for db4 tiles. Stream order within a group is (0,2,1,3) so
        # X-filter partners are adjacent in the 2-slot double buffer.
        order = [4 * c + a for c in range(4) for a in (0, 2, 1, 3)]
        for cp in load(order[0], 0):
            cp.start()
        acc = None
        part = None
        for s in range(16):
            b = order[s]
            c, a = b // 4, b % 4
            slot = s % 2
            if s + 1 < 16:
                for cp in load(order[s + 1], (s + 1) % 2):
                    cp.start()
            for cp in load(b, slot):
                cp.wait()
            v = _up(buf[np.int32(slot)])
            trow1 = t1[(a >> 1) & 1][::-1]
            y1 = None
            for jj in range(K1):
                r = v[:, start1 + jj : start1 + jj + ty, :]
                term = float(trow1[jj]) * r
                y1 = term if y1 is None else y1 + term
            if part is None:
                part = y1
                continue
            part = part + y1
            trow0 = t0[a & 1][::-1]
            y0 = None
            for jj in range(K0):
                r = part[jj : jj + tx, :, :]
                term = float(trow0[jj]) * r
                y0 = term if y0 is None else y0 + term
            part = None
            acc = y0 if acc is None else acc + y0
            if s % 4 == 3:
                out_ref[np.int32(c)] = acc.astype(out_ref.dtype)
                acc = None

    operands = (y5,) + tuple(y_slabs)
    if approx is not None:
        operands = operands + (approx,) + tuple(a_slabs)
    # X-axis adjoint halos are exact (h_l = K0//2): slice start 0 in the
    # buffered tile already sits at the anchor (start0 = h_l - K0//2 = 0).
    return pl.pallas_call(
        kernel,
        grid=(X // tx, Y // ty, Zcnt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(operands),
        out_specs=pl.BlockSpec(
            (4, tx, ty, zct),
            lambda i, j, k: (np.int32(0), i, j, k),
        ),
        out_shape=jax.ShapeDtypeStruct((4, X, Y, Zcnt * zct), y5.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ex0, ey, zct), y5.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(*operands)


def _lane_adj_call(partial, taps_np, T, tiles, scale, edge_spec=None,
                   geom=None):
    """Adjoint lane stage: (4, X, Y, L) -> (X, Y, L); the reference's
    per-level ``1/2^d`` folded into the accumulate.

    Static path tree-factors ``sum_c Lane_c^T = sum_t T_t^T [sum_z Z_z^T]``
    so the masked T-adjoint runs twice instead of four times (4 cheap
    Z-adjoints + 2 T-adjoints vs 4+4 unfactored).

    ``edge_spec``: ``(slab_axes, lead_adj_halos)`` — additionally emit the
    ``[my tail | my head]`` edges outputs (the next level's ``a_slabs``
    source, see ``_lane_edge_copies``); returns ``(acc, *edges)``."""
    _, X, Y, L = partial.shape
    g = geom if geom is not None else (L // T, T, L // T, T)
    Z, T = g[0], g[1]
    tx, ty, static = tiles
    tz_np, tt_np = taps_np[2], taps_np[3]
    tdt = _compute_dtype(partial.dtype)
    taps_ops = [
        jnp.asarray(taps_np[2], tdt),
        jnp.asarray(taps_np[3], tdt),
    ]
    slab_axes, halos = edge_spec if edge_spec is not None else ((), None)

    def kernel(p_ref, tz_ref, tt_ref, out_ref, *rest):
        od = out_ref.dtype
        if static:
            lmt = _lane_mod_T((tx, ty, L), g[3])
            zix = _z_idx((tx, ty, L), g[3]) if g[2] != g[0] else None
            outer = None
            for tbit in range(2):
                inner = None
                for zbit in range(2):
                    c = zbit + 2 * tbit
                    vz = _adj_static(
                        _up(p_ref[np.int32(c)]), tz_np, zbit, g, False,
                        lmt, zix
                    )
                    inner = vz if inner is None else inner + vz
                vt = _adj_static(inner, tt_np, tbit, g, True, lmt, zix)
                outer = vt if outer is None else outer + vt
            if scale != 1.0:
                outer = outer * scale
            out_ref[...] = outer.astype(od)
        else:
            acc = None
            for c in range(4):
                v = _up(p_ref[np.int32(c)])
                vt = _lane_adj(v, tt_ref, (c >> 1) & 1, g, is_t=True)
                vz = _lane_adj(vt, tz_ref, c & 1, g, is_t=False)
                acc = vz if acc is None else acc + vz
            if scale != 1.0:
                acc = acc * scale
            out_ref[...] = acc.astype(od)
        if edge_spec is not None:
            edge_refs, sem_edge = rest[:-1], rest[-1]
            cps = _lane_edge_copies(
                out_ref, edge_refs, sem_edge, (X, Y), (tx, ty), halos,
                pl.program_id(0), pl.program_id(1), slab_axes, False,
            )
            for c in cps:
                c.start()
            for c in cps:
                c.wait()

    out_specs = pl.BlockSpec(
        (tx, ty, L), lambda i, j: (i, j, np.int32(0)),
        # Explicit VMEM when edge DMAs source this output (see lane dec).
        memory_space=pltpu.VMEM if edge_spec is not None else None,
    )
    out_shape = jax.ShapeDtypeStruct((X, Y, L), partial.dtype)
    scratch = []
    if edge_spec is not None:
        e_specs, e_shapes = _lane_edge_out(
            X, Y, L, halos, slab_axes, partial.dtype, False
        )
        out_specs = tuple([out_specs] + e_specs)
        out_shape = tuple([out_shape] + e_shapes)
        scratch = [pltpu.SemaphoreType.DMA((4,))]

    return pl.pallas_call(
        kernel,
        grid=(X // tx, Y // ty),
        in_specs=[
            pl.BlockSpec(
                (4, tx, ty, L),
                lambda i, j: (np.int32(0), i, j, np.int32(0)),
            )
        ]
        + [
            pl.BlockSpec(
                t.shape,
                lambda i, j: (np.int32(0), np.int32(0)),
                memory_space=pltpu.SMEM,
            )
            for t in taps_ops
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(partial, *taps_ops)


def rec4(y, taps_np, level: int, preserve_l2: bool):
    """Multilevel 4D synthesis; (B, X,Y,Z,T) -> (X,Y,Z,T)."""
    B, X, Y, Z, T = y.shape
    L = Z * T
    zc = _chunk(Z, T)
    zct = zc * T
    Zcnt = Z // zc
    lane_t = _lane_tiles(X, Y, L, max(taps_np[2].shape[1], taps_np[3].shape[1]))
    lead_t = _lead_tiles(X, Y, zct, taps_np[0].shape[1], taps_np[1].shape[1])
    nb = 16
    scale = 1.0 if preserve_l2 else 1.0 / nb

    y5 = y.reshape(B, X, Y, Zcnt, zct)
    band_src = [("y", b) for b in range(nb)]
    partial = _lead_adj_call(y5, None, band_src, taps_np, lead_t, zct)
    acc = _lane_adj_call(partial.reshape(4, X, Y, L), taps_np, T, lane_t, scale)
    pos = nb
    for _ in range(1, level):
        band_src = [("a", 0)] + [("y", pos + b - 1) for b in range(1, nb)]
        acc5 = acc.reshape(1, X, Y, Zcnt, zct)
        partial = _lead_adj_call(y5, acc5, band_src, taps_np, lead_t, zct)
        acc = _lane_adj_call(
            partial.reshape(4, X, Y, L), taps_np, T, lane_t, scale
        )
        pos += nb - 1
    return acc.reshape(X, Y, Z, T)
