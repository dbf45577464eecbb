"""Row-grid Pallas kernels for ARBITRARY-shape mid-size arrays.

Why this exists: the natural-layout tiled kernels (``pallas_kernels.py``)
require the lane dimension to be a multiple of 128 and the leading extents
to be divisible by an 8-aligned tile; the flat resident kernels
(``pallas_flat.py``) take any shape but only up to ~200K padded words of
whole-array VMEM residency. Mid-size odd shapes — including the
reference's own test configs ``[164,64,40]``
(``/root/reference/Test/nddwt3D_test.m:5``) and ``[64,64,20,10]``
(``/root/reference/Test/nddwt4D_test.m:5``) — were served by NEITHER and
silently fell to the XLA direct path, which on the available TPU backend
is a documented worker-wedging hazard for odd shapes (VERDICT r4 item 1).

Design — a hybrid of the two existing families:

* **Trailing axes flat in lanes** (the ``pallas_flat`` idea, per row): the
  trailing ``shape[1:]`` space of ``M`` elements is padded to
  ``M_pad = roundup(M, 1024)`` and viewed as ``S = M_pad/128`` sublanes of
  128 lanes. Circular shifts along any trailing axis are *blocked* flat
  rotates — lane rotate + sublane rotate pairs selected by block masks —
  applied uniformly across all rows in VMEM (``_blocked_rot``). End-of-row
  padding never contaminates valid outputs: every valid position selects a
  valid source (the ``pallas_flat`` masked-pair argument).
* **Leading axis gridded** (the ``pallas_kernels`` idea): axis 0 is tiled
  with L/C/R wrap-segment DMAs and exact halos; correlation along it is
  static row slices. The key alignment trick: because ``8 | S``, every
  sublane DMA start/extent (``row * S`` / ``nrows * S``) is automatically
  a multiple of 8 for ANY row index — the empirical v5e constraint
  ("non-8-multiple sublane extents crash the worker", CLAUDE.md) is
  satisfied with NO divisibility requirement on ``shape[0]``.
* **Ragged grids via a static base table**: tile bases live in SMEM
  (``bases_ref[i]``), computed host-side so the tail tile overlaps its
  neighbor (overlap-recompute — duplicate writes carry identical values
  on the sequential TPU grid) and so that no wrap segment ever straddles
  row ``N0`` (``_bases``: every base is 0 or >= h_l, and every tile end
  is N0 or <= N0 - h_r — straddling segments would need dynamic extents,
  which DMAs cannot express).

Band order, scaling, anchors and the tree-factored band expansion /
adjoint reduction are shared with the other kernel families
(``_tree_expand`` / ``_tree_reduce`` from ``pallas_kernels``), so the
engine band contract (``Functions/nd_dwt_3D.m:334-341``) is identical.

Used by ``pallas_kernels.dec_pallas``/``rec_pallas`` dispatch when
:func:`supported` holds (after flat/tiled/resident/4D decline).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _compute_dtype, _tree_reduce, _up

# Live-VMEM budget in f32 words (Mosaic's scoped accounting is ~2.4x a
# naive stage-sum; calibrated in pallas_kernels._dec_tiles).
_BUDGET = 2_400_000


def _padded_flat(M: int) -> int:
    """Trailing-flat padding: S = M_pad/128 must be a multiple of 8 so
    that row-granularity sublane DMA offsets are always 8-aligned."""
    return -(-M // 1024) * 1024


def _strides(shape):
    s = [1] * len(shape)
    for ax in range(len(shape) - 2, -1, -1):
        s[ax] = s[ax + 1] * shape[ax + 1]
    return tuple(s)


def _bases(N0: int, t: int, h_l: int, h_r: int):
    """Static tile bases covering [0, N0) with tail overlap-recompute,
    chosen so no wrap segment straddles row N0: every base ``b`` is 0 or
    in [h_l, N0 - t], and ``b + t`` is N0 or <= N0 - h_r. Returns None
    when no such cover exists for this tile size."""
    if t >= N0:
        return [0] if t == N0 else None
    if h_l > t or h_r > t:
        return None
    if t + h_r > N0:
        # even the first tile's right halo would straddle row N0; only
        # the single-tile cover works at this N0
        return None
    bases = [0]
    b = t
    while b + t <= N0 - h_r:
        bases.append(b)
        b += t
    L = bases[-1] + t
    if L == N0:
        return bases
    tail = N0 - t
    if tail < max(h_l, 1):
        return None
    if L < tail:
        mid = N0 - 2 * t
        if mid < h_l or mid > L:
            return None
        bases.append(mid)
    bases.append(tail)
    return bases


def _halos(K: int, adjoint: bool):
    """Exact leading-axis halos (no 8-rounding needed: the S granularity
    aligns every row offset)."""
    return (K // 2, K // 2 - 1) if adjoint else (K // 2 - 1, K // 2)


def _live_model(t, S, K0, ndim):
    """Live f32 words: 2 halo'd row buffers + tree intermediates + the
    ~12-deep blocked-rotate temp chain + 2 stage slots, all at S*128
    words per row."""
    row = S * 128
    return (2 * (t + K0 - 1) + (ndim + 14) * t) * row


def _pick_tile(shape, taps_np, adjoint: bool):
    """(t, bases, S) or None."""
    N0 = shape[0]
    M = int(np.prod(shape[1:]))
    M_pad = _padded_flat(M)
    S = M_pad // 128
    K0 = taps_np[0].shape[1]
    h_l, h_r = _halos(K0, adjoint)
    ndim = len(shape)
    cands = [32, 16, 8, 4]
    # tiles must be able to carry the halo; small N0 falls to one tile
    cands = [c for c in cands if c >= max(h_l, h_r)] + [N0]
    for t in cands:
        if _live_model(t, S, K0, ndim) > _BUDGET:
            continue
        bs = _bases(N0, min(t, N0), h_l, h_r)
        if bs is not None:
            return min(t, N0), bs, S
    return None


def supported(shape, dtype, taps_np) -> bool:
    if len(shape) < 2:
        return False
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    return (
        _pick_tile(shape, taps_np, adjoint=False) is not None
        and _pick_tile(shape, taps_np, adjoint=True) is not None
    )


# ---------------------------------------------------------------------------
# Blocked flat rotates (the compute core)
# ---------------------------------------------------------------------------


def _blocked_rot(v, s, S, sub_mod, lane_idx):
    """Per-row-block flat rotate: within each S-sublane block of ``v``
    (shape (R*S, 128)), ``out[n] = v[(n - s) mod (S*128)]`` where ``n`` is
    the in-block row-major flat index. ``s`` is a traced i32 in
    [0, S*128). 1 lane rotate + 4 sublane rotates + 3 selects; the global
    sublane rotates are corrected back into blocks by the
    ``sub_mod < q`` masks (positions that crossed a block boundary take
    the rotate shifted one block back)."""
    TOT = v.shape[0]
    r = jax.lax.rem(s, np.int32(128))
    q = jax.lax.div(s, np.int32(128))
    lr = pltpu.roll(v, r, axis=1)
    a = pltpu.roll(lr, q, axis=0)
    c = pltpu.roll(lr, q + np.int32(TOT - S), axis=0)
    main = jnp.where(sub_mod < q, c, a)
    q1 = q + np.int32(1)
    b = pltpu.roll(lr, jax.lax.rem(q1, np.int32(TOT)), axis=0)
    d = pltpu.roll(
        lr, jax.lax.rem(q1 + np.int32(TOT - S), np.int32(TOT)), axis=0
    )
    wrapped = jnp.where(sub_mod < q1, d, b)
    return jnp.where(lane_idx < r, wrapped, main)


def _axis_shift(v, s, N, St, S, flat_mod_ax, sub_mod, lane_idx):
    """Circular shift by ``s`` (traced, in [0, N)) along the trailing
    spatial axis with extent ``N`` and in-row flat stride ``St``."""
    M_pad = S * 128
    sS = s * np.int32(St)
    if N * St == M_pad:
        # The axis span fills the whole (unpadded) block: one full
        # blocked rotate IS the circular shift.
        return _blocked_rot(v, sS, S, sub_mod, lane_idx)
    main = _blocked_rot(v, sS, S, sub_mod, lane_idx)
    wrap = _blocked_rot(
        v,
        jax.lax.rem(sS + np.int32(M_pad - N * St), np.int32(M_pad)),
        S, sub_mod, lane_idx,
    )
    return jnp.where(flat_mod_ax < sS, wrap, main)


def _corr_trailing(v, taps_ref, sel, N, St, S, flat_mod_ax, sub_mod,
                   lane_idx, o, reverse):
    """K-tap circular correlation along one trailing axis, as an i32
    while_loop (one rotate chain live at a time — an unrolled chain keeps
    every rotate output on Mosaic's scoped stack, the ``pallas_resident``
    lesson).

    ``reverse=False``: y[n] = sum_j t[j] v[n + j - o] (shift by o - j).
    ``reverse=True``: adjoint — reversed taps at the mirrored anchor."""
    K = taps_ref.shape[1]
    anchor = (K - 1 - o) if reverse else o

    def cond(carry):
        return carry[0] < np.int32(K)

    def body(carry):
        j, acc = carry
        s = jax.lax.rem(np.int32(anchor) - j + np.int32(16 * N),
                        np.int32(N))
        r = _axis_shift(v, s, N, St, S, flat_mod_ax, sub_mod, lane_idx)
        tap_idx = (np.int32(K - 1) - j) if reverse else j
        tp = taps_ref[np.int32(sel), tap_idx]
        return (j + np.int32(1), acc + tp * r)

    j0 = jnp.asarray(0, jnp.int32)
    return jax.lax.while_loop(cond, body, (j0, jnp.zeros_like(v)))[1]


def _corr_trailing_pair(v, taps_ref, N, St, S, flat_mod_ax, sub_mod,
                        lane_idx, o):
    """(lo, hi) analysis correlation pair along one trailing axis, both
    filter rows sharing every (expensive) blocked rotate — the rotates
    are ~10 vector ops each, so sharing them across the pair halves the
    dec kernels' dominant cost (the ``pallas_kernels._pass_pair`` /
    ``pallas_4d._lane_pair`` trick, applied to the ragged rotates)."""
    K = taps_ref.shape[1]

    def cond(carry):
        return carry[0] < np.int32(K)

    def body(carry):
        j, alo, ahi = carry
        s = jax.lax.rem(np.int32(o) - j + np.int32(16 * N), np.int32(N))
        r = _axis_shift(v, s, N, St, S, flat_mod_ax, sub_mod, lane_idx)
        return (
            j + np.int32(1),
            alo + taps_ref[np.int32(0), j] * r,
            ahi + taps_ref[np.int32(1), j] * r,
        )

    j0 = jnp.asarray(0, jnp.int32)
    z = jnp.zeros_like(v)
    _, lo, hi = jax.lax.while_loop(cond, body, (j0, z, z))
    return lo, hi


def _masks(t, S, shape, strides):
    """(sub_mod, lane_idx, flat_mod per trailing axis) for (t*S, 128)
    values."""
    vshape = (t * S, 128)
    sub = jax.lax.broadcasted_iota(jnp.int32, vshape, 0)
    sub_mod = jax.lax.rem(sub, np.int32(S))
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, vshape, 1)
    flat = sub_mod * np.int32(128) + lane_idx
    flat_mods = []
    for ax in range(1, len(shape)):
        span = shape[ax] * strides[ax]
        flat_mods.append(jax.lax.rem(flat, np.int32(span)))
    return sub_mod, lane_idx, flat_mods


def _row_segs(base, t, N0, h_l, h_r):
    """(src_row, dst_row, nrows) L/C/R wrap segments for one halo'd row
    tile. The base table guarantees none straddles row N0."""
    segs = []
    if h_l:
        sL = jax.lax.rem(base + np.int32(N0 - h_l), np.int32(N0))
        segs.append((sL, 0, h_l))
    segs.append((base, h_l, t))
    if h_r:
        sR = jax.lax.rem(base + np.int32(t), np.int32(N0))
        segs.append((sR, h_l + t, h_r))
    return segs


def _seg_copy(src_ref, dst_ref, sem, src_row, dst_row, nrows, S,
              band=None, slot=None):
    """One row-segment DMA in lifted units; all sublane offsets are
    ``row * S`` with ``8 | S`` — aligned for any row."""
    s0 = pl.multiple_of(src_row * np.int32(S), 8)
    src = (pl.ds(s0, nrows * S), slice(None))
    if band is not None:
        src = (band,) + src
    dst = (pl.ds(np.int32(dst_row * S), nrows * S), slice(None))
    if slot is not None:
        dst = (np.int32(slot),) + dst
    return pltpu.make_async_copy(src_ref.at[src], dst_ref.at[dst], sem)


def _row_slice(v, j, t, S):
    """Rows [j, j+t) of a lifted value (static j)."""
    return v[j * S : (j + t) * S, :]


# ---------------------------------------------------------------------------
# Analysis
# ---------------------------------------------------------------------------


def _make_dec_kernel(shape, S, t, taps_np_tuple, band_off, final, lam,
                     nb, strides):
    ndim = len(shape)
    N0 = shape[0]
    K0 = taps_np_tuple[0].shape[1]
    h_l, h_r = _halos(K0, adjoint=False)
    t0 = taps_np_tuple[0]

    def kernel(x_hbm, *rest):
        taps_refs = rest[: ndim - 1]
        bases_ref = rest[ndim - 1]
        big_in, big_ref = rest[ndim], rest[ndim + 1]
        del big_in  # aliased to big_ref
        if final:
            app_ref = None
            buf, stage, sem_in, sem_out = rest[ndim + 2 :]
        else:
            app_ref = rest[ndim + 2]
            buf, stage, sem_in, sem_out = rest[ndim + 3 :]
        i = pl.program_id(0)
        base = bases_ref[i]
        bS = pl.multiple_of(base * np.int32(S), 8)

        copies = [
            _seg_copy(x_hbm, buf, sem_in, sr, dr, nr, S)
            for sr, dr, nr in _row_segs(base, t, N0, h_l, h_r)
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        sub_mod, lane_idx, flat_mods = _masks(t, S, shape, strides)

        def axis_pass_pair(v, ax):
            """(lo, hi) of one tree node — rotates shared by the pair."""
            if ax == 0:
                # leading axis: static halo slices (anchor K//2 - 1 with
                # exact halo h_l = K//2 - 1 -> slice start j); slices are
                # cheap, shared trivially by the two tap rows.
                acc_lo = acc_hi = None
                for j in range(K0):
                    r = _row_slice(v, j, t, S)
                    tl = float(t0[0, j]) * r
                    th = float(t0[1, j]) * r
                    acc_lo = tl if acc_lo is None else acc_lo + tl
                    acc_hi = th if acc_hi is None else acc_hi + th
                return acc_lo, acc_hi
            K = taps_np_tuple[ax].shape[1]
            return _corr_trailing_pair(
                v, taps_refs[ax - 1], shape[ax], strides[ax], S,
                flat_mods[ax - 1], sub_mod, lane_idx, K // 2 - 1,
            )

        inflight = [None, None]
        slot_ctr = [0]

        def emit(b, val):
            if lam and b != 0:
                mag = jnp.abs(val)
                val = val * (
                    jnp.maximum(mag - lam, 0.0) / jnp.maximum(mag, 1e-30)
                )
            slot = slot_ctr[0]
            if inflight[slot] is not None:
                inflight[slot].wait()
            stage[np.int32(slot)] = val.astype(stage.dtype)
            if b == 0:
                if final:
                    dst = big_ref.at[
                        (np.int32(0), pl.ds(bS, t * S), slice(None))
                    ]
                else:
                    dst = app_ref.at[(pl.ds(bS, t * S), slice(None))]
            else:
                dst = big_ref.at[
                    (np.int32(band_off + b - 1), pl.ds(bS, t * S),
                     slice(None))
                ]
            cp = pltpu.make_async_copy(
                stage.at[np.int32(slot)], dst, sem_out.at[np.int32(slot)]
            )
            cp.start()
            inflight[slot] = cp
            slot_ctr[0] ^= 1

        # Depth-first pair tree: each node's (lo, hi) computed together
        # (shared rotates), leaves emitted in bit-reversed band order
        # (writes are independent — order irrelevant, as in _tree_expand).
        def pair_tree(v, ax, b):
            if ax == ndim:
                emit(b, v)
                return
            lo, hi = axis_pass_pair(v, ax)
            pair_tree(lo, ax + 1, b)
            pair_tree(hi, ax + 1, b | (1 << ax))

        pair_tree(_up(buf[...]), 0, 0)
        for cp in inflight:
            if cp is not None:
                cp.wait()

    return kernel


def _dec_level(x_lifted, big, band_off, taps_np, shape, S, t, bases,
               final, lam):
    ndim = len(shape)
    N0 = shape[0]
    K0 = taps_np[0].shape[1]
    strides = _strides(shape)
    tdt = _compute_dtype(x_lifted.dtype)
    taps_ops = [jnp.asarray(taps_np[ax], tdt) for ax in range(1, ndim)]
    bases_op = jnp.asarray(np.asarray(bases, np.int32))
    nb = 2**ndim
    B = big.shape[0]

    smem_spec = lambda shp: pl.BlockSpec(
        shp, lambda i: tuple(np.int32(0) for _ in shp),
        memory_space=pltpu.SMEM,
    )
    in_specs = (
        [pl.BlockSpec(memory_space=pl.ANY)]
        + [smem_spec(tp.shape) for tp in taps_ops]
        + [smem_spec(bases_op.shape)]
        + [pl.BlockSpec(memory_space=pl.ANY)]
    )
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    out_shape = [jax.ShapeDtypeStruct((B, N0 * S, 128), x_lifted.dtype)]
    if not final:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct((N0 * S, 128), x_lifted.dtype)
        )
    h_l, h_r = _halos(K0, adjoint=False)
    scratch = [
        pltpu.VMEM(((t + h_l + h_r) * S, 128), x_lifted.dtype),
        pltpu.VMEM((2, t * S, 128), x_lifted.dtype),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA((2,)),
    ]
    res = pl.pallas_call(
        _make_dec_kernel(shape, S, t, taps_np, band_off, final, lam, nb,
                         strides),
        grid=(len(bases),),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if not final else out_specs[0],
        out_shape=tuple(out_shape) if not final else out_shape[0],
        input_output_aliases={len(in_specs) - 1: 0},
        scratch_shapes=scratch,
    )(x_lifted, *taps_ops, bases_op, big)
    return res


def _lift(x, S):
    """(N0, *rest) -> (N0*S, 128) row-major lifted layout (lane padding at
    each row's end)."""
    N0 = x.shape[0]
    M = int(np.prod(x.shape[1:]))
    flat = x.reshape(N0, M)
    pad = S * 128 - M
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    return flat.reshape(N0 * S, 128)


def _unlift(yl, shape, S):
    """(..., N0*S, 128) -> (..., *shape)."""
    lead = yl.shape[:-2]
    N0 = shape[0]
    M = int(np.prod(shape[1:]))
    flat = yl.reshape(lead + (N0, S * 128))
    if S * 128 != M:
        flat = flat[..., :M]
    return flat.reshape(lead + shape)


def dec_ragged(x, taps_np, level: int, lam: float = 0.0):
    """Multilevel analysis; (shape) -> (B, *shape). One pallas_call per
    level over the ragged row grid; the only XLA data movement is the
    lift (lane pad) and the final unlift slice."""
    shape = x.shape
    ndim = len(shape)
    t, bases, S = _pick_tile(shape, taps_np, adjoint=False)
    nb = 2**ndim
    B = nb + (nb - 1) * (level - 1)
    big = jnp.empty((B, shape[0] * S, 128), x.dtype)
    approx = _lift(x, S)
    off = B
    for lvl in range(level):
        off -= nb - 1
        final = lvl == level - 1
        out = _dec_level(approx, big, off, taps_np, shape, S, t, bases,
                         final, lam)
        if final:
            big = out
        else:
            big, approx = out
    return _unlift(big, shape, S)


# ---------------------------------------------------------------------------
# Synthesis (exact adjoint, streaming bands, concat-free multilevel)
# ---------------------------------------------------------------------------


def _make_rec_kernel(shape, S, t, taps_np_tuple, band_src, scale, strides):
    ndim = len(shape)
    N0 = shape[0]
    nb = 2**ndim
    K0 = taps_np_tuple[0].shape[1]
    h_l, h_r = _halos(K0, adjoint=True)
    t0 = taps_np_tuple[0]
    has_approx = any(kind == "a" for kind, _ in band_src)
    NSLOT = 2

    def kernel(*args):
        args = list(args)
        y_hbm = args.pop(0)
        a_hbm = args.pop(0) if has_approx else None
        taps_refs = args[: ndim - 1]
        bases_ref = args[ndim - 1]
        out_ref = args[ndim]
        bufs, stage, sem_rd, sem_out = args[ndim + 1 :]
        i = pl.program_id(0)
        base = bases_ref[i]
        bS = pl.multiple_of(base * np.int32(S), 8)

        def seg_copies(b, slot):
            kind, idx = band_src[b]
            src = a_hbm if kind == "a" else y_hbm
            band = None if kind == "a" else np.int32(idx)
            return [
                _seg_copy(src, bufs, sem_rd.at[np.int32(slot)], sr, dr,
                          nr, S, band=band, slot=slot)
                for sr, dr, nr in _row_segs(base, t, N0, h_l, h_r)
            ]

        sub_mod, lane_idx, flat_mods = _masks(t, S, shape, strides)

        def lead_adj(v, sel):
            # adjoint leading axis: reversed taps, mirrored anchor; exact
            # halo h_l = K//2 -> slice start j (pallas_kernels
            # _stream_band_tree convention).
            trow = t0[sel][::-1]
            acc = None
            for j in range(K0):
                term = float(trow[j]) * _row_slice(v, j, t, S)
                acc = term if acc is None else acc + term
            return acc

        def trail_adj(v, ax, sel):
            K = taps_np_tuple[ax].shape[1]
            return _corr_trailing(
                v, taps_refs[ax - 1], sel, shape[ax], strides[ax], S,
                flat_mods[ax - 1], sub_mod, lane_idx, K // 2 - 1, True,
            )

        for pre in range(min(NSLOT - 1, nb)):
            for c in seg_copies(pre, pre % NSLOT):
                c.start()

        def first_pass(b):
            slot = b % NSLOT
            nxt = b + NSLOT - 1
            if nxt < nb:
                for c in seg_copies(nxt, nxt % NSLOT):
                    c.start()
            for c in seg_copies(b, slot):
                c.wait()
            return lead_adj(_up(bufs[np.int32(slot)]), b & 1)

        acc = _tree_reduce(
            nb, ndim, first_pass,
            lambda v, d, b: trail_adj(v, d, (b >> d) & 1),
        )
        if scale != 1.0:
            acc = acc * scale
        stage[...] = acc.astype(stage.dtype)
        cp = pltpu.make_async_copy(
            stage, out_ref.at[(pl.ds(bS, t * S), slice(None))], sem_out
        )
        cp.start()
        cp.wait()

    return kernel


def _rec_level(y_lifted, approx, band_src, taps_np, shape, S, t, bases,
               scale):
    ndim = len(shape)
    N0 = shape[0]
    K0 = taps_np[0].shape[1]
    strides = _strides(shape)
    tdt = _compute_dtype(y_lifted.dtype)
    taps_ops = [jnp.asarray(taps_np[ax], tdt) for ax in range(1, ndim)]
    bases_op = jnp.asarray(np.asarray(bases, np.int32))

    smem_spec = lambda shp: pl.BlockSpec(
        shp, lambda i: tuple(np.int32(0) for _ in shp),
        memory_space=pltpu.SMEM,
    )
    operands = [y_lifted]
    if approx is not None:
        operands.append(approx)
    in_specs = (
        [pl.BlockSpec(memory_space=pl.ANY)] * len(operands)
        + [smem_spec(tp.shape) for tp in taps_ops]
        + [smem_spec(bases_op.shape)]
    )
    h_l, h_r = _halos(K0, adjoint=True)
    return pl.pallas_call(
        _make_rec_kernel(shape, S, t, taps_np, band_src, scale, strides),
        grid=(len(bases),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N0 * S, 128), y_lifted.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, (t + h_l + h_r) * S, 128), y_lifted.dtype),
            pltpu.VMEM((t * S, 128), y_lifted.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )(*operands, *taps_ops, bases_op)


def rec_ragged(y, taps_np, level: int, preserve_l2: bool):
    """Multilevel synthesis; (B, *shape) -> (shape). Concat-free: band 0
    of each shallower group streams from the previous level's output
    operand, details from the lifted band array at static offsets."""
    shape = y.shape[1:]
    ndim = len(shape)
    t, bases, S = _pick_tile(shape, taps_np, adjoint=True)
    nb = 2**ndim
    scale = 1.0 if preserve_l2 else 1.0 / nb
    yl = _lift(y.reshape((y.shape[0] * shape[0],) + shape[1:]), S).reshape(
        y.shape[0], shape[0] * S, 128
    )
    band_src = [("y", b) for b in range(nb)]
    acc = _rec_level(yl, None, band_src, taps_np, shape, S, t, bases,
                     scale)
    pos = nb
    for _ in range(1, level):
        band_src = [("a", 0)] + [("y", pos + b - 1) for b in range(1, nb)]
        acc = _rec_level(yl, acc, band_src, taps_np, shape, S, t, bases,
                         scale)
        pos += nb - 1
    return _unlift(acc, shape, S)
