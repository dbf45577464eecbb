"""Double-f32 (compensated) Pallas kernels: float64-class accuracy at
Pallas speed on a TPU with no hardware f64.

Why: the driver target couples throughput and accuracy — ">=100x the MEX
single-core baseline at <=1e-12 max-abs error" (BASELINE.md:19-20). The
XLA direct path in emulated f64 is accurate (7e-14) but measured only
~34 Mvox/s at 128^3 (r5, /tmp/exp_f64_speed) — under the 59.5 Mvox/s
bar. These kernels carry every value as an UNEVALUATED f32 PAIR
(hi + lo, ~47-bit effective mantissa) through the same tiled level
structure as ``pallas_kernels``, using error-free transformations:

* ``two_sum`` (Knuth) for accumulation, ``two_prod`` via Dekker 12/12
  splitting for tap products (every partial product is exact in f32 by
  construction, so Mosaic fusing mul+add into FMA cannot change results);
* taps are split host-side into exact ``(f32(t), f32(t - f32(t)))``
  pairs — the f64 tap enters the kernel losslessly;
* rolls/slices (the data movement) are exact and simply run on both
  planes; the per-level ``1/2^d`` synthesis scale is a power of two and
  multiplies both planes exactly.

Per-op relative error ~2^-47; a 3-level db4 roundtrip measures ~1e-13 —
inside the <=1e-12 contract, at ~10x the f32 kernel's VPU work instead
of the XLA path's interpreter-style emulation.

Layout: a df32 array rides as an extra leading plane axis — inputs
``(2, *shape)``, the multilevel band array ``(B*2, *shape)`` (band b
plane c at index ``2b + c``) — so the existing wrap-segment DMA helper
(``_seg_copies_one`` with ``band_idx``) moves both planes unchanged.
Scope: the plain unsharded 2D/3D tiled path (the accuracy-contract
configs); other ndims/shapes keep the f64 XLA direct path + odd-shape
warning (``plan._warn_f64_odd_on_accel``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import (_dec_halos, _rec_halos, _round8,
                             _seg_copies_one, _tree_reduce)

_BUDGET = 2_300_000  # live f32 words (see pallas_kernels._dec_tiles)


# ---------------------------------------------------------------------------
# Error-free transformations (f32). Order of operations is load-bearing;
# XLA does not reassociate floats and every Dekker partial product is
# exact by construction (12x12-bit), so FMA fusion is harmless.
# ---------------------------------------------------------------------------


def _ob(v):
    """Anti-folding hook. XLA:CPU rewrites EFT chains (measured: a
    jitted constant-tap two_prod+renorm loses its compensation term), so
    the interpret-mode CI checks STRUCTURE at f32 tolerance only — the
    accuracy contract is enforced on hardware (bench gates <=1e-12 every
    run). Mosaic does not lower ``lax.optimization_barrier`` (raises
    NotImplementedError), and hardware Mosaic preserves the EFT without
    it, so this is identity."""
    return v


def _two_sum(a, b):
    s = _ob(a + b)
    bb = _ob(s - a)
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_renorm(s, e):
    hi = _ob(s + e)
    lo = e - (hi - s)
    return hi, lo


_SPLIT = np.float32(4097.0)  # 2^12 + 1 (f32 mantissa 24 -> 12 + 12)


def _dekker_split(a):
    c = _ob(a * _SPLIT)
    hi = _ob(c - _ob(c - a))
    return hi, a - hi


def _two_prod(a, b):
    p = _ob(a * b)
    ah, al = _dekker_split(a)
    bh, bl = _dekker_split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


class _D:
    """A double-f32 value (hi + lo) with the operations the shared band
    tree machinery needs (``+`` for the adjoint reduction)."""

    __slots__ = ("hi", "lo")

    def __init__(self, hi, lo):
        self.hi = hi
        self.lo = lo

    def __add__(self, other):
        s, e = _two_sum(self.hi, other.hi)
        return _D(*_quick_renorm(s, e + (self.lo + other.lo)))

    def scale_pow2(self, s):
        return _D(self.hi * s, self.lo * s)

    def astype_planes(self, dtype):
        return self.hi.astype(dtype), self.lo.astype(dtype)


def _mac(acc, v: _D, th, tl):
    """acc += t * v for an f64 tap split; ``th``/``tl`` MUST be traced
    scalars (SMEM reads), never Python/np literals — XLA rewrites EFT
    expressions containing constant operands even past optimization
    barriers (measured: constant-tap two_prod+renorm loses the whole
    compensation term; traced-tap form is exact)."""
    p, e = _two_prod(v.hi, th)
    e = e + (v.hi * tl + v.lo * th)
    if acc is None:
        return _D(*_quick_renorm(p, e))
    s, err = _two_sum(acc.hi, p)
    return _D(*_quick_renorm(s, acc.lo + (err + e)))


def _tap_split(taps_np):
    """(2, K) f64 -> (hi, lo) f32 numpy pairs, exact."""
    hi = taps_np.astype(np.float32)
    lo = (taps_np - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


# ---------------------------------------------------------------------------
# Tile feasibility (the f32 models with doubled value liveness)
# ---------------------------------------------------------------------------


def _df_dec_tiles(shape, taps_np):
    ndim = len(shape)
    if shape[-1] % 128:
        return None
    z = shape[-1]
    if ndim == 2:
        K0 = taps_np[0].shape[1]
        for tx in (128, 64, 32, 16, 8):
            if shape[0] % tx == 0:
                ex0 = tx + 2 * _round8(K0 // 2)
                live = 2 * (ex0 * z + 8 * tx * z) + 6 * tx * z
                if live <= _BUDGET:
                    return (tx,)
        return None
    if ndim != 3:
        return None
    for tx, ty in ((16, 16), (8, 16), (8, 8)):
        if shape[0] % tx == 0 and shape[1] % ty == 0:
            K0, K1 = taps_np[0].shape[1], taps_np[1].shape[1]
            ex0 = tx + K0 - 1
            ex1 = ty + 2 * _round8(K1 // 2)
            live = 2 * (ex0 * ex1 * z + 2 * tx * ex1 * z + 12 * tx * ty * z)
            live += 6 * tx * ty * z  # EFT temporaries
            if live <= _BUDGET:
                return (tx, ty)
    return None


def _df_rec_tiles(shape, taps_np):
    ndim = len(shape)
    if shape[-1] % 128:
        return None
    z = shape[-1]
    if ndim == 2:
        K0 = taps_np[0].shape[1]
        for tx in (256, 128, 64, 32, 16):
            if shape[0] % tx == 0:
                ex0 = tx + 2 * _round8(max(K0 // 2, K0 // 2 - 1))
                live = 2 * (4 * ex0 * z + 3 * tx * z) + 6 * tx * z
                if live <= _BUDGET:
                    return (tx,)
        return None
    if ndim != 3:
        return None
    for tx, ty in ((16, 16), (8, 16), (8, 8)):
        if shape[0] % tx == 0 and shape[1] % ty == 0:
            K0, K1 = taps_np[0].shape[1], taps_np[1].shape[1]
            ex0 = tx + K0 - 1
            ex1 = ty + 2 * _round8(K1 // 2)
            live = 2 * (4 * ex0 * ex1 * z + 4 * tx * ty * z)
            live += 6 * tx * ty * z
            if live <= _BUDGET:
                return (tx, ty)
    return None


def supported(shape, taps_np) -> bool:
    return (
        len(shape) in (2, 3)
        and _df_dec_tiles(shape, taps_np) is not None
        and _df_rec_tiles(shape, taps_np) is not None
    )


# ---------------------------------------------------------------------------
# Analysis
# ---------------------------------------------------------------------------


def _dec_tile_compute_df(bufs, taps_refs, taps_pairs, ndim, tiles, halos):
    """All 2^d analysis band values of one halo'd df32 tile (mirror of
    ``pallas_kernels._dec_tile_compute`` over _D values). ``taps_refs``
    is a flat list of SMEM refs (hi, lo per axis) — see ``_mac`` on why
    taps must be traced."""
    vals = [_D(bufs[np.int32(0)], bufs[np.int32(1)])]
    # Sublane surplus pre-trim (see _dec_tile_compute).
    trim = [slice(None)] * ndim
    eff_wl = []
    trimmed = False
    for ax in range(ndim - 1):
        w_l, w_r, aligned = halos[ax]
        K = taps_pairs[ax][0].shape[1]
        h_l, h_r = K // 2 - 1, K // 2
        if aligned and (w_l > h_l or w_r > h_r):
            trim[ax] = slice(w_l - h_l, w_l + tiles[ax] + h_r)
            eff_wl.append(h_l)
            trimmed = True
        else:
            eff_wl.append(w_l)
    if trimmed:
        t = tuple(trim)
        vals = [_D(vals[0].hi[t], vals[0].lo[t])]
    for ax in range(ndim):
        K = taps_pairs[ax][0].shape[1]
        th_ref, tl_ref = taps_refs[2 * ax], taps_refs[2 * ax + 1]
        o = K // 2 - 1
        use_roll = ax == ndim - 1
        new_lo, new_hi = [], []
        for v in vals:
            if use_roll:
                acc_l = acc_h = None
                for j in range(K):
                    shift = (o - j) % v.hi.shape[-1]
                    if shift:
                        r = _D(
                            pltpu.roll(v.hi, np.int32(shift), axis=v.hi.ndim - 1),
                            pltpu.roll(v.lo, np.int32(shift), axis=v.lo.ndim - 1),
                        )
                    else:
                        r = v
                    acc_l = _mac(acc_l, r, th_ref[0, j], tl_ref[0, j])
                    acc_h = _mac(acc_h, r, th_ref[1, j], tl_ref[1, j])
            else:
                start0 = eff_wl[ax] - (K // 2 - 1)
                acc_l = acc_h = None
                for j in range(K):
                    idx = [slice(None)] * ndim
                    idx[ax] = slice(start0 + j, start0 + j + tiles[ax])
                    idx = tuple(idx)
                    r = _D(v.hi[idx], v.lo[idx])
                    acc_l = _mac(acc_l, r, th_ref[0, j], tl_ref[0, j])
                    acc_h = _mac(acc_h, r, th_ref[1, j], tl_ref[1, j])
            new_lo.append(acc_l)
            new_hi.append(acc_h)
        vals = new_lo + new_hi
    return vals


def _make_dec_kernel_df(ndim, tiles, shape_sp, taps_pairs, band_off, final):
    nb = 2**ndim
    n_lead = ndim - 1
    halos = _dec_halos(ndim, tuple(tp[0] for tp in taps_pairs))

    def kernel(x_hbm, *rest):
        taps_refs = rest[: 2 * ndim]
        big_in, big_ref = rest[2 * ndim], rest[2 * ndim + 1]
        rest = rest[2 * ndim + 2 :]
        del big_in
        if final:
            app_ref = None
            buf, stage, sem, sem_out = rest
        else:
            app_ref = rest[0]
            buf, stage, sem, sem_out = rest[1:]
        grid_ids = [pl.program_id(ax) for ax in range(n_lead)]
        copies = []
        for c in range(2):
            copies += _seg_copies_one(
                x_hbm, buf, sem, shape_sp, tiles, halos, grid_ids,
                band_idx=c, slot=c,
            )
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

        vals = _dec_tile_compute_df(buf, taps_refs, taps_pairs, ndim,
                                    tiles, halos)

        sp_idx = tuple(
            pl.ds(grid_ids[ax] * np.int32(tiles[ax]), tiles[ax])
            for ax in range(n_lead)
        ) + (slice(None),)
        inflight = [None, None]
        slot = 0
        for b in range(nb):
            hi, lo = vals[b].astype_planes(stage.dtype)
            if b == 0 and not final:
                app_ref[np.int32(0)] = hi
                app_ref[np.int32(1)] = lo
                continue
            for c, plane in enumerate((hi, lo)):
                if inflight[slot] is not None:
                    inflight[slot].wait()
                stage[np.int32(slot)] = plane
                out_band = c if b == 0 else 2 * (band_off + b - 1) + c
                cp = pltpu.make_async_copy(
                    stage.at[np.int32(slot)],
                    big_ref.at[(np.int32(out_band),) + sp_idx],
                    sem_out.at[np.int32(slot)],
                )
                cp.start()
                inflight[slot] = cp
                slot ^= 1
        for cp in inflight:
            if cp is not None:
                cp.wait()

    return kernel


def _dec_level_df(x2, big, band_off, taps_pairs, taps_np, final):
    shape = x2.shape[1:]
    ndim = len(shape)
    tiles = _df_dec_tiles(shape, taps_np)
    n_lead = ndim - 1
    halos = _dec_halos(ndim, taps_np)
    grid = tuple(shape[ax] // tiles[ax] for ax in range(n_lead))
    buf_tile = tuple(
        tiles[ax] + halos[ax][0] + halos[ax][1] for ax in range(n_lead)
    ) + (shape[-1],)
    scratch = [
        pltpu.VMEM((2,) + buf_tile, jnp.float32),
        pltpu.VMEM((2,) + tuple(tiles) + (shape[-1],), jnp.float32),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA((2,)),
    ]
    B2 = big.shape[0]
    if final:
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
        out_shape = jax.ShapeDtypeStruct((B2,) + shape, jnp.float32)
    else:
        out_specs = (
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (2,) + tuple(tiles) + (shape[-1],),
                lambda *gi: (np.int32(0),) + gi + (np.int32(0),),
                memory_space=pltpu.VMEM,
            ),
        )
        out_shape = (
            jax.ShapeDtypeStruct((B2,) + shape, jnp.float32),
            jax.ShapeDtypeStruct((2,) + shape, jnp.float32),
        )
    taps_ops = []
    for hi, lo in taps_pairs:
        taps_ops += [jnp.asarray(hi), jnp.asarray(lo)]
    smem_spec = lambda shp: pl.BlockSpec(
        shp, lambda *gi: tuple(np.int32(0) for _ in shp),
        memory_space=pltpu.SMEM,
    )
    return pl.pallas_call(
        _make_dec_kernel_df(ndim, tiles, shape, taps_pairs, band_off, final),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [smem_spec(t.shape) for t in taps_ops]
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={1 + len(taps_ops): 0},
        scratch_shapes=scratch,
    )(x2, *taps_ops, big)


# ---------------------------------------------------------------------------
# Synthesis (streaming tree adjoint over _D values)
# ---------------------------------------------------------------------------


def _make_rec_kernel_df(ndim, tiles, shape_sp, taps_pairs, band_src, scale):
    nb = 2**ndim
    n_lead = ndim - 1
    NSLOT = 2
    halos = _rec_halos(ndim, tuple(tp[0] for tp in taps_pairs))
    has_approx = any(kind == "a" for kind, _ in band_src)

    # pre-trim bookkeeping (mirror of _stream_band_tree)
    trim = [slice(None)] * ndim
    eff_wl = []
    trimmed = False
    for ax in range(ndim - 1):
        w_l, w_r, aligned = halos[ax]
        K = taps_pairs[ax][0].shape[1]
        h_l, h_r = K // 2, K // 2 - 1
        if aligned and (w_l > h_l or w_r > h_r):
            trim[ax] = slice(w_l - h_l, w_l + tiles[ax] + h_r)
            eff_wl.append(h_l)
            trimmed = True
        else:
            eff_wl.append(w_l)
    trim = tuple(trim)

    def kernel(*args):
        args = list(args)
        y_hbm = args.pop(0)
        a_hbm = args.pop(0) if has_approx else None
        taps_refs = [args.pop(0) for _ in range(2 * ndim)]
        out_ref = args.pop(0)
        bufs, sems = args
        grid_ids = [pl.program_id(ax) for ax in range(n_lead)]

        def seg_copies(b, slot):
            # bufs is flattened (NSLOT*2, ...): plane c of ring slot s
            # lives at 2s + c (slot and c are Python ints here).
            kind, idx = band_src[b]
            src = a_hbm if kind == "a" else y_hbm
            cps = []
            for c in range(2):
                bi = c if kind == "a" else 2 * idx + c
                cps += _seg_copies_one(
                    src, bufs, sems.at[np.int32(slot)], shape_sp, tiles,
                    halos, grid_ids, band_idx=bi, slot=2 * slot + c,
                )
            return cps

        def axis_pass(v: _D, ax, sel):
            th_ref, tl_ref = taps_refs[2 * ax], taps_refs[2 * ax + 1]
            K = taps_pairs[ax][0].shape[1]
            o_adj = K // 2
            acc = None
            for j in range(K):
                if ax == ndim - 1:
                    shift = (o_adj - j) % v.hi.shape[-1]
                    if shift:
                        r = _D(
                            pltpu.roll(v.hi, np.int32(shift), axis=v.hi.ndim - 1),
                            pltpu.roll(v.lo, np.int32(shift), axis=v.lo.ndim - 1),
                        )
                    else:
                        r = v
                else:
                    h_l = K // 2
                    start = eff_wl[ax] - h_l + j
                    idx2 = [slice(None)] * ndim
                    idx2[ax] = slice(start, start + tiles[ax])
                    idx2 = tuple(idx2)
                    r = _D(v.hi[idx2], v.lo[idx2])
                # reversed taps at the mirrored anchor (adjoint)
                acc = _mac(acc, r, th_ref[np.int32(sel), np.int32(K - 1 - j)],
                           tl_ref[np.int32(sel), np.int32(K - 1 - j)])
            return acc

        for pre in range(min(NSLOT - 1, nb)):
            for cp in seg_copies(pre, pre % NSLOT):
                cp.start()

        def first_pass(b):
            slot = b % NSLOT
            nxt = b + NSLOT - 1
            if nxt < nb:
                for cp in seg_copies(nxt, nxt % NSLOT):
                    cp.start()
            for cp in seg_copies(b, slot):
                cp.wait()
            v = _D(bufs[np.int32(2 * slot)], bufs[np.int32(2 * slot + 1)])
            if trimmed:
                v = _D(v.hi[trim], v.lo[trim])
            return axis_pass(v, 0, b & 1)

        acc = _tree_reduce(
            nb, ndim, first_pass,
            lambda v, d, b: axis_pass(v, d, (b >> d) & 1),
        )
        if scale != 1.0:
            acc = acc.scale_pow2(np.float32(scale))
        out_ref[np.int32(0)] = acc.hi.astype(out_ref.dtype)
        out_ref[np.int32(1)] = acc.lo.astype(out_ref.dtype)

    return kernel


def _rec_level_df(y2, approx2, band_src, taps_pairs, taps_np, scale):
    shape = y2.shape[1:]
    ndim = len(shape)
    tiles = _df_rec_tiles(shape, taps_np)
    n_lead = ndim - 1
    grid = tuple(shape[ax] // tiles[ax] for ax in range(n_lead))
    halos = _rec_halos(ndim, taps_np)
    buf_rows = [
        tiles[ax] + halos[ax][0] + halos[ax][1] for ax in range(n_lead)
    ]
    operands = (y2,) if approx2 is None else (y2, approx2)
    taps_ops = []
    for hi, lo in taps_pairs:
        taps_ops += [jnp.asarray(hi), jnp.asarray(lo)]
    smem_spec = lambda shp: pl.BlockSpec(
        shp, lambda *gi: tuple(np.int32(0) for _ in shp),
        memory_space=pltpu.SMEM,
    )
    return pl.pallas_call(
        _make_rec_kernel_df(ndim, tiles, shape, taps_pairs, band_src, scale),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(operands)
        + [smem_spec(t.shape) for t in taps_ops],
        out_specs=pl.BlockSpec(
            (2,) + tuple(tiles) + (shape[-1],),
            lambda *gi: (np.int32(0),) + gi + (np.int32(0),),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2,) + shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4,) + tuple(buf_rows) + (shape[-1],), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(*operands, *taps_ops)


# ---------------------------------------------------------------------------
# f64 entry points (split / join at the boundary)
# ---------------------------------------------------------------------------


def _split_f64(x):
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return jnp.stack([hi, lo])


def _join_f64(planes, axis=0):
    hi, lo = jnp.split(planes, 2, axis=axis)
    return jnp.squeeze(hi, axis).astype(jnp.float64) + jnp.squeeze(
        lo, axis
    ).astype(jnp.float64)


def dec64(x, taps, level: int):
    """f64 multilevel analysis via compensated df32 kernels:
    (shape) f64 -> (B, *shape) f64, ~1e-13-class accuracy.

    Differentiable via ``linear_call`` (the exact adjoint is the
    tight-frame synthesis — same rule as ``pallas_kernels.dec_pallas``)."""
    from jax.custom_derivatives import linear_call

    taps_t = taps
    return linear_call(
        lambda _, v: _dec64_impl(v, taps_t, level),
        lambda _, ybar: _rec64_impl(ybar, taps_t, level, True),
        (), jnp.asarray(x, jnp.float64),
    )


def _dec64_impl(x, taps, level: int):
    taps_np = tuple(np.asarray(t, np.float64) for t in taps)
    taps_pairs = tuple(_tap_split(t) for t in taps_np)
    shape = x.shape
    ndim = len(shape)
    nb = 2**ndim
    B = nb + (nb - 1) * (level - 1)
    big = jnp.empty((2 * B,) + shape, jnp.float32)
    approx = _split_f64(jnp.asarray(x, jnp.float64))
    off = B
    for lvl in range(level):
        off -= nb - 1
        final = lvl == level - 1
        out = _dec_level_df(approx, big, off, taps_pairs, taps_np, final)
        if final:
            big = out
        else:
            big, approx = out
    y2 = big.reshape((B, 2) + shape)
    return _join_f64(y2, axis=1)


def rec64(y, taps, level: int, preserve_l2: bool):
    """f64 multilevel synthesis; (B, *shape) f64 -> (shape) f64.
    Differentiable via ``linear_call`` (transpose = the analysis cascade
    with the per-level 1/2^d redistributed onto the band groups when not
    ``preserve_l2`` — same rule as ``pallas_kernels.rec_pallas``)."""
    from jax.custom_derivatives import linear_call

    from .pallas_kernels import _rec_transpose_scales

    taps_t = taps
    ndim = y.ndim - 1

    def trans(_, xbar):
        z = _dec64_impl(xbar, taps_t, level)
        if not preserve_l2:
            sc = jnp.asarray(
                _rec_transpose_scales(ndim, level, np.float64)
            )
            z = z * sc.reshape((-1,) + (1,) * ndim)
        return z

    return linear_call(
        lambda _, v: _rec64_impl(v, taps_t, level, preserve_l2),
        trans, (), jnp.asarray(y, jnp.float64),
    )


def _rec64_impl(y, taps, level: int, preserve_l2: bool):
    taps_np = tuple(np.asarray(t, np.float64) for t in taps)
    taps_pairs = tuple(_tap_split(t) for t in taps_np)
    shape = y.shape[1:]
    ndim = len(shape)
    nb = 2**ndim
    B = y.shape[0]
    scale = 1.0 if preserve_l2 else 1.0 / nb
    y64 = jnp.asarray(y, jnp.float64)
    hi = y64.astype(jnp.float32)
    lo = (y64 - hi.astype(jnp.float64)).astype(jnp.float32)
    y2 = jnp.stack([hi, lo], axis=1).reshape((2 * B,) + shape)
    band_src = [("y", b) for b in range(nb)]
    acc = _rec_level_df(y2, None, band_src, taps_pairs, taps_np, scale)
    pos = nb
    for _ in range(1, level):
        band_src = [("a", 0)] + [("y", pos + b - 1) for b in range(1, nb)]
        acc = _rec_level_df(y2, acc, band_src, taps_pairs, taps_np, scale)
        pos += nb - 1
    return _join_f64(acc, axis=0)
