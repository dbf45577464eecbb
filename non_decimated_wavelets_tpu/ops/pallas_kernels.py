"""Fused Pallas TPU kernels for the non-decimated DWT.

The XLA direct path materializes every intermediate of the separable band
cascade: one analysis level of a d-dim transform moves
``sum_k (2^k + 2^{k+1})`` full-size arrays through HBM (21 arrays for 3D).
These kernels fuse a whole level into one ``pallas_call``: each grid step
reads one halo'd input tile into VMEM, runs all d axis passes on-chip, and
writes all ``2^d`` band tiles — HBM traffic drops to the ``1 + 2^d`` arrays
that are mathematically required (the same fusion idea as the reference MEX
core's batched FFTW plan over all subbands, ``mex/nddwt.c:45-47``, executed
in VMEM instead of L2 cache).

Layout strategy:

* the **last** spatial axis stays fully resident per tile and is the TPU
  lane dimension; its periodic wrap is a free lane rotate (``pltpu.roll``);
* **leading** spatial axes load halo'd tiles straight from the unpadded
  array via L/C/R wrap-segment DMAs (no XLA pre-pad); the sublane dimension
  uses 8-aligned segment extents (empirical v5e DMA constraint), outer
  dimensions use exact halos;
* filter taps are baked in as Python floats (plan constants), so the inner
  loops are pure VPU multiply-adds;
* multilevel synthesis is concat-free: each level's kernel streams band 0
  from the previous level's output and detail bands from the original band
  array at static offsets, with the reference's per-level ``1/2^d`` folded
  into the accumulator.

Band-order contract (identical to ``ops/direct_path.py``): engine band index
``b`` has bit ``k`` = high-pass on spatial axis ``k``, bit 0 fastest
(reference order, ``Functions/nd_dwt_3D.m:334-341``). Axes are processed
first->last, so the internal band-list index IS the engine order.

Synthesis is the exact adjoint: correlation with time-reversed taps at the
mirrored anchor (``o' = K-1-o``), accumulated per band (streaming, one band
tile in flight with 3-slot DMA prefetch).

Supported: 2D/3D, float32/bfloat16, last axis a multiple of 128, leading
axes divisible by a feasible tile. The dispatcher (``dec_pallas`` /
``rec_pallas``) falls back to the XLA direct path otherwise, so the plan's
``path='pallas'`` is always safe.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import direct_path


def _round8(n: int) -> int:
    """DMA extents with non-multiple-of-8 sublane counts fault the TPU
    worker (observed empirically on v5e); round halo'd tile extents up."""
    return -(-n // 8) * 8


# Tuning knobs for the per-level dec kernel, swept on hardware by
# scripts/exp_dec_opt.py (read at trace time; defaults = shipped config).
_DEC_TILES_OVERRIDE = None  # e.g. (16, 32): bypass _dec_tiles' search
_DEC_LEVEL_BGROUP = 1  # adjacent detail bands per write DMA (3D per-level)
_DEC_PREFETCH = 2  # cross-grid-step input prefetch DEPTH (slot-ring size;
# 0/False = off). Swept on hardware (scripts/exp_prefetch.py, 256^3 db4
# L3): off 10.22, D2 9.93, D3/D4 10.05 ms — the shallow ring wins; the
# residual dec gap over its VPU+write floor is not read-latency. Gated
# to plain unsharded mode + the VMEM model in _fused_dec_level.
# Interior tiles of a plain (unsharded, unpadded) axis read their whole
# halo'd extent [base-w_l, base+t+w_r) as ONE contiguous DMA instead of
# three wrap segments — only first/last tiles (whose halo actually wraps)
# take the 3-segment form, selected per grid step with _CondCopy (the
# kernels are DMA-count-bound, exp_bf16.py). Applies to every
# _seg_copies_one caller: dec tile reads AND rec streaming band reads.
_FUSE_INTERIOR = False


def _as_i32(v):
    """np.int32 for Python ints (Mosaic rejects i64 literals under x64);
    traced values pass through (already i32 from program_id arithmetic)."""
    return np.int32(v) if isinstance(v, (int, np.integer)) else v


def _supported(shape, dtype):
    return (
        len(shape) in (2, 3)
        and jnp.dtype(dtype) in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))
    )


def _up(v):
    """In-kernel compute dtype: Mosaic cannot rotate non-32-bit vectors
    ("Rotate with non-32-bit data", observed on v5e), so bf16 tiles are
    upcast to f32 for the roll/accumulate chains. DMA buffers and band
    outputs stay bf16 — the HBM traffic (the bottleneck) is still halved —
    and the K-tap accumulation gains f32 precision for free."""
    return v.astype(jnp.float32) if v.dtype == jnp.dtype(jnp.bfloat16) else v


def _compute_dtype(dtype):
    """Dtype for in-kernel tap operands / accumulators: f32 for bf16 arrays
    (pairs with :func:`_up`), the array dtype otherwise."""
    return (
        jnp.float32 if jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16)
        else dtype
    )


def _lane_roll_logical(v, s, N):
    """Circular roll by ``s`` over the LOGICAL lane extent ``N`` of a
    lane-padded buffer (physical lanes ``v.shape[-1] > N``): masked
    double-rotate (the ``pallas_4d._roll_t_static`` pattern) — lanes that
    crossed the logical boundary take the rotate shifted one period back.
    Lanes >= N carry garbage in and out (discarded at the unpad slice).
    This is what lets the tiled kernels serve odd last-axis extents in
    the padded big-odd mode (``ops/pallas_padded.py``)."""
    if s == 0:
        return v
    Np = v.shape[-1]
    r1 = pltpu.roll(v, np.int32(s), axis=v.ndim - 1)
    r2 = pltpu.roll(v, np.int32((s - N) % Np), axis=v.ndim - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    return jnp.where(lane < np.int32(s), r2, r1)


def _pass_pair(v, taps_np, axis, o, use_roll, out_extent,
               lane_logical=None):
    """(lo, hi) correlation pair along ``axis`` of one in-VMEM array.

    ``use_roll``: periodic wrap via lane rotate (resident last axis);
    otherwise static halo slices (leading axes, input pre-padded).
    ``lane_logical``: logical lane extent for lane-padded buffers (the
    roll wraps at this extent, not the physical width).
    """
    K = taps_np.shape[1]
    acc_lo = None
    acc_hi = None
    for j in range(K):
        if use_roll:
            N = lane_logical or v.shape[axis]
            shift = (o - j) % N
            if lane_logical:
                r = _lane_roll_logical(v, shift, N)
            else:
                # np.int32: under jax_enable_x64 a Python int lowers to
                # i64, which tpu.dynamic_rotate rejects.
                r = pltpu.roll(v, np.int32(shift), axis=axis) if shift else v
        else:
            idx = [slice(None)] * v.ndim
            idx[axis] = slice(j, j + out_extent)
            r = v[tuple(idx)]
        tl = float(taps_np[0, j]) * r
        th = float(taps_np[1, j]) * r
        acc_lo = tl if acc_lo is None else acc_lo + tl
        acc_hi = th if acc_hi is None else acc_hi + th
    return acc_lo, acc_hi


# ---------------------------------------------------------------------------
# Analysis
# ---------------------------------------------------------------------------


def _dec_halos(ndim, taps_np_tuple):
    """(w_l, w_r, aligned) per leading axis for the analysis anchor
    (o = K//2 - 1 left, K//2 right); only the sublane axis needs 8-aligned
    DMA extents (probed on v5e)."""
    n_lead = ndim - 1
    halos = []
    for ax in range(n_lead):
        K = taps_np_tuple[ax].shape[1]
        h_l, h_r = K // 2 - 1, K // 2
        if ax == n_lead - 1:
            W = _round8(max(h_l, h_r))
            halos.append((W, W, True))
        else:
            halos.append((h_l, h_r, False))
    return halos


class _CondCopy:
    """An async copy whose start/wait both run under ``pl.when(cond)`` —
    used for the slab-axis halo segments, where the SOURCE of a segment
    depends on the (traced) grid index: shard-boundary tiles read the
    ppermuted slab, interior tiles read local rows. Exactly one of the two
    variants sharing a (dst, sem) fires on any path, so the semaphore
    pairing stays balanced."""

    def __init__(self, cond, copy):
        self._cond = cond
        self._copy = copy

    def start(self):
        pl.when(self._cond)(self._copy.start)

    def wait(self):
        pl.when(self._cond)(self._copy.wait)


def _slab_axis_segs(base, gi, t, N, w_l, w_r, aligned, ax,
                    local_wrap=False):
    """Per-axis L/C/R segment list for a slab 'valid' axis: each segment is
    ``(src_start, dst_off, extent, variant)`` where the L/R halo segments
    come in a pair of mutually exclusive variants — ``(ax, "slab", cond)``
    for the shard-boundary tile reading the ppermuted slab, and
    ``(ax, "local", cond)`` for interior tiles reading local rows.
    Shared by ``_seg_copies_one`` and ``pallas_4d._halo_copies`` (the
    interior-vs-boundary split is the hard-won part — one home).

    ``local_wrap``: the mesh axis has size 1, so the periodic neighbor is
    this shard itself — boundary tiles read the main array at wrapped
    offsets (variant tag ``"wrap"``) instead of a slab operand, and no
    slab build/exchange exists at all for the axis. The two-variant
    conditional structure is kept so the kernel's scalar work (and hence
    the measured per-chip throughput) matches the multi-device form."""
    n_tiles = N // t
    sC = pl.multiple_of(base, 8) if aligned else base
    first = gi == np.int32(0)
    last = gi == np.int32(n_tiles - 1)
    tag = "wrap" if local_wrap else "slab"
    segs = []
    if w_l > 0:
        if local_wrap:
            sL = jax.lax.rem(base + np.int32(N - w_l), np.int32(N))
        else:
            sL = np.int32(0)
        sL_loc = base - np.int32(w_l)
        if aligned:
            sL = pl.multiple_of(sL, 8) if local_wrap else sL
            sL_loc = pl.multiple_of(sL_loc, 8)
        segs.append((sL, 0, w_l, (ax, tag, first)))
        segs.append((sL_loc, 0, w_l, (ax, "local", jnp.logical_not(first))))
    segs.append((sC, w_l, t, None))
    if w_r > 0:
        if local_wrap:
            sR = jax.lax.rem(base + np.int32(t), np.int32(N))
            if aligned:
                sR = pl.multiple_of(sR, 8)
        else:
            sR = np.int32(w_l)
        sR_loc = base + np.int32(t)
        if aligned:
            sR_loc = pl.multiple_of(sR_loc, 8)
        segs.append((sR, w_l + t, w_r, (ax, tag, last)))
        segs.append((sR_loc, w_l + t, w_r, (ax, "local",
                                            jnp.logical_not(last))))
    return segs


def _combo_src(variants, src_ref, slab_refs):
    """(ref, cond) for one combo: the slab ref keyed by the combo's slab
    axes (corner for a pair), the main array otherwise; cond is the AND of
    the variants' tile-position conditions (None for unconditional)."""
    slab_set = frozenset(v[0] for v in variants if v[1] == "slab")
    ref = src_ref if not slab_set else slab_refs[slab_set]
    cond = None
    for v in variants:
        cond = v[2] if cond is None else jnp.logical_and(cond, v[2])
    return ref, cond


def _seg_copies_one(src_ref, bufs_ref, sem, shape_sp, tiles, halos, grid_ids,
                    band_idx=None, slot=None, padded=None, slab_axes=(),
                    slab_refs=None, wrap_axes=()):
    """L/C/R wrap-segment DMAs for one halo'd tile (shared dec/rec).

    ``padded[ax]`` marks axes whose source array is already halo-padded by
    ``w_l``/``w_r`` (the concat 'valid' mode used inside ``shard_map``,
    where ppermute supplies the periodic halo from ring neighbors): the
    three wrap segments collapse to one contiguous copy at offset ``i*t``
    and no modular arithmetic — tile ``i`` of the unpadded extent sits at
    padded rows ``[i*t, i*t + w_l + t + w_r)``.

    ``slab_axes``/``slab_refs``: the slab 'valid' mode — the main array
    stays UNPADDED (no full-size XLA concat copy per level) and each slab
    axis's halo comes from a small ``(.., w_l + w_r, ..)`` slab operand
    holding [left-neighbor tail | right-neighbor head] (two ppermutes + one
    slab-sized concat per axis). ``slab_refs`` maps a frozenset of slab
    axes to the ref covering that combination: per axis the axis slab, and
    for a pair of slab axes the CORNER slab (the axis-1 slab of the axis-0
    slab — diagonal neighbors via two-hop exchange); the empty set is the
    main array. Only shard-boundary tiles read a slab; interior tiles read
    local rows — selected per grid step with :class:`_CondCopy` pairs.
    Requires ``w <= tile`` on every slab axis (the caller gates; deeper
    halos would span two tiles).

    ``wrap_axes``: slab-eligible axes whose mesh axis has size 1 — their
    boundary segments read the main array at wrapped offsets (no slab
    operand exists; see ``_slab_axis_segs``).
    """
    # per axis: list of (src_start, dst_off, extent, variant) with variant
    # None (main array) / (ax, "slab", cond) / (ax, "local", cond).
    per_axis = []
    for ax in range(len(tiles)):
        N = shape_sp[ax]
        t = tiles[ax]
        w_l, w_r, aligned = halos[ax]
        i = grid_ids[ax]
        base = i * np.int32(t)
        if ax in slab_axes or ax in wrap_axes:
            per_axis.append(
                _slab_axis_segs(base, i, t, N, w_l, w_r, aligned, ax,
                                local_wrap=ax in wrap_axes)
            )
            continue
        if padded is not None and padded[ax]:
            s0 = pl.multiple_of(base, 8) if aligned else base
            per_axis.append([(s0, 0, w_l + t + w_r, None)])
            continue
        sL = jax.lax.rem(base + np.int32(N - w_l), np.int32(N))
        sC = base
        sR = jax.lax.rem(base + np.int32(t), np.int32(N))
        if aligned:
            sL = pl.multiple_of(sL, 8)
            sC = pl.multiple_of(sC, 8)
            sR = pl.multiple_of(sR, 8)
        n_tiles = N // t
        if (_FUSE_INTERIOR and n_tiles >= 3 and 0 < max(w_l, w_r)
                and w_l <= t and w_r <= t):
            # Interior tiles (halo never wraps): ONE contiguous DMA for
            # the full halo'd extent; boundary tiles keep the wrap
            # segments. Mutually exclusive variants as in the slab path.
            first = i == np.int32(0)
            last = i == np.int32(n_tiles - 1)
            interior = jnp.logical_and(
                jnp.logical_not(first), jnp.logical_not(last)
            )
            boundary = jnp.logical_or(first, last)
            sF = base - np.int32(w_l)
            if aligned:
                sF = pl.multiple_of(sF, 8)  # base, w_l both 8-multiples
            segs = [(sF, 0, w_l + t + w_r, (ax, "fuse", interior))]
            for s in ((sL, 0, w_l, None), (sC, w_l, t, None),
                      (sR, w_l + t, w_r, None)):
                if s[2] > 0:
                    segs.append((s[0], s[1], s[2], (ax, "fuse", boundary)))
            per_axis.append(segs)
            continue
        segs = [(sL, 0, w_l, None), (sC, w_l, t, None),
                (sR, w_l + t, w_r, None)]
        per_axis.append([s for s in segs if s[2] > 0])
    combos = [[]]
    for segs in per_axis:
        combos = [c + [s] for c in combos for s in segs]
    copies = []
    for combo in combos:
        variants = [s[3] for s in combo if s[3] is not None]
        ref, cond = _combo_src(variants, src_ref, slab_refs)
        spatial_src = tuple(pl.ds(s, e) for s, _, e, _ in combo) + (slice(None),)
        if band_idx is None:
            src = spatial_src
        else:
            # Static band index for the per-level kernels; a traced i32
            # scalar (dynamic DMA base offset) for the multilevel kernels,
            # whose band position is affine in the level grid index.
            bi = (
                np.int32(band_idx)
                if isinstance(band_idx, (int, np.integer))
                else band_idx
            )
            src = (bi,) + spatial_src
        dst_sp = tuple(slice(off, off + e) for _, off, e, _ in combo) + (
            slice(None),
        )
        dst = dst_sp if slot is None else (_as_i32(slot),) + dst_sp
        cp = pltpu.make_async_copy(ref.at[src], bufs_ref.at[dst], sem)
        copies.append(cp if cond is None else _CondCopy(cond, cp))
    return copies


def _slab_ref_dict(slab_axes, refs):
    """{frozenset(axes) -> ref} from the flat slab-operand list: one per
    axis (sorted) then the corner for an axis pair."""
    d = {}
    axes = sorted(slab_axes)
    for n, ax in enumerate(axes):
        d[frozenset((ax,))] = refs[n]
    if len(axes) == 2:
        d[frozenset(axes)] = refs[2]
    return d


def _n_slab_ops(slab_axes):
    n = len(slab_axes)
    return n + (1 if n == 2 else 0)


def _edge_copies(src_ref, edge_refs, sem_edge, shape_sp, tiles, halos,
                 grid_ids, slab_axes):
    """Conditional DMAs writing the output tile's shard-boundary rows into
    per-slab-axis ``edges`` outputs (``[my tail | my head]`` along the
    axis, the consumer kernel's halo widths). The edges output is the NEXT
    level's slab source, so the per-level XLA slab build (2 slices of the
    full array + a concat, ~3 dispatches at 0.2-1 ms each on this device)
    disappears: at mesh-axis size 1 the edges buffer IS the slab (the
    periodic neighbor is self); at size > 1 only two tiny ppermutes (+ a
    slab-sized concat) remain. Only boundary tiles fire; together they
    cover the whole edges buffer."""
    n_lead = len(tiles)
    copies = []
    cnt = 0
    for n, ax in enumerate(sorted(slab_axes)):
        w_l, w_r, _ = halos[ax]
        n_tiles = shape_sp[ax] // tiles[ax]
        first = grid_ids[ax] == np.int32(0)
        last = grid_ids[ax] == np.int32(n_tiles - 1)
        er = edge_refs[n]

        def _dst(off, e, ax=ax):
            return tuple(
                pl.ds(np.int32(off), e) if a == ax
                else pl.ds(grid_ids[a] * np.int32(tiles[a]), tiles[a])
                for a in range(n_lead)
            ) + (slice(None),)

        def _src(s0, e, ax=ax):
            return tuple(
                slice(s0, s0 + e) if a == ax else slice(None)
                for a in range(n_lead)
            ) + (slice(None),)

        if w_l:
            cp = pltpu.make_async_copy(
                src_ref.at[_src(tiles[ax] - w_l, w_l)],
                er.at[_dst(0, w_l)],
                sem_edge.at[np.int32(cnt)],
            )
            copies.append(_CondCopy(last, cp))
            cnt += 1
        if w_r:
            cp = pltpu.make_async_copy(
                src_ref.at[_src(0, w_r)],
                er.at[_dst(w_l, w_r)],
                sem_edge.at[np.int32(cnt)],
            )
            copies.append(_CondCopy(first, cp))
            cnt += 1
    return copies


def _edge_out(shape, halos, slab_axes, dtype):
    """(out_specs, out_shapes) for the per-slab-axis edges outputs."""
    specs, shapes = [], []
    for ax in sorted(slab_axes):
        w_l, w_r, _ = halos[ax]
        eshape = list(shape)
        eshape[ax] = w_l + w_r
        specs.append(pl.BlockSpec(memory_space=pl.ANY))
        shapes.append(jax.ShapeDtypeStruct(tuple(eshape), dtype))
    return specs, shapes


def _dec_tile_compute(buf, taps_np_tuple, ndim, tiles, halos, lam,
                      lane_logical=None):
    """All ``2^d`` analysis band values of one halo'd in-VMEM tile:
    d separable passes (lane roll on the last axis, halo slices on leading
    axes), optional in-register soft-threshold of the detail bands."""
    nb = 2**ndim
    vals = [_up(buf[...])]
    # Surplus pre-trim (see _stream_band_tree): the 8-aligned sublane
    # halo's dead columns would otherwise be multiplied by every earlier
    # axis's taps; one vector-layout slice removes them up front. The
    # buffer carries exactly the ndim spatial axes (both callers), so
    # trim axes and the pass loop's idx[ax] index the same dims.
    assert vals[0].ndim == ndim
    trim = [slice(None)] * ndim
    eff_wl = []
    trimmed = False
    for ax in range(ndim - 1):
        w_l, w_r, aligned = halos[ax]
        K = taps_np_tuple[ax].shape[1]
        h_l, h_r = K // 2 - 1, K // 2
        if aligned and (w_l > h_l or w_r > h_r):
            trim[ax] = slice(w_l - h_l, w_l + tiles[ax] + h_r)
            eff_wl.append(h_l)
            trimmed = True
        else:
            eff_wl.append(w_l)
    if trimmed:
        vals = [vals[0][tuple(trim)]]
    for ax in range(ndim):
        taps_np = taps_np_tuple[ax]
        K = taps_np.shape[1]
        o = K // 2 - 1
        use_roll = ax == ndim - 1
        new_lo, new_hi = [], []
        for v in vals:
            if use_roll:
                lo, hi = _pass_pair(v, taps_np, v.ndim - 1, o, True, None,
                                    lane_logical=lane_logical)
            else:
                # leading axis: halo slices, start offset absorbs any
                # remaining surplus: eff_wl - h_l with h_l = K//2-1.
                start0 = eff_wl[ax] - (K // 2 - 1)
                acc_lo = acc_hi = None
                for j in range(K):
                    idx = [slice(None)] * v.ndim
                    idx[ax] = slice(start0 + j, start0 + j + tiles[ax])
                    r = v[tuple(idx)]
                    tl = float(taps_np[0, j]) * r
                    th = float(taps_np[1, j]) * r
                    acc_lo = tl if acc_lo is None else acc_lo + tl
                    acc_hi = th if acc_hi is None else acc_hi + th
                lo, hi = acc_lo, acc_hi
            new_lo.append(lo)
            new_hi.append(hi)
        vals = new_lo + new_hi  # newest axis bit = MSB: identity order
    if lam:
        for b in range(1, nb):
            v = vals[b]
            mag = jnp.abs(v)
            vals[b] = v * (
                jnp.maximum(mag - lam, 0.0) / jnp.maximum(mag, 1e-30)
            )
    return vals


def _make_dec_kernel(ndim, tiles, shape_sp, taps_np_tuple, band_off,
                     padded=None, approx_to_big=False, slab_axes=(),
                     lam=0.0, emit_edges=False, wrap_axes=(),
                     bgroup=1, prefetch=False, lane_logical=None):
    """Fused analysis level: one wrap-segment tile load, all 2^d bands.

    Axes processed first->last, so the band list index IS the engine band
    order (each pass appends its high half as the new MSB; axis 0 ends up
    at bit 0). Outputs: details (bands 1..2^d-1) and the approximation.
    ``padded``: per-leading-axis 'valid' mode (see ``_seg_copies_one``).
    ``approx_to_big``: final level — the approximation is DMA'd into band 0
    of the aliased multilevel output instead of a separate blocked output
    (kills the trailing ``big.at[0].set`` XLA copy, a full-array pass at
    XLA's ~55 GB/s on this device).
    ``lam``: soft-threshold applied to the detail bands in-register before
    the staged write — the shrink of an iterative prox step fused into the
    analysis (each level's details are final, so one application per band);
    the XLA equivalent is a separate full-band-array read+write pass at
    ~55 GB/s.
    ``bgroup``: adjacent detail bands staged together and written with ONE
    DMA (they are contiguous in the band-first output) — fewer, larger
    write transfers (the kernels are DMA-count-bound, exp_bf16.py).
    ``prefetch``: cross-grid-step input double-buffering — step ``s``
    issues step ``s+1``'s wrap-segment loads before computing, hiding the
    input read behind compute + writes (plain unsharded mode only)."""
    nb = 2**ndim
    n_lead = ndim - 1
    halos = _dec_halos(ndim, taps_np_tuple)

    n_slabs = _n_slab_ops(slab_axes)
    n_edge = len(slab_axes) if emit_edges else 0
    assert not (emit_edges and approx_to_big)  # final level emits nothing
    assert not (prefetch and (padded is not None or slab_axes or wrap_axes))
    ngrid = tuple(shape_sp[ax] // tiles[ax] for ax in range(n_lead))

    def kernel(x_hbm, *rest):
        slab_refs = _slab_ref_dict(slab_axes, rest[:n_slabs])
        rest = rest[n_slabs:]
        big_in, big_ref, rest = rest[0], rest[1], rest[2:]
        sem_edge = None
        if approx_to_big:
            app_ref = None
            edge_refs = ()
            buf, stage, sem, sem_out = rest
        else:
            app_ref = rest[0]
            edge_refs = rest[1 : 1 + n_edge]
            rest = rest[1 + n_edge :]
            if emit_edges:
                buf, stage, sem, sem_out, sem_edge = rest
            else:
                buf, stage, sem, sem_out = rest
        del big_in  # aliased to big_ref (input_output_aliases)
        grid_ids = [pl.program_id(ax) for ax in range(n_lead)]
        if prefetch:
            # Linear step id (row-major; the TPU grid iterates the last
            # axis fastest): step ``s`` issues the input loads for step
            # ``s + D - 1`` (D = prefetch depth) before computing, so a
            # load has D-1 compute+write windows to complete. Steps
            # 1..D-2 ahead are issued by step 0 only (start-up fill).
            D = int(prefetch)
            lin = grid_ids[0]
            for ax in range(1, n_lead):
                lin = lin * np.int32(ngrid[ax]) + grid_ids[ax]
            total = int(np.prod(ngrid))
            slot_in = jax.lax.rem(lin, np.int32(D))
            first = lin == np.int32(0)

            def ids_of(linv):
                out = []
                r = linv
                for ax in range(n_lead):
                    stride = int(np.prod(ngrid[ax + 1 :], dtype=np.int64))
                    out.append(jax.lax.div(r, np.int32(stride)))
                    r = jax.lax.rem(r, np.int32(stride))
                return out

            def in_copies(ids, slot):
                return _seg_copies_one(
                    x_hbm, buf, sem.at[slot], shape_sp, tiles, halos, ids,
                    slot=slot,
                )

            # One fill loop covers the own tile too (k = 0): steps > 0
            # had their input issued D-1 steps ago as the k = D-1 case,
            # so every k < D-1 start is predicated on ``first`` (the
            # step-0 ring fill) — no separate own-tile start group.
            for k in range(D):
                tgt = lin + np.int32(k)
                exists = tgt <= np.int32(total - 1)
                cond = exists if k == D - 1 else jnp.logical_and(
                    first, exists
                )
                tgt_c = jnp.minimum(tgt, np.int32(total - 1))
                for c in in_copies(ids_of(tgt_c),
                                   jax.lax.rem(tgt_c, np.int32(D))):
                    _CondCopy(cond, c).start()
            for c in in_copies(grid_ids, slot_in):
                c.wait()
            buf_tile = buf.at[slot_in]
        else:
            copies = _seg_copies_one(
                x_hbm, buf, sem, shape_sp, tiles, halos, grid_ids,
                padded=padded, slab_axes=slab_axes, slab_refs=slab_refs,
                wrap_axes=wrap_axes,
            )
            for c in copies:
                c.start()
            for c in copies:
                c.wait()
            buf_tile = buf

        vals = _dec_tile_compute(buf_tile, taps_np_tuple, ndim, tiles,
                                 halos, lam, lane_logical=lane_logical)
        if not approx_to_big:
            app_ref[...] = vals[0].astype(app_ref.dtype)
        edge_cps = []
        if emit_edges:
            edge_cps = _edge_copies(
                app_ref, edge_refs, sem_edge, shape_sp, tiles, halos,
                grid_ids, slab_axes,
            )
            for c in edge_cps:
                c.start()
        # Detail bands go straight into the full multilevel output array
        # (ANY space, aliased input/output) via staged DMAs at the level's
        # static band offset: no XLA band concatenation anywhere in dec.
        # ``bgroup`` adjacent detail bands share one contiguous DMA.
        sp_idx = tuple(
            pl.ds(grid_ids[ax] * np.int32(tiles[ax]), tiles[ax])
            for ax in range(n_lead)
        ) + (slice(None),)
        groups = ([[0]] if approx_to_big else []) + _detail_groups(nb, bgroup)
        inflight = [None, None]
        for gi, grp in enumerate(groups):
            slot = gi % 2
            if inflight[slot] is not None:
                inflight[slot].wait()
            for k, b in enumerate(grp):
                stage[np.int32(slot), np.int32(k)] = vals[b].astype(
                    stage.dtype
                )
            first_band = 0 if grp[0] == 0 else band_off + grp[0] - 1
            out_idx = (pl.ds(np.int32(first_band), len(grp)),) + sp_idx
            c = pltpu.make_async_copy(
                stage.at[np.int32(slot), pl.ds(0, len(grp))],
                big_ref.at[out_idx],
                sem_out.at[np.int32(slot)],
            )
            c.start()
            inflight[slot] = c
        for c in inflight:
            if c is not None:
                c.wait()
        for c in edge_cps:
            c.wait()

    return kernel


def _dec_tiles(shape, taps_np, masked_lanes=False):
    """``masked_lanes``: the logical-lane masked double-rotates of the
    padded big-odd mode hold ~3x the live values per roll (r1 + r2 +
    select vs one rotate); scale the liveness model accordingly (the
    unscaled model OOM'd Mosaic's scoped VMEM at 250^3 rec, r5)."""
    ndim = len(shape)
    # Masked logical-lane rolls double the rolls AND the unrolled tap
    # chains keep every roll output live on Mosaic's scoped stack, so the
    # penalty grows with the lane filter length (db9-lane at (32,32)
    # measured 19.3M scoped vs the 16M limit at a flat 1.5x factor; db4
    # at (16,32) is hardware-proven at 1.5x).
    K_lane = taps_np[-1].shape[1]
    scale = (
        1.0 if not masked_lanes
        else 1.5 if K_lane <= 8
        else 2.5 if K_lane <= 12
        else 3.5
    )
    if shape[-1] % 128:
        return None
    if _DEC_TILES_OVERRIDE is not None:
        tiles = _DEC_TILES_OVERRIDE[: ndim - 1]
        # Dev-only knob, but still guard the hardware invariants: the
        # sublane tile drives 8-aligned DMA extents/starts (a non-8
        # multiple crashes the TPU worker, CLAUDE.md), and the liveness
        # model is the calibrated stand-in for Mosaic's 16MB scoped limit.
        if tiles[-1] % 8:
            raise ValueError(
                f"_DEC_TILES_OVERRIDE sublane tile {tiles[-1]} is not a "
                "multiple of 8: such tiles issue non-8-multiple sublane "
                "DMA extents, which crash the TPU worker"
            )
        if all(shape[ax] % tiles[ax] == 0 for ax in range(ndim - 1)):
            import warnings

            live = _dec_live_model(shape, tuple(tiles), taps_np)
            if live > 2_400_000:
                warnings.warn(
                    f"_DEC_TILES_OVERRIDE {tiles} exceeds the calibrated "
                    f"VMEM liveness budget ({live} > 2400000 words); "
                    "expect a Mosaic scoped-VMEM compile failure",
                    stacklevel=3,
                )
            return tuple(tiles)
        return None
    if ndim == 2:
        K0 = taps_np[0].shape[1]
        for tx in (256, 128, 64, 32, 16, 8):
            if shape[0] % tx == 0:
                # Same live-words budget discipline as the 3D branch: a
                # 4096^2 f32 at tx=256 would blow the 16MB scoped VMEM;
                # fall to a smaller tile (or None -> XLA fallback).
                ex0 = tx + 2 * _round8(K0 // 2)
                live = ex0 * shape[-1] + 8 * tx * shape[-1]
                if live * scale <= 2_400_000:
                    return (tx,)
        return None
    for tx, ty in ((16, 16), (8, 16), (8, 8)):
        if shape[0] % tx == 0 and shape[1] % ty == 0:
            K0, K1 = taps_np[0].shape[1], taps_np[1].shape[1]
            ex0 = tx + K0 - 1
            ex1 = ty + 2 * _round8(K1 // 2)
            z = shape[-1]
            # buf + two fan-out stages + 8 band values + out pipelining
            live = ex0 * ex1 * z + 2 * tx * ex1 * z + 12 * tx * ty * z
            if live * scale <= 2_400_000:
                return (tx, ty)
    return None


def _dec_live_model(shape, tiles, taps_np, bgroup=1, prefetch=0):
    """Live-words model of the knobbed dec kernel — THE SAME base terms
    ``_dec_tiles`` calibrated against Mosaic's 16MB scoped limit (buf +
    fan-out stages + 12-tile compute/stage), extended by the knobs: the
    grouped write stage grows by 2*(G-1) tiles and the prefetch ring
    holds D-1 extra input buffers. One model governs the tile search,
    the bgroup gate, and the prefetch-depth gate, all against the same
    2.4M-word budget (an earlier looser prefetch gate admitted configs
    ~20% past the calibrated ceiling on shapes never hardware-swept)."""
    ndim = len(shape)
    z = shape[-1]
    tile_words = int(np.prod(tiles)) * z
    if ndim == 2:
        K0 = taps_np[0].shape[1]
        ex0 = tiles[0] + 2 * _round8(K0 // 2)
        buf = ex0 * z
        base = buf + 8 * tiles[0] * z
    else:
        K0, K1 = taps_np[0].shape[1], taps_np[1].shape[1]
        ex0 = tiles[0] + K0 - 1
        ex1 = tiles[1] + 2 * _round8(K1 // 2)
        buf = ex0 * ex1 * z
        base = buf + 2 * tiles[0] * ex1 * z + 12 * tile_words
    return (base + 2 * (bgroup - 1) * tile_words
            + max(prefetch - 1, 0) * buf)


def _fused_dec_level(x, big, band_off, taps_np, shape=None, padded=None,
                     approx_to_big=False, slab_axes=(), slabs=(), lam=0.0,
                     emit_edges=False, wrap_axes=(), lane_logical=None):
    """One analysis level. Detail bands are written in place into ``big``
    (the full (B, *s) multilevel output, aliased) at ``band_off``; returns
    (big, next approx) — or just ``big`` when ``approx_to_big`` (final
    level: the approximation is DMA'd into band 0 in-kernel).

    ``shape``/``padded``: concat 'valid' mode — ``x`` is already
    halo-padded on the ``padded`` leading axes (by the ``_dec_halos``
    widths) and ``shape`` is the unpadded output shape.
    ``slab_axes``/``slabs``: slab 'valid' mode — ``x`` stays unpadded and
    the slab axes' periodic neighbors ride in the small slab operands
    (per-axis slabs then the corner; see ``_seg_copies_one``).
    ``emit_edges``: additionally emit one ``[my tail | my head]`` edges
    output per slab axis (the next level's slab source, see
    ``_edge_copies``); returns ``(big, approx, *edges)``."""
    if shape is None:
        shape = x.shape
    ndim = len(shape)
    nb = 2**ndim
    tiles = _dec_tiles(shape, taps_np, masked_lanes=lane_logical is not None)
    if tiles is None:
        return None

    n_lead = ndim - 1
    halos = _dec_halos(ndim, taps_np)
    grid = tuple(shape[ax] // tiles[ax] for ax in range(n_lead))
    buf_tile = tuple(
        tiles[ax] + halos[ax][0] + halos[ax][1] for ax in range(n_lead)
    ) + (shape[-1],)

    # Knobbed write grouping / input prefetch (hardware-swept,
    # scripts/exp_dec_opt.py). Prefetch needs the plain unsharded segment
    # structure; grouping is mode-independent but VMEM-gated.
    # ``prefetch`` is the slot-ring DEPTH (an int >= 2): a load issued at
    # step s - (D-1) has D-1 compute+write windows to land; dropped to
    # the deepest depth whose D-slot input buffer fits the VMEM model.
    bgroup = min(_DEC_LEVEL_BGROUP, _dec_bgroup(shape, tiles, taps_np, ndim))
    prefetch = 0
    # Legacy boolean knob value: True means "on" = the shallowest ring.
    want = 2 if _DEC_PREFETCH is True else int(_DEC_PREFETCH or 0)
    if want and padded is None and not slab_axes and not wrap_axes:
        for D in range(want, 1, -1):
            if _dec_live_model(shape, tiles, taps_np, bgroup, D) <= 2_400_000:
                prefetch = D
                break

    B = big.shape[0]
    scratch = [
        pltpu.VMEM(
            ((prefetch,) + buf_tile) if prefetch else buf_tile, x.dtype
        ),
        pltpu.VMEM((2, bgroup) + tuple(tiles) + (shape[-1],), x.dtype),
        pltpu.SemaphoreType.DMA((prefetch,)) if prefetch
        else pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if approx_to_big:
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
        out_shape = jax.ShapeDtypeStruct((B,) + shape, x.dtype)
    else:
        out_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                tuple(tiles) + (shape[-1],),
                lambda *gi: gi + (np.int32(0),),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((B,) + shape, x.dtype),
            jax.ShapeDtypeStruct(shape, x.dtype),
        ]
        if emit_edges:
            e_specs, e_shapes = _edge_out(shape, halos, slab_axes, x.dtype)
            out_specs += e_specs
            out_shape += e_shapes
            scratch.append(pltpu.SemaphoreType.DMA((4,)))
        out_specs = tuple(out_specs)
        out_shape = tuple(out_shape)
    operands = (x,) + tuple(slabs)
    return pl.pallas_call(
        _make_dec_kernel(ndim, tiles, shape, taps_np, band_off, padded,
                         approx_to_big, tuple(slab_axes), lam=lam,
                         emit_edges=emit_edges and not approx_to_big,
                         wrap_axes=tuple(wrap_axes),
                         bgroup=bgroup, prefetch=prefetch,
                         lane_logical=lane_logical),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (len(operands) + 1),
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={len(operands): 0},
        scratch_shapes=scratch,
    )(*operands, big)


def dec_pallas(x, taps, level: int, lam: float = 0.0):
    """Multilevel analysis via the fused level kernel; returns (B, *s).

    Per level one pallas_call reads the running approximation once (wrap
    segments, no XLA pre-pad) and emits the 2^d-1 detail bands plus the
    next approximation; the only XLA data movement is the final band
    concatenation.

    ``taps`` must be host NumPy arrays (they are baked into the kernel as
    constants). Falls back to the XLA direct path for unsupported
    shapes/dtypes. Not itself jitted — wrap the caller in ``jax.jit``.

    Differentiable: ``pallas_call`` has no autodiff rules, but the
    transform is linear and its exact adjoint is the synthesis with
    ``preserve_l2=True`` (the tight-frame adjoint, asserted by the
    adjointness tests) — registered via ``linear_call`` so jvp/vjp/grad
    run the fused kernels too.
    """
    from jax.custom_derivatives import linear_call

    taps_np = tuple(np.asarray(t) for t in taps)
    if lam:
        # The shrink makes the map non-linear — no linear_call adjoint.
        return _dec_dispatch(x, taps_np, level, lam=float(lam))
    return linear_call(
        lambda _, v: _dec_dispatch(v, taps_np, level),
        lambda _, ybar: _rec_dispatch(ybar, taps_np, level, True),
        (), x,
    )


def _padded_supported(shape, dtype, taps_np):
    from . import pallas_padded

    return pallas_padded.supported(shape, dtype, taps_np)


def _shrink_details_xla(y, lam):
    """Soft-threshold the detail bands of a band-first array (fallback for
    dispatch branches whose kernels don't fuse the shrink)."""
    d = y[1:]
    mag = jnp.abs(d)
    d = d * (jnp.maximum(mag - lam, 0.0) / jnp.maximum(mag, 1e-30)).astype(
        y.dtype
    )
    return jnp.concatenate([y[:1], d], axis=0)


def _dec_dispatch(x, taps_np, level: int, lam: float = 0.0):
    from . import pallas_flat, pallas_resident

    if x.ndim == 1 and pallas_flat.flat_supported(x.shape, x.dtype, taps_np):
        # 1D: the natural-layout resident lift is (1, N) — 1/8 sublane
        # utilization; the flat (8, P/8) view measured ~2x faster pairs.
        y = pallas_flat.dec_flat(x, taps_np, level)
        return _shrink_details_xla(y, lam) if lam else y
    if x.ndim > 1 and level > 1:
        # One-launch multilevel tiled cascade: beats the resident
        # whole-array kernels at every measured >=256^2-class shape
        # (0.313 vs 0.387 ms pairs at 256^2 db4 L3, 0.391 vs 0.830 at
        # 512^2 — pipelined tile DMA vs whole-array rolls); declines
        # (returns None) on non-tileable shapes, which stay resident/flat.
        out = _fused_dec_multi(x, taps_np, level, lam=lam)
        if out is not None:
            return out
    if pallas_resident.resident_supported(x.shape, x.dtype, taps_np):
        y = pallas_resident.dec_resident(x, taps_np, level)
        return _shrink_details_xla(y, lam) if lam else y
    if x.ndim == 4:
        from . import pallas_4d

        if pallas_4d.supported(x.shape, x.dtype, taps_np):
            return pallas_4d.dec4(x, taps_np, level, lam=lam)
    if not _supported(x.shape, x.dtype) or _dec_tiles(x.shape, taps_np) is None:
        from . import pallas_flat, pallas_ragged

        ragged_ok = pallas_ragged.supported(x.shape, x.dtype, taps_np)
        padded_ok = _padded_supported(x.shape, x.dtype, taps_np)
        from . import pallas_padded

        if pallas_flat.flat_supported(x.shape, x.dtype, taps_np):
            y = pallas_flat.dec_flat(x, taps_np, level)
        elif padded_ok and (
            not ragged_ok
            or pallas_padded.inflation(x.shape)
            <= pallas_padded.PREFER_INFLATION
        ):
            # Padded tiled kernels beat the ragged blocked rotates up to
            # ~4x work-voxel inflation (measured r5 A/B, see
            # pallas_padded.inflation).
            return pallas_padded.dec_padded(x, taps_np, level, lam=lam)
        elif ragged_ok:
            # Arbitrary-shape row-grid kernels (shrink fused in-kernel).
            return pallas_ragged.dec_ragged(x, taps_np, level, lam=lam)
        else:
            if jax.default_backend() not in ("cpu",):
                # Defense in depth: plan._resolve_path refuses this case
                # up front; reaching here on an accelerator means a gate
                # diverged. The XLA direct path on odd shapes is a
                # documented worker-wedging hazard — never dispatch it
                # silently (VERDICT r4 item 1).
                raise RuntimeError(
                    f"no Pallas variant serves shape {x.shape} "
                    f"{x.dtype} on an accelerator backend; refusing the "
                    "hazardous XLA direct fallback (run on CPU instead)"
                )
            # Cast taps to the array dtype: callers may pass full-precision
            # (f64) taps for the kernels' f32 compute, and under x64 an f64
            # constant would promote the whole XLA fallback to f64.
            taps_x = tuple(t.astype(x.dtype) for t in taps_np)
            y = direct_path.dec_direct(x, taps_x, level)
        return _shrink_details_xla(y, lam) if lam else y
    ndim = x.ndim
    nb = 2**ndim
    B = nb + (nb - 1) * (level - 1)
    big = jnp.empty((B,) + x.shape, x.dtype)
    approx = x
    off = B
    for lvl in range(level):
        off -= nb - 1
        final = lvl == level - 1
        out = _fused_dec_level(approx, big, off, taps_np,
                               approx_to_big=final, lam=lam)
        if final:
            return out
        big, approx = out


# ---------------------------------------------------------------------------
# Multilevel-in-one-launch analysis (unsharded tiled path)
# ---------------------------------------------------------------------------
#
# One pallas_call for the WHOLE multilevel cascade: grid = (level, *tiles),
# level slowest (TPU grids are sequential, so every level-l tile completes
# before any level-(l+1) tile starts). The running approximation ping-pongs
# through a small HBM output buffer; level 0 reads x, later levels read the
# ping slot written by the previous level (the same predicated
# segment-variant discipline as the sharded slab kernels — exactly one
# source fires per segment). Detail-band positions are affine in the level
# index and ride traced DMA base offsets.
#
# Why: per-level launches cost a fixed kernel overhead each (measured: the
# 512^2 L3 pair is ~6x its pure DMA time with 6 launches); one launch
# amortizes it and keeps the Mosaic pipeline warm across levels.
#
# Gated to small/medium shapes: measured (v5e) the 512^2 db4 L3 pair drops
# 0.807 -> 0.496 ms (1.63x), but at 256^3 the pair is a wash (22.57 vs
# 22.3-21.7 per-level) — with 64 tiles/level the predicated-source scalar
# work grows with tile count and cancels the fixed launch savings.

_MULTI_MAX_VOX = 4_000_000  # 2048^2 / 128^3-class shapes and below


def _detail_groups(nb, bgroup):
    """Detail bands 1..nb-1 in chunks of ``bgroup`` adjacent bands — each
    chunk is contiguous in the band-first layout, so it rides ONE DMA
    (the transforms are DMA-count-bound: bf16 halves traffic but not
    time, exp_bf16.py)."""
    return [
        list(range(b, min(b + bgroup, nb))) for b in range(1, nb, bgroup)
    ]


def _make_dec_multi_kernel(ndim, tiles, shape_sp, taps_np_tuple, level, B,
                           nping, lam=0.0, bgroup=1):
    nb = 2**ndim
    n_lead = ndim - 1
    halos = _dec_halos(ndim, taps_np_tuple)
    groups = _detail_groups(nb, bgroup)

    def kernel(x_hbm, big_in, big_ref, ping_ref, buf, stage, sem, sem_out):
        del big_in  # aliased to big_ref (input_output_aliases)
        lvl = pl.program_id(0)
        grid_ids = [pl.program_id(1 + ax) for ax in range(n_lead)]
        first = lvl == np.int32(0)
        final = lvl == np.int32(level - 1)
        # (lvl-1) % nping for lvl >= 1; a harmless in-range slot at lvl==0
        # (the ping-source variant is predicated off there).
        pidx = jax.lax.rem(lvl + np.int32(nping - 1), np.int32(nping))
        copies = [
            _CondCopy(first, c)
            for c in _seg_copies_one(
                x_hbm, buf, sem, shape_sp, tiles, halos, grid_ids
            )
        ] + [
            _CondCopy(jnp.logical_not(first), c)
            for c in _seg_copies_one(
                ping_ref, buf, sem, shape_sp, tiles, halos, grid_ids,
                band_idx=pidx,
            )
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        vals = _dec_tile_compute(buf, taps_np_tuple, ndim, tiles, halos, lam)

        woff = np.int32(B) - (lvl + np.int32(1)) * np.int32(nb - 1)
        wslot = jax.lax.rem(lvl, np.int32(nping))
        sp_idx = tuple(
            pl.ds(grid_ids[ax] * np.int32(tiles[ax]), tiles[ax])
            for ax in range(n_lead)
        ) + (slice(None),)
        inflight = [None, None]
        # Approximation first (group index -1), then the detail groups —
        # each group is one contiguous multi-band DMA.
        for gi, grp in enumerate([[0]] + groups):
            slot = gi % 2
            if inflight[slot] is not None:
                for c in inflight[slot]:
                    c.wait()
            if gi == 0:
                stage[np.int32(slot), np.int32(0)] = vals[0].astype(
                    stage.dtype
                )
                # Approximation: ping slot between levels, band 0 of the
                # aliased output at the final level (one of the pair fires).
                cps = [
                    _CondCopy(final, pltpu.make_async_copy(
                        stage.at[np.int32(slot), np.int32(0)],
                        big_ref.at[(np.int32(0),) + sp_idx],
                        sem_out.at[np.int32(slot)],
                    )),
                    _CondCopy(jnp.logical_not(final), pltpu.make_async_copy(
                        stage.at[np.int32(slot), np.int32(0)],
                        ping_ref.at[(wslot,) + sp_idx],
                        sem_out.at[np.int32(slot)],
                    )),
                ]
            else:
                for k, b in enumerate(grp):
                    stage[np.int32(slot), np.int32(k)] = vals[b].astype(
                        stage.dtype
                    )
                cps = [pltpu.make_async_copy(
                    stage.at[np.int32(slot), pl.ds(0, len(grp))],
                    big_ref.at[
                        (pl.ds(woff + np.int32(grp[0] - 1), len(grp)),)
                        + sp_idx
                    ],
                    sem_out.at[np.int32(slot)],
                )]
            for c in cps:
                c.start()
            inflight[slot] = cps
        for cl in inflight:
            if cl is not None:
                for c in cl:
                    c.wait()

    return kernel


def _dec_bgroup(shape, tiles, taps_np, ndim):
    """Largest detail-band write group whose extra stage liveness fits
    (the 2-slot stage grows from 2 to 2*G tiles on top of ``_dec_tiles``'
    model — one liveness formula, ``_dec_live_model``, governs both this
    and the prefetch gate)."""
    nb = 2**ndim
    for g in (4, 2):
        if g >= nb:
            continue
        if _dec_live_model(shape, tiles, taps_np, bgroup=g) <= 2_400_000:
            return g
    return 1


def _fused_dec_multi(x, taps_np, level: int, lam=0.0):
    """Whole multilevel analysis in ONE pallas_call (unsharded tiled path);
    returns the (B, *s) band array, or None when the shape/level doesn't
    qualify (level 1, unsupported dtype/shape, no feasible tile)."""
    shape = x.shape
    ndim = len(shape)
    if level < 2 or not _supported(shape, x.dtype):
        return None
    if int(np.prod(shape)) > _MULTI_MAX_VOX:
        return None
    tiles = _dec_tiles(shape, taps_np)
    if tiles is None:
        return None
    nb = 2**ndim
    B = nb + (nb - 1) * (level - 1)
    n_lead = ndim - 1
    halos = _dec_halos(ndim, taps_np)
    grid = (level,) + tuple(shape[ax] // tiles[ax] for ax in range(n_lead))
    buf_tile = tuple(
        tiles[ax] + halos[ax][0] + halos[ax][1] for ax in range(n_lead)
    ) + (shape[-1],)
    nping = 1 if level == 2 else 2
    bgroup = _dec_bgroup(shape, tiles, taps_np, ndim)
    big = jnp.empty((B,) + shape, x.dtype)
    out = pl.pallas_call(
        _make_dec_multi_kernel(ndim, tiles, shape, taps_np, level, B, nping,
                               lam=lam, bgroup=bgroup),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B,) + shape, x.dtype),
            jax.ShapeDtypeStruct((nping,) + shape, x.dtype),
        ),
        input_output_aliases={1: 0},
        scratch_shapes=[
            pltpu.VMEM(buf_tile, x.dtype),
            pltpu.VMEM((2, bgroup) + tuple(tiles) + (shape[-1],), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x, big)
    return out[0]


# ---------------------------------------------------------------------------
# Synthesis
# ---------------------------------------------------------------------------


def _rec_tiles(shape, taps_np, masked_lanes=False):
    """Tile choice for the streaming rec kernel (larger than the tree
    kernel's — only one band tile is resident at a time).
    ``masked_lanes``: see ``_dec_tiles``."""
    ndim = len(shape)
    # Masked logical-lane rolls double the rolls AND the unrolled tap
    # chains keep every roll output live on Mosaic's scoped stack, so the
    # penalty grows with the lane filter length (db9-lane at (32,32)
    # measured 19.3M scoped vs the 16M limit at a flat 1.5x factor; db4
    # at (16,32) is hardware-proven at 1.5x).
    K_lane = taps_np[-1].shape[1]
    scale = (
        1.0 if not masked_lanes
        else 1.5 if K_lane <= 8
        else 2.5 if K_lane <= 12
        else 3.5
    )
    if shape[-1] % 128:
        return None
    if ndim == 2:
        K0 = taps_np[0].shape[1]
        for tx in (512, 256, 128, 64, 32, 16):
            if shape[0] % tx == 0:
                ex0 = tx + 2 * _round8(max(K0 // 2, K0 // 2 - 1))
                # + tx*z: the tree reduction's held stack[0] partial
                # (_stream_band_tree).
                live = 4 * ex0 * shape[-1] + 3 * tx * shape[-1]
                if live * scale <= 3_400_000:
                    return (tx,)
        return None
    for tx, ty in ((32, 32), (16, 32), (16, 16), (8, 16), (8, 8)):
        if shape[0] % tx == 0 and shape[1] % ty == 0:
            # live words ~ 2 bufs + chain temp + acc; keep under ~10MB
            K0, K1 = taps_np[0].shape[1], taps_np[1].shape[1]
            ex0 = tx + K0 - 1  # outer axis: exact halo
            ex1 = ty + 2 * _round8(K1 // 2)  # sublane axis: 8-aligned
            z = shape[-1]
            live = 3 * ex0 * ex1 * z + ex0 * ex1 * z + 2 * tx * ty * z
            # The tree reduction holds up to two extra partials
            # ((tx,ey,z) after axis 0, (tx,ty,z) after axis 1).
            live += tx * ex1 * z + tx * ty * z
            if live * scale <= 3_400_000:
                return (tx, ty)
    return None


def _rec_halos(ndim, taps_np_tuple):
    """(w_l, w_r, aligned) per leading axis for the adjoint anchor
    (o' = K//2 left, K//2-1 right); sublane axis 8-aligned."""
    n_lead = ndim - 1
    halos = []
    for ax in range(n_lead):
        K = taps_np_tuple[ax].shape[1]
        h_l, h_r = K // 2, K // 2 - 1
        if ax == n_lead - 1:
            W = _round8(max(h_l, h_r))
            halos.append((W, W, True))
        else:
            halos.append((h_l, h_r, False))
    return halos


def _tree_reduce(nb, d_sp, first_pass, merge_pass):
    """Binary-counter pairwise band reduction — THE one home for the
    tree-factored adjoint's carry-chain logic (used by the streaming,
    resident and flat synthesis bodies). ``first_pass(b)`` yields band
    ``b``'s value after its axis-0 pass (including any DMA waits);
    ``merge_pass(v, d, b)`` applies axis ``d`` to the sum of the 2^d
    bands sharing ``b``'s higher bits. Returns the accumulated total."""
    stack = [None] * max(d_sp - 1, 1)
    acc = None
    for b in range(nb):
        v = first_pass(b)
        d = 0
        while d < d_sp - 1 and stack[d] is not None:
            v = stack[d] + v
            stack[d] = None
            v = merge_pass(v, d + 1, b)
            d += 1
        if d < d_sp - 1:
            stack[d] = v
        else:
            acc = v if acc is None else acc + v
    return acc


def _tree_expand(d_sp, axis_pass, emit, root):
    """Depth-first analysis band tree (the reduction's dual, shared by
    the resident and flat analysis bodies): each ``axis_pass(v, ax, sel)``
    is computed once per tree node and shared by the 2^(d-ax-1) bands
    below it; ``emit(b, val)`` receives the leaves in bit-reversed band
    order (writes are independent — order is irrelevant). Peak liveness
    = one intermediate per axis on the recursion path."""

    def rec(v, ax, b):
        if ax == d_sp:
            emit(b, v)
            return
        for s in (0, 1):
            rec(axis_pass(v, ax, s), ax + 1, b | (s << ax))

    rec(root, 0, 0)


def _stream_band_tree(nb, ndim, tiles, halos, taps_np_tuple, bufs, NSLOT,
                      seg_copies, lane_logical=None):
    """Streaming synthesis band loop shared by the per-level and the
    one-launch multilevel rec kernels: NSLOT-deep DMA prefetch plus a
    TREE-FACTORED adjoint accumulation (binary-counter pairwise reduction
    over the band index). Axis 0 is applied per band, but axis d>0 is
    applied to the SUM of the 2^d bands sharing its higher bits —
    (8+4+2)K tap-passes instead of 8*3K for 3D, and the lane rolls (the
    costly op) run on 2 partials instead of 8. rec is VPU-bound, not
    DMA-bound: bf16's halved traffic and the fused-interior single-DMA
    reads both measured ZERO rec gain (scripts/exp_rec_fuse.py), so
    vector work is the lever. Stream order and DMA structure match the
    old band-serial form exactly; only the compute is re-associated
    (adjoint of the analysis tree in ``_dec_tile_compute``)."""

    # Surplus pre-trim: the 8-aligned sublane halo is wider than the
    # adjoint needs (w = round8(K//2) vs exact h_l = K//2, h_r = K//2-1),
    # and the FIRST axis pass would multiply those dead columns on every
    # tap. Slicing them off each band buffer once (a vector-layout slice,
    # no DMA — odd sublane extents are fine for compute, the 8-multiple
    # rule binds DMAs only) cuts ~12% of the tile's tap work at (32,32)
    # db4. ``eff_wl[ax]`` is the post-trim left halo per axis.
    trim = [slice(None)] * ndim  # applied after the slot axis is indexed
    eff_wl = []
    trimmed = False
    for ax in range(ndim - 1):
        w_l, w_r, aligned = halos[ax]
        K = taps_np_tuple[ax].shape[1]
        h_l, h_r = K // 2, K // 2 - 1
        if aligned and (w_l > h_l or w_r > h_r):
            trim[ax] = slice(w_l - h_l, w_l + tiles[ax] + h_r)
            eff_wl.append(h_l)
            trimmed = True
        else:
            eff_wl.append(w_l)
    trim = tuple(trim)

    def axis_pass(v, ax, sel):
        # One partial's adjoint along ``ax``. Leading axes: halo slices
        # (no further trimming copy: every live VMEM value counts against
        # the 16MB scoped limit). Lane axis: circular pltpu.roll.
        trow = taps_np_tuple[ax][sel][::-1]
        K = len(trow)
        o_adj = K // 2
        a2 = None
        for j in range(K):
            if ax == ndim - 1:
                N = lane_logical or v.shape[-1]
                shift = (o_adj - j) % N
                if lane_logical:
                    r = _lane_roll_logical(v, shift, N)
                else:
                    r = (
                        pltpu.roll(v, np.int32(shift), axis=v.ndim - 1)
                        if shift
                        else v
                    )
            else:
                h_l = K // 2
                start = eff_wl[ax] - h_l + j
                idx2 = [slice(None)] * v.ndim
                idx2[ax] = slice(start, start + tiles[ax])
                r = v[tuple(idx2)]
            term = float(trow[j]) * r
            a2 = term if a2 is None else a2 + term
        return a2

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
        v = _up(bufs[np.int32(slot)])
        if trimmed:
            v = v[trim]
        return axis_pass(v, 0, b & 1)

    return _tree_reduce(
        nb, ndim, first_pass,
        lambda v, d, b: axis_pass(v, d, (b >> d) & 1),
    )


def _make_rec_kernel(ndim, tiles, shape_sp, taps_np_tuple, band_src, scale,
                     padded=None, slab_axes=(), emit_edges=False,
                     wrap_axes=(), lane_logical=None):
    """Streaming synthesis kernel: one band tile in flight (double-buffered
    9-segment wrap DMA straight from the unpadded band array), contributions
    accumulated in VMEM. No XLA pre-pad — the periodic wrap is handled by
    the L/C/R segment loads (all extents static multiples of 8, the
    empirically required DMA granularity).

    ``band_src[b]`` is ``("y", idx)`` (band ``idx`` of the full band array)
    or ``("a", 0)`` (the running approximation, a separate band-less input) —
    this is how multilevel synthesis avoids materializing the per-level
    ``[acc] + details`` group concatenation. ``scale`` (the reference's
    ``/2^d`` per level, ``Functions/nd_dwt_3D.m:233-235``) is folded into
    the accumulate, saving one full XLA pass per level."""
    nb = 2**ndim
    n_lead = ndim - 1
    has_approx = any(kind == "a" for kind, _ in band_src)
    NSLOT = 3  # prefetch depth: 2 stalls on the 27-DMA segment batches
    # Halo widths per leading axis (_rec_halos): only the sublane dimension
    # requires 8-aligned DMA extents/starts (probed on v5e: odd sublane
    # extents fail, outer-dim extents/starts are free), so outer axes use
    # the exact adjoint halo.
    halos = _rec_halos(ndim, taps_np_tuple)

    n_slabs = _n_slab_ops(slab_axes)
    n_edge = len(slab_axes) if emit_edges else 0

    def kernel(*args):
        args = list(args)
        y_hbm = args.pop(0)
        y_slabs = _slab_ref_dict(slab_axes, args[:n_slabs])
        del args[:n_slabs]
        if has_approx:
            a_hbm = args.pop(0)
            a_slabs = _slab_ref_dict(slab_axes, args[:n_slabs])
            del args[:n_slabs]
        else:
            a_hbm, a_slabs = None, {}
        out_ref = args.pop(0)
        edge_refs = args[:n_edge]
        del args[:n_edge]
        if emit_edges:
            bufs, sems, sem_edge = args
        else:
            bufs, sems = args
        grid_ids = [pl.program_id(ax) for ax in range(n_lead)]

        def seg_copies(b, slot):
            kind, idx = band_src[b]
            src_ref = a_hbm if kind == "a" else y_hbm
            refs = a_slabs if kind == "a" else y_slabs
            return _seg_copies_one(
                src_ref, bufs, sems.at[np.int32(slot)], shape_sp, tiles,
                halos, grid_ids,
                band_idx=None if kind == "a" else idx,
                slot=slot, padded=padded, slab_axes=slab_axes,
                slab_refs=refs, wrap_axes=wrap_axes,
            )

        acc = _stream_band_tree(nb, ndim, tiles, halos, taps_np_tuple,
                                bufs, NSLOT, seg_copies,
                                lane_logical=lane_logical)
        if scale != 1.0:
            acc = acc * scale
        out_ref[...] = acc.astype(out_ref.dtype)
        if emit_edges:
            edge_cps = _edge_copies(
                out_ref, edge_refs, sem_edge, shape_sp, tiles, halos,
                grid_ids, slab_axes,
            )
            for c in edge_cps:
                c.start()
            for c in edge_cps:
                c.wait()

    return kernel


def _fused_rec_level(y_all, approx, band_src, taps_np, scale, shape=None,
                     padded=None, slab_axes=(), y_slabs=(), a_slabs=(),
                     emit_edges=False, wrap_axes=(), lane_logical=None):
    """Concat 'valid' mode (``shape``/``padded``): band arrays already
    halo-padded on the ``padded`` leading axes by the ``_rec_halos``
    widths; ``shape`` is the unpadded output shape. Slab 'valid' mode
    (``slab_axes``/``y_slabs``/``a_slabs``): sources stay unpadded and the
    slab axes' neighbors ride in small slab operands (per-axis slabs then
    the corner; see ``_seg_copies_one``). ``emit_edges``: additionally
    emit one ``[my tail | my head]`` edges output per slab axis (the next
    level's ``a_slabs`` source, see ``_edge_copies``); returns
    ``(acc, *edges)``."""
    if shape is None:
        shape = y_all.shape[1:]
    ndim = len(shape)
    tiles = _rec_tiles(shape, taps_np, masked_lanes=lane_logical is not None)
    if tiles is None:
        return None

    n_lead = ndim - 1
    grid = tuple(shape[ax] // tiles[ax] for ax in range(n_lead))
    halos = _rec_halos(ndim, taps_np)
    buf_rows = [
        tiles[ax] + halos[ax][0] + halos[ax][1] for ax in range(n_lead)
    ]
    buf_tile = (3,) + tuple(buf_rows) + (shape[-1],)

    operands = (y_all,) + tuple(y_slabs)
    if approx is not None:
        operands = operands + (approx,) + tuple(a_slabs)
    out_specs = pl.BlockSpec(
        tuple(tiles) + (shape[-1],),
        lambda *gi: gi + (np.int32(0),),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct(shape, y_all.dtype)
    scratch = [
        pltpu.VMEM(buf_tile, y_all.dtype),
        pltpu.SemaphoreType.DMA((3,)),
    ]
    if emit_edges:
        e_specs, e_shapes = _edge_out(shape, halos, slab_axes, y_all.dtype)
        out_specs = tuple([out_specs] + e_specs)
        out_shape = tuple([out_shape] + e_shapes)
        scratch.append(pltpu.SemaphoreType.DMA((4,)))
    return pl.pallas_call(
        _make_rec_kernel(ndim, tiles, shape, taps_np, band_src, scale,
                         padded, tuple(slab_axes), emit_edges=emit_edges,
                         wrap_axes=tuple(wrap_axes),
                         lane_logical=lane_logical),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(operands),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(*operands)


def _make_rec_multi_kernel(ndim, tiles, shape_sp, taps_np_tuple, level,
                           scale, nping):
    """Whole multilevel synthesis in one kernel: grid = (level, *tiles),
    level slowest. Per level, band 0 streams from y (level 0) or the ping
    slot written by the previous level (predicated source pair); detail
    bands stream from y at the traced affine position ``lvl*(2^d-1) + b``.
    The per-level result goes to the other ping slot, or to the output at
    the final level. The write is waited in-step: with a single-tile
    spatial grid the NEXT grid step (the next level) reads it immediately."""
    nb = 2**ndim
    n_lead = ndim - 1
    NSLOT = 3
    halos = _rec_halos(ndim, taps_np_tuple)

    def kernel(y_hbm, out_ref, ping_ref, bufs, sems, stage, sem_out):
        lvl = pl.program_id(0)
        grid_ids = [pl.program_id(1 + ax) for ax in range(n_lead)]
        first = lvl == np.int32(0)
        final = lvl == np.int32(level - 1)
        pidx = jax.lax.rem(lvl + np.int32(nping - 1), np.int32(nping))

        def seg_copies(b, slot):
            if b == 0:
                return [
                    _CondCopy(first, c)
                    for c in _seg_copies_one(
                        y_hbm, bufs, sems.at[np.int32(slot)], shape_sp,
                        tiles, halos, grid_ids, band_idx=0, slot=slot,
                    )
                ] + [
                    _CondCopy(jnp.logical_not(first), c)
                    for c in _seg_copies_one(
                        ping_ref, bufs, sems.at[np.int32(slot)], shape_sp,
                        tiles, halos, grid_ids, band_idx=pidx, slot=slot,
                    )
                ]
            idx = lvl * np.int32(nb - 1) + np.int32(b)
            return _seg_copies_one(
                y_hbm, bufs, sems.at[np.int32(slot)], shape_sp, tiles,
                halos, grid_ids, band_idx=idx, slot=slot,
            )

        acc = _stream_band_tree(nb, ndim, tiles, halos, taps_np_tuple,
                                bufs, NSLOT, seg_copies)
        if scale != 1.0:
            acc = acc * scale
        stage[...] = acc.astype(stage.dtype)
        wslot = jax.lax.rem(lvl, np.int32(nping))
        sp_idx = tuple(
            pl.ds(grid_ids[ax] * np.int32(tiles[ax]), tiles[ax])
            for ax in range(n_lead)
        ) + (slice(None),)
        cps = [
            _CondCopy(final, pltpu.make_async_copy(
                stage, out_ref.at[sp_idx], sem_out,
            )),
            _CondCopy(jnp.logical_not(final), pltpu.make_async_copy(
                stage, ping_ref.at[(wslot,) + sp_idx], sem_out,
            )),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()

    return kernel


def _rec_multi_tiles(shape, dtype, taps_np, level):
    """Tile choice for the one-launch multilevel synthesis, or None when
    the config doesn't qualify: the in-VMEM out stage adds one tile to
    ``_rec_tiles``' live-words model."""
    ndim = len(shape)
    if level < 2 or ndim < 2 or not _supported(shape, dtype):
        return None
    if int(np.prod(shape)) > _MULTI_MAX_VOX:
        return None
    tiles = _rec_tiles(shape, taps_np)
    if tiles is None:
        return None
    stage_words = int(np.prod(tiles)) * shape[-1]
    halos = _rec_halos(ndim, taps_np)
    buf_rows = [
        tiles[ax] + halos[ax][0] + halos[ax][1] for ax in range(ndim - 1)
    ]
    buf_words = int(np.prod(buf_rows)) * shape[-1]
    # + buf_words + stage_words: upper bound on the tree reduction's held
    # stack partials (_stream_band_tree).
    if 5 * buf_words + 4 * stage_words > 3_400_000:
        return None
    return tiles


def multi_feasible(shape, dtype, taps_np, level: int) -> bool:
    """True when BOTH one-launch multilevel kernels serve this config —
    the dispatch preference point for plan.dec_rec (multilevel tiled beats
    the resident pair kernel on every measured >=256^2-class shape)."""
    if level < 2 or len(shape) < 2 or not _supported(shape, dtype):
        return False
    if int(np.prod(shape)) > _MULTI_MAX_VOX:
        return False
    if _dec_tiles(shape, taps_np) is None:
        return False
    return _rec_multi_tiles(shape, dtype, taps_np, level) is not None


def _fused_rec_multi(y, taps_np, level: int, preserve_l2: bool):
    """Whole multilevel synthesis in ONE pallas_call (unsharded tiled
    path); returns the reconstructed (*s) array, or None when the
    shape/level doesn't qualify (see ``_rec_multi_tiles``)."""
    shape = y.shape[1:]
    ndim = len(shape)
    tiles = _rec_multi_tiles(shape, y.dtype, taps_np, level)
    if tiles is None:
        return None
    halos = _rec_halos(ndim, taps_np)
    buf_rows = [
        tiles[ax] + halos[ax][0] + halos[ax][1] for ax in range(ndim - 1)
    ]
    nb = 2**ndim
    scale = 1.0 if preserve_l2 else 1.0 / nb
    nping = 1 if level == 2 else 2
    grid = (level,) + tuple(shape[ax] // tiles[ax] for ax in range(ndim - 1))
    return pl.pallas_call(
        _make_rec_multi_kernel(ndim, tiles, shape, taps_np, level, scale,
                               nping),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(shape, y.dtype),
            jax.ShapeDtypeStruct((nping,) + shape, y.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((3,) + tuple(buf_rows) + (shape[-1],), y.dtype),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.VMEM(tuple(tiles) + (shape[-1],), y.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(y)[0]


def _rec_transpose_scales(ndim, level, dtype):
    """Per-band scales of the NOT-preserve_l2 synthesis transpose: the
    transpose is the analysis cascade with each level-application
    multiplied by 1/2^d, so the group at depth l carries (1/2^d)^l
    (deepest approx + deepest details: l = level)."""
    nb = 2**ndim
    B = nb + (nb - 1) * (level - 1)
    s = np.empty((B,), np.float64)
    s[:nb] = (1.0 / nb) ** level
    pos = nb
    for depth in range(level - 1, 0, -1):
        s[pos : pos + nb - 1] = (1.0 / nb) ** depth
        pos += nb - 1
    return s.astype(dtype)


def rec_pallas(y, taps, level: int, preserve_l2: bool):
    """Multilevel synthesis via the fused level kernel; input (B, *s).

    Concat-free multilevel: each level's kernel streams band 0 from the
    previous level's output array and the detail bands from the original
    band array at a static offset, so no per-level group is materialized.

    ``taps`` must be host NumPy arrays (kernel constants); see
    :func:`dec_pallas`. Differentiable via ``linear_call`` (the transpose
    is the analysis cascade, with the per-level ``1/2^d`` redistributed
    onto the band groups when not ``preserve_l2``)."""
    from jax.custom_derivatives import linear_call

    taps_np = tuple(np.asarray(t) for t in taps)
    ndim = y.ndim - 1

    def trans(_, xbar):
        z = _dec_dispatch(xbar, taps_np, level)
        if not preserve_l2:
            sc = jnp.asarray(_rec_transpose_scales(ndim, level, np.float32))
            z = z * sc.astype(z.dtype).reshape((-1,) + (1,) * ndim)
        return z

    return linear_call(
        lambda _, v: _rec_dispatch(v, taps_np, level, preserve_l2),
        trans, (), y,
    )


def _rec_dispatch(y, taps_np, level: int, preserve_l2: bool):
    ndim = y.ndim - 1
    shape = y.shape[1:]
    from . import pallas_flat, pallas_resident

    if ndim == 1 and pallas_flat.flat_supported(shape, y.dtype, taps_np):
        return pallas_flat.rec_flat(y, taps_np, level, preserve_l2)
    if ndim > 1 and level > 1:
        # Mirror of the dec dispatch: one-launch multilevel beats resident
        # on every tileable >=256^2-class shape (see _dec_dispatch).
        acc = _fused_rec_multi(y, taps_np, level, preserve_l2)
        if acc is not None:
            return acc
    if pallas_resident.resident_supported(shape, y.dtype, taps_np):
        return pallas_resident.rec_resident(y, taps_np, level, preserve_l2)
    if ndim == 4:
        from . import pallas_4d

        if pallas_4d.supported(shape, y.dtype, taps_np):
            return pallas_4d.rec4(y, taps_np, level, preserve_l2)
    if not _supported(shape, y.dtype) or _rec_tiles(shape, taps_np) is None:
        from . import pallas_flat, pallas_ragged

        if pallas_flat.flat_supported(shape, y.dtype, taps_np):
            return pallas_flat.rec_flat(y, taps_np, level, preserve_l2)
        ragged_ok = pallas_ragged.supported(shape, y.dtype, taps_np)
        padded_ok = _padded_supported(shape, y.dtype, taps_np)
        from . import pallas_padded

        if padded_ok and (
            not ragged_ok
            or pallas_padded.inflation(shape)
            <= pallas_padded.PREFER_INFLATION
        ):
            return pallas_padded.rec_padded(y, taps_np, level, preserve_l2)
        if ragged_ok:
            return pallas_ragged.rec_ragged(y, taps_np, level, preserve_l2)
        if jax.default_backend() not in ("cpu",):
            raise RuntimeError(
                f"no Pallas variant serves shape {shape} {y.dtype} on an "
                "accelerator backend; refusing the hazardous XLA direct "
                "fallback (run on CPU instead)"
            )
        taps_y = tuple(t.astype(y.dtype) for t in taps_np)
        return direct_path.rec_direct(y, taps_y, level, preserve_l2)
    nb = 2**ndim
    scale = 1.0 if preserve_l2 else 1.0 / nb

    band_src = [("y", b) for b in range(nb)]
    acc = _fused_rec_level(y, None, band_src, taps_np, scale)
    pos = nb
    for _ in range(1, level):
        band_src = [("a", 0)] + [("y", pos + b - 1) for b in range(1, nb)]
        acc = _fused_rec_level(y, acc, band_src, taps_np, scale)
        pos += nb - 1
    return acc
