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
* **leading** spatial axes are circular-pre-padded once in XLA (one cheap
  copy) so in-kernel halo loads are plain contiguous DMAs with no wrap
  logic;
* filter taps are baked in as Python floats (plan constants), so the inner
  loops are pure VPU multiply-adds.

Band-order contract (identical to ``ops/direct_path.py``): engine band index
``b`` has bit ``k`` = high-pass on spatial axis ``k``, bit 0 fastest
(reference order, ``Functions/nd_dwt_3D.m:334-341``). The kernel processes
axes last->first, so axis k's selector lands at position ``ndim-1-k`` of the
internal list index — the write-out loop bit-reverses.

Synthesis is the exact adjoint: correlation with time-reversed taps at the
mirrored anchor (``o' = K-1-o``), summed over band pairs.

Supported: 2D/3D, float32/bfloat16, last axis a multiple of 128, leading
axes divisible by a feasible tile. The dispatcher (``dec_pallas`` /
``rec_pallas``) falls back to the XLA direct path otherwise, so the plan's
``path='pallas'`` is always safe.
"""

from __future__ import annotations

import functools

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


def _tile_plan(shape, max_k, mode):
    """Leading-axis tile sizes under the 16MB scoped-VMEM budget, or None.

    ``mode='dec'`` holds 1 halo'd input tile and fans out to 2^d band
    tiles; ``mode='rec'`` holds 2^d halo'd band tiles and collapses to 1 —
    its input dominates, so its tiles must be much smaller. Mosaic's
    scoped-vmem accounting runs ~1.6x this stage-sum estimate (measured:
    a 16.7MB estimate compiled to a 27.29M scoped allocation against the
    16M limit), so the budget below is set to ~8MB of estimated live words.
    """
    ndim = len(shape)
    if ndim not in (2, 3):
        return None
    if shape[-1] % 128:
        return None
    # Measured Mosaic-scoped/estimate ratio ~2.4x (a 1.7M-word estimate
    # compiled to a 16.22M scoped allocation); keep estimates <=1.2M words.
    budget = 1_200_000  # f32 words
    if ndim == 2:
        n = shape[-1]
        for tx in (512, 256, 128, 64, 32, 16, 8):
            if shape[0] % tx:
                continue
            ext = _round8(tx + max_k - 1)
            if mode == "dec":
                words = ext * n + 2 * ext * n + 4 * tx * n
            else:
                # streaming rec: 2 DMA buffers + 1 pass temp + acc + out
                words = 2 * ext * n + ext * n + 2 * tx * n
            if words <= budget:
                return (tx,)
        return None
    z = shape[-1]
    for tx, ty in (
        (32, 128), (16, 128), (32, 64), (16, 64), (8, 64),
        (8, 32), (8, 16), (8, 8),
    ):
        if shape[0] % tx or shape[1] % ty:
            continue
        ex = _round8(tx + max_k - 1)
        ey = _round8(ty + max_k - 1)
        if mode == "dec":
            words = ex * ey * z + 2 * ex * ey * z + 4 * ex * ty * z + 8 * tx * ty * z
        else:
            # streaming rec: 2 DMA buffers + z-pass temp + y-pass temp +
            # contribution + accumulator
            words = 2 * ex * ey * z + ex * ey * z + ex * ty * z + 2 * tx * ty * z
        if words <= budget:
            return (tx, ty)
    return None


def _supported(shape, dtype):
    return (
        len(shape) in (2, 3)
        and jnp.dtype(dtype) in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))
    )


def _circ_pad_axes(x, pads):
    """Circularly pad axis ``ax`` of ``x`` by pads[ax] = (left, right)."""
    for ax, (lw, rw) in enumerate(pads):
        if not (lw or rw):
            continue
        n = x.shape[ax]
        parts = []
        if lw:
            parts.append(jax.lax.slice_in_dim(x, n - lw, n, axis=ax))
        parts.append(x)
        if rw:
            parts.append(jax.lax.slice_in_dim(x, 0, rw, axis=ax))
        x = jnp.concatenate(parts, axis=ax)
    return x


def _pass_pair(v, taps_np, axis, o, use_roll, out_extent):
    """(lo, hi) correlation pair along ``axis`` of one in-VMEM array.

    ``use_roll``: periodic wrap via lane rotate (resident last axis);
    otherwise static halo slices (leading axes, input pre-padded).
    """
    K = taps_np.shape[1]
    acc_lo = None
    acc_hi = None
    for j in range(K):
        if use_roll:
            shift = (o - j) % v.shape[axis]
            # np.int32: under jax_enable_x64 a Python int lowers to i64,
            # which tpu.dynamic_rotate rejects.
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


def _make_dec_kernel(ndim, tiles, taps_np_tuple):
    nb = 2**ndim

    def kernel(x_hbm, out_ref, in_vmem, sem):
        idx = tuple(
            pl.ds(pl.program_id(ax) * tiles[ax], in_vmem.shape[ax])
            for ax in range(ndim - 1)
        ) + (slice(None),)
        dma = pltpu.make_async_copy(x_hbm.at[idx], in_vmem, sem)
        dma.start()
        dma.wait()

        vals = [in_vmem[...]]
        for ax in reversed(range(ndim)):
            taps_np = taps_np_tuple[ax]
            o = taps_np.shape[1] // 2 - 1
            use_roll = ax == ndim - 1
            ext = None if use_roll else tiles[ax]
            new_lo, new_hi = [], []
            for v in vals:
                lo, hi = _pass_pair(v, taps_np, ax, o, use_roll, ext)
                new_lo.append(lo)
                new_hi.append(hi)
            vals = new_lo + new_hi  # newest axis bit = MSB of list index
        for b in range(nb):
            v = 0
            for ax in range(ndim):
                v |= ((b >> ax) & 1) << (ndim - 1 - ax)
            out_ref[b] = vals[v]

    return kernel


def _fused_dec_level(x, taps_np):
    ndim = x.ndim
    shape = x.shape
    nb = 2**ndim
    max_k = max(t.shape[1] for t in taps_np)
    tiles = _tile_plan(shape, max_k, "dec")
    if tiles is None:
        return None

    pads = []
    exts = []
    for ax in range(ndim - 1):
        K = taps_np[ax].shape[1]
        o = K // 2 - 1
        ext = tiles[ax] + K - 1
        ext8 = _round8(ext)
        exts.append(ext8)
        # Right-pad past the halo up to the rounded DMA extent; the kernel's
        # slices never touch the surplus rows.
        pads.append((o, K - 1 - o + (ext8 - ext)))
    xp = _circ_pad_axes(x, pads)

    grid = tuple(shape[ax] // tiles[ax] for ax in range(ndim - 1))
    in_tile = tuple(exts) + (shape[-1],)

    return pl.pallas_call(
        _make_dec_kernel(ndim, tiles, taps_np),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (nb,) + tuple(tiles) + (shape[-1],),
            # np.int32 literals: Python ints lower to i64 under
            # jax_enable_x64, which Mosaic's index maps reject.
            lambda *gi: (np.int32(0),) + gi + (np.int32(0),),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nb,) + shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM(in_tile, x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp)


def dec_pallas(x, taps, level: int):
    """Multilevel analysis via the fused level kernel; returns (B, *s).

    ``taps`` must be host NumPy arrays (they are baked into the kernel as
    constants). Falls back to the XLA direct path for unsupported
    shapes/dtypes. Not itself jitted — wrap the caller in ``jax.jit``.
    """
    taps_np = tuple(np.asarray(t) for t in taps)
    if not _supported(x.shape, x.dtype) or _tile_plan(
        x.shape, max(t.shape[1] for t in taps_np), "dec"
    ) is None:
        return direct_path.dec_direct(x, taps, level)
    groups = []
    approx = x
    for _ in range(level):
        bands = _fused_dec_level(approx, taps_np)
        approx = bands[0]
        groups.append(bands[1:])
    parts = [approx[None]]
    for g in reversed(groups):
        parts.append(g)
    return jnp.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# Synthesis
# ---------------------------------------------------------------------------


def _rec_tiles(shape, taps_np):
    """Tile choice for the streaming rec kernel (larger than the tree
    kernel's — only one band tile is resident at a time)."""
    ndim = len(shape)
    if shape[-1] % 128:
        return None
    if ndim == 2:
        for tx in (512, 256, 128, 64, 32, 16):
            if shape[0] % tx == 0:
                return (tx,)
        return None
    for tx, ty in ((32, 32), (16, 32), (16, 16), (8, 16), (8, 8)):
        if shape[0] % tx == 0 and shape[1] % ty == 0:
            # live words ~ 2 bufs + chain temp + acc; keep under ~10MB
            K0, K1 = taps_np[0].shape[1], taps_np[1].shape[1]
            ex0 = tx + K0 - 1  # outer axis: exact halo
            ex1 = ty + 2 * _round8(K1 // 2)  # sublane axis: 8-aligned
            z = shape[-1]
            live = 2 * ex0 * ex1 * z + ex0 * ex1 * z + 2 * tx * ty * z
            if live <= 2_600_000:
                return (tx, ty)
    return None


def _make_rec_kernel(ndim, tiles, shape_sp, taps_np_tuple):
    """Streaming synthesis kernel: one band tile in flight (double-buffered
    9-segment wrap DMA straight from the unpadded band array), contributions
    accumulated in VMEM. No XLA pre-pad — the periodic wrap is handled by
    the L/C/R segment loads (all extents static multiples of 8, the
    empirically required DMA granularity)."""
    nb = 2**ndim
    n_lead = ndim - 1
    # Halo widths per leading axis. Only the sublane dimension (the last
    # leading axis) requires 8-aligned DMA extents/starts (probed on v5e:
    # odd sublane extents fail, outer-dim extents/starts are free), so
    # outer axes use the exact adjoint halo.
    halos = []
    for ax in range(n_lead):
        K = taps_np_tuple[ax].shape[1]
        h_l, h_r = K // 2, K // 2 - 1  # adjoint halo
        if ax == n_lead - 1:
            W = _round8(max(h_l, h_r))
            halos.append((W, W, True))
        else:
            halos.append((h_l, h_r, False))

    def kernel(y_hbm, out_ref, bufs, sems):
        grid_ids = [pl.program_id(ax) for ax in range(n_lead)]

        def seg_copies(b, slot):
            # L/C/R segments per leading axis; cross product = rectangles.
            per_axis = []
            for ax in range(n_lead):
                N = shape_sp[ax]
                t = tiles[ax]
                w_l, w_r, aligned = halos[ax]
                i = grid_ids[ax]
                # np.int32 everywhere: x64 mode must not promote to i64.
                base = i * np.int32(t)
                sL = jax.lax.rem(base + np.int32(N - w_l), np.int32(N))
                sC = base
                sR = jax.lax.rem(base + np.int32(t), np.int32(N))
                if aligned:
                    # pl.multiple_of: Mosaic must prove sublane alignment
                    # of the dynamic wrap starts.
                    sL = pl.multiple_of(sL, 8)
                    sC = pl.multiple_of(sC, 8)
                    sR = pl.multiple_of(sR, 8)
                segs = [(sL, 0, w_l), (sC, w_l, t), (sR, w_l + t, w_r)]
                # db1's adjoint right halo is zero — drop empty segments.
                per_axis.append([s for s in segs if s[2] > 0])
            combos = [[]]
            for segs in per_axis:
                combos = [c + [s] for c in combos for s in segs]
            copies = []
            for combo in combos:
                # np.int32 scalar indices: Python ints lower to i64 under
                # jax_enable_x64, which tpu.memref_slice rejects.
                src = (np.int32(b),) + tuple(
                    pl.ds(s, e) for s, _, e in combo
                ) + (slice(None),)
                dst = (np.int32(slot),) + tuple(
                    slice(off, off + e) for _, off, e in combo
                ) + (slice(None),)
                copies.append(
                    pltpu.make_async_copy(
                        y_hbm.at[src], bufs.at[dst], sems.at[np.int32(slot)]
                    )
                )
            return copies

        for c in seg_copies(0, 0):
            c.start()
        acc = None
        for b in range(nb):
            slot = b % 2
            if b + 1 < nb:
                for c in seg_copies(b + 1, (b + 1) % 2):
                    c.start()
            for c in seg_copies(b, slot):
                c.wait()
            v = bufs[np.int32(slot)]
            # Separable adjoint of this band: leading axes first so the
            # working extents shrink before the lane-roll pass (lower peak
            # VMEM liveness). The over-wide W-halo is absorbed into the
            # slice starts (no trimming copy: every live VMEM value counts
            # against the 16MB scoped limit).
            for ax in range(ndim):
                sel = (b >> ax) & 1
                trow = taps_np_tuple[ax][sel][::-1]
                K = len(trow)
                o_adj = K // 2
                a2 = None
                for j in range(K):
                    if ax == ndim - 1:
                        shift = (o_adj - j) % v.shape[-1]
                        r = (
                            pltpu.roll(v, np.int32(shift), axis=v.ndim - 1)
                            if shift
                            else v
                        )
                    else:
                        # slice start: w_l - h_l skips surplus halo rows
                        # (h_l = K-1-o = K//2 for the adjoint anchor; zero
                        # surplus on outer axes).
                        h_l = K // 2
                        start = halos[ax][0] - h_l + j
                        idx2 = [slice(None)] * v.ndim
                        idx2[ax] = slice(start, start + tiles[ax])
                        r = v[tuple(idx2)]
                    term = float(trow[j]) * r
                    a2 = term if a2 is None else a2 + term
                v = a2
            acc = v if acc is None else acc + v
        out_ref[...] = acc

    return kernel


def _fused_rec_level(y, taps_np):
    nb = y.shape[0]
    shape = y.shape[1:]
    ndim = len(shape)
    tiles = _rec_tiles(shape, taps_np)
    if tiles is None:
        return None

    n_lead = ndim - 1
    grid = tuple(shape[ax] // tiles[ax] for ax in range(n_lead))
    buf_rows = []
    for ax in range(n_lead):
        K = taps_np[ax].shape[1]
        if ax == n_lead - 1:
            W = _round8(max(K // 2, K // 2 - 1))
            buf_rows.append(tiles[ax] + 2 * W)
        else:
            buf_rows.append(tiles[ax] + K - 1)
    buf_tile = (2,) + tuple(buf_rows) + (shape[-1],)

    return pl.pallas_call(
        _make_rec_kernel(ndim, tiles, shape, taps_np),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            tuple(tiles) + (shape[-1],),
            lambda *gi: gi + (np.int32(0),),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(shape, y.dtype),
        scratch_shapes=[
            pltpu.VMEM(buf_tile, y.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(y)


def rec_pallas(y, taps, level: int, preserve_l2: bool):
    """Multilevel synthesis via the fused level kernel; input (B, *s).

    ``taps`` must be host NumPy arrays (kernel constants); see
    :func:`dec_pallas`."""
    taps_np = tuple(np.asarray(t) for t in taps)
    ndim = y.ndim - 1
    shape = y.shape[1:]
    if not _supported(shape, y.dtype) or _rec_tiles(shape, taps_np) is None:
        return direct_path.rec_direct(y, taps, level, preserve_l2)
    nb = 2**ndim

    def synth(group):
        acc = _fused_rec_level(group, taps_np)
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
