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
        for tx in (256, 128, 64, 32, 16, 8):
            if shape[0] % tx:
                continue
            ext = _round8(tx + max_k - 1)
            if mode == "dec":
                words = ext * n + 2 * ext * n + 4 * tx * n
            else:
                words = 4 * ext * n + 2 * ext * n + tx * n
            if words <= budget:
                return (tx,)
        return None
    z = shape[-1]
    for tx, ty in ((8, 64), (8, 32), (8, 16), (8, 8)):
        if shape[0] % tx or shape[1] % ty:
            continue
        ex = _round8(tx + max_k - 1)
        ey = _round8(ty + max_k - 1)
        if mode == "dec":
            words = ex * ey * z + 2 * ex * ey * z + 4 * ex * ty * z + 8 * tx * ty * z
        else:
            words = 8 * ex * ey * z + 4 * ex * ey * z + 2 * ex * ty * z + tx * ty * z
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


def _make_rec_kernel(ndim, tiles, taps_np_tuple):
    nb = 2**ndim

    def kernel(y_hbm, out_ref, in_vmem, sem):
        idx = (slice(None),) + tuple(
            pl.ds(pl.program_id(ax) * tiles[ax], in_vmem.shape[ax + 1])
            for ax in range(ndim - 1)
        ) + (slice(None),)
        dma = pltpu.make_async_copy(y_hbm.at[idx], in_vmem, sem)
        dma.start()
        dma.wait()

        # vals indexed by engine band order (bit k = axis k, bit0 fastest);
        # collapse the MSB (axis ndim-1) first, mirroring the dec kernel.
        vals = [in_vmem[b] for b in range(nb)]
        for ax in reversed(range(ndim)):
            taps_rev = taps_np_tuple[ax][:, ::-1]
            K = taps_rev.shape[1]
            o_adj = K - 1 - (K // 2 - 1)  # = K//2, the adjoint anchor
            use_roll = ax == ndim - 1
            ext = None if use_roll else tiles[ax]
            half = len(vals) // 2
            new_vals = []
            for i in range(half):
                lo_v, hi_v = vals[i], vals[i + half]
                pair_taps = np.stack([taps_rev[0], taps_rev[1]])
                acc = None
                for j in range(K):
                    if use_roll:
                        shift = (o_adj - j) % lo_v.shape[ax]
                        rl = (
                            pltpu.roll(lo_v, np.int32(shift), axis=ax)
                            if shift
                            else lo_v
                        )
                        rh = (
                            pltpu.roll(hi_v, np.int32(shift), axis=ax)
                            if shift
                            else hi_v
                        )
                    else:
                        idx2 = [slice(None)] * lo_v.ndim
                        idx2[ax] = slice(j, j + ext)
                        rl = lo_v[tuple(idx2)]
                        rh = hi_v[tuple(idx2)]
                    term = float(pair_taps[0, j]) * rl + float(pair_taps[1, j]) * rh
                    acc = term if acc is None else acc + term
                new_vals.append(acc)
            vals = new_vals
        out_ref[...] = vals[0]

    return kernel


def _fused_rec_level(y, taps_np):
    nb = y.shape[0]
    shape = y.shape[1:]
    ndim = len(shape)
    max_k = max(t.shape[1] for t in taps_np)
    tiles = _tile_plan(shape, max_k, "rec")
    if tiles is None:
        return None

    pads = [(0, 0)]  # band axis
    exts = []
    for ax in range(ndim - 1):
        K = taps_np[ax].shape[1]
        o = K // 2 - 1
        ext = tiles[ax] + K - 1
        ext8 = _round8(ext)
        exts.append(ext8)
        pads.append((K - 1 - o, o + (ext8 - ext)))  # adjoint halo is mirrored
    yp = _circ_pad_axes(y, pads)

    grid = tuple(shape[ax] // tiles[ax] for ax in range(ndim - 1))
    in_tile = (nb,) + tuple(exts) + (shape[-1],)

    return pl.pallas_call(
        _make_rec_kernel(ndim, tiles, taps_np),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            tuple(tiles) + (shape[-1],),
            lambda *gi: gi + (np.int32(0),),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(shape, y.dtype),
        scratch_shapes=[
            pltpu.VMEM(in_tile, y.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(yp)


def rec_pallas(y, taps, level: int, preserve_l2: bool):
    """Multilevel synthesis via the fused level kernel; input (B, *s).

    ``taps`` must be host NumPy arrays (kernel constants); see
    :func:`dec_pallas`."""
    taps_np = tuple(np.asarray(t) for t in taps)
    ndim = y.ndim - 1
    shape = y.shape[1:]
    if not _supported(shape, y.dtype) or _tile_plan(
        shape, max(t.shape[1] for t in taps_np), "rec"
    ) is None:
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
