"""Resident whole-array Pallas kernels for small transforms.

For arrays that fit in VMEM (1D signals, images up to ~512^2 f32), the
tiled kernels in ``pallas_kernels.py`` are launch-latency-bound: a 3-level
2D pair costs ~8 kernel launches plus XLA glue (~5.7 ms measured for 512^2
on the available v5e, vs ~0.3 ms of actual data movement). These kernels
run the ENTIRE multilevel transform in one ``pallas_call``: the array stays
resident in VMEM, every circular wrap is a roll (no halo machinery), levels
are unrolled in-register, and the only HBM traffic is the mathematically
required band reads/writes via per-band DMAs.

1D arrays are lifted to (1, N) so the signal occupies the lane dimension.

Used automatically by ``dec_pallas``/``rec_pallas`` when
:func:`resident_supported` holds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working-set budget in f32 words. Mosaic materializes every roll of
# the unrolled correlation chains on its scoped stack (a 512^2 K=8 kernel
# compiled to a 28MB scoped allocation), so the practical ceiling is far
# below the naive working-set estimate; 512^2 stays on the tiled kernels.
_BUDGET_WORDS = 1_300_000


def _lifted_shape(shape):
    return (1,) + tuple(shape) if len(shape) == 1 else tuple(shape)


def resident_supported(shape, dtype, taps_np) -> bool:
    if len(shape) not in (1, 2):
        return False
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return False
    ls = _lifted_shape(shape)
    if ls[-1] % 128:
        return False
    numel = int(np.prod(ls))
    nb = 2 ** len(shape)
    return numel * (nb + 4) <= _BUDGET_WORDS


def _roll(v, shift, axis):
    shift = shift % v.shape[axis]
    return pltpu.roll(v, np.int32(shift), axis=axis) if shift else v


def _corr_roll(v, trow, axis, o):
    """y[n] = sum_j t[j] v[n+j-o] via resident rolls."""
    acc = None
    for j, t in enumerate(trow):
        r = _roll(v, o - j, axis)
        term = float(t) * r
        acc = term if acc is None else acc + term
    return acc


def _make_res_dec_kernel(ndim_sp, lifted, taps_np_tuple, level, B, nb):
    # Spatial axis k of the original array maps to lifted axis
    # k + (len(lifted) - ndim_sp).
    ax_off = len(lifted) - ndim_sp

    def kernel(x_hbm, out_hbm, xbuf, stage, sem_in, sem_out):
        dma = pltpu.make_async_copy(x_hbm, xbuf, sem_in)
        dma.start()
        dma.wait()
        approx = xbuf[...]
        pending = []  # (band_index, stage_slot) of in-flight writes
        off = B

        def write_band(idx, val, slot):
            # Wait out the previous user of this stage slot, then DMA.
            stage[np.int32(slot)] = val
            c = pltpu.make_async_copy(
                stage.at[np.int32(slot)],
                out_hbm.at[np.int32(idx)],
                sem_out.at[np.int32(slot)],
            )
            c.start()
            return c

        inflight = [None, None]
        slot = 0
        for lvl in range(level):
            # Per-band recompute (d passes per band instead of the shared
            # fan-out tree): ~2x the VPU flops, but only one band value
            # live at a time — the resident kernel is VMEM-bound, not
            # compute-bound (a shared-tree variant blew the 16MB scoped
            # limit at 512^2 by 3MB).
            def band_val(b):
                v = approx
                for ax in range(ndim_sp):
                    taps_np = taps_np_tuple[ax]
                    o = taps_np.shape[1] // 2 - 1
                    v = _corr_roll(v, taps_np[(b >> ax) & 1], ax + ax_off, o)
                return v

            new_approx = band_val(0)
            off -= nb - 1
            for b in range(1, nb):
                if inflight[slot] is not None:
                    inflight[slot].wait()
                inflight[slot] = write_band(off + b - 1, band_val(b), slot)
                slot ^= 1
            approx = new_approx
        if inflight[slot] is not None:
            inflight[slot].wait()
        inflight[slot] = write_band(0, approx, slot)
        for c in inflight:
            if c is not None:
                c.wait()

    return kernel


def dec_resident(x, taps_np, level: int):
    """Whole-array multilevel analysis in one kernel; returns (B, *shape)."""
    shape = x.shape
    ndim_sp = len(shape)
    nb = 2**ndim_sp
    B = nb + (nb - 1) * (level - 1)
    lifted = _lifted_shape(shape)
    xl = x.reshape(lifted)

    out = pl.pallas_call(
        _make_res_dec_kernel(ndim_sp, lifted, taps_np, level, B, nb),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B,) + lifted, x.dtype),
        scratch_shapes=[
            pltpu.VMEM(lifted, x.dtype),
            pltpu.VMEM((2,) + lifted, x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xl)
    return out.reshape((B,) + shape)


def _make_res_rec_kernel(ndim_sp, lifted, taps_np_tuple, level, nb, scale):
    ax_off = len(lifted) - ndim_sp

    def kernel(y_hbm, out_hbm, bufs, stage, sem_in, sem_out):
        # Band read order across the whole multilevel synthesis.
        reads = []  # hbm band index per step, or None for the VMEM approx
        pos = nb
        for lvl in range(level):
            if lvl == 0:
                reads.extend(range(nb))
            else:
                reads.append(None)
                reads.extend(range(pos, pos + nb - 1))
                pos += nb - 1

        def start_read(step, slot):
            idx = reads[step]
            if idx is None:
                return None
            c = pltpu.make_async_copy(
                y_hbm.at[np.int32(idx)],
                bufs.at[np.int32(slot)],
                sem_in.at[np.int32(slot)],
            )
            c.start()
            return c

        # Stride-1 prefetch on two slots: starting step+2 would overwrite
        # the slot still being consumed by the current step.
        inflight = {}
        if len(reads) > 0:
            inflight[0] = start_read(0, 0)

        acc = None
        step = 0
        for lvl in range(level):
            lvl_acc = None
            for b in range(nb):
                nxt = step + 1
                if nxt < len(reads):
                    inflight[nxt] = start_read(nxt, nxt % 2)
                c = inflight.pop(step, None)
                if c is not None:
                    c.wait()
                    v = bufs[np.int32(step % 2)]
                else:
                    v = acc  # running approximation, already in VMEM
                contrib = v
                for ax in range(ndim_sp):
                    trow = taps_np_tuple[ax][(b >> ax) & 1][::-1]
                    K = len(trow)
                    o_adj = K // 2
                    contrib = _corr_roll(contrib, trow, ax + ax_off, o_adj)
                lvl_acc = contrib if lvl_acc is None else lvl_acc + contrib
                step += 1
            acc = lvl_acc * scale if scale != 1.0 else lvl_acc
        stage[...] = acc
        c = pltpu.make_async_copy(stage, out_hbm, sem_out)
        c.start()
        c.wait()

    return kernel


def rec_resident(y, taps_np, level: int, preserve_l2: bool):
    """Whole-array multilevel synthesis in one kernel; input (B, *shape)."""
    B = y.shape[0]
    shape = y.shape[1:]
    ndim_sp = len(shape)
    nb = 2**ndim_sp
    scale = 1.0 if preserve_l2 else 1.0 / nb
    lifted = _lifted_shape(shape)
    yl = y.reshape((B,) + lifted)

    out = pl.pallas_call(
        _make_res_rec_kernel(ndim_sp, lifted, taps_np, level, nb, scale),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(lifted, y.dtype),
        scratch_shapes=[
            pltpu.VMEM((2,) + lifted, y.dtype),
            pltpu.VMEM(lifted, y.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )(yl)
    return out.reshape(shape)
