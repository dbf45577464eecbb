"""Resident whole-array Pallas kernels for small transforms.

For arrays that fit in VMEM (1D signals, images up to 512^2 f32), the tiled
kernels in ``pallas_kernels.py`` are launch-latency-bound: a 3-level 2D
pair costs ~8 kernel launches plus XLA glue (~6 ms measured for 512^2 on
the available v5e, vs ~0.3 ms of actual data movement). These kernels run
the ENTIRE multilevel transform in one ``pallas_call``: the array stays
resident in VMEM, every circular wrap is a roll, levels are unrolled, and
the only HBM traffic is the mathematically required band reads/writes.

Correlations accumulate inside ``lax.fori_loop`` with *dynamic* roll
amounts and taps read from an SMEM operand: Mosaic keeps every output of an
*unrolled* roll chain live on its 16MB scoped stack (a 512^2 K=8 unrolled
kernel compiled to a 28MB allocation), while the loop form holds one roll
at a time.

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

from .pallas_kernels import _compute_dtype, _tree_expand, _tree_reduce, _up

# VMEM working-set budget in f32 words: array x ~6 live copies (input,
# accumulator, one roll, stage buffers) — sized to admit 512^2 f32.
_BUDGET_WORDS = 1_600_000


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
    return numel * 6 <= _BUDGET_WORDS


def _corr_fori(v, taps_ref, sel, axis, o, reverse):
    """K-tap roll correlation as a fori_loop (one roll live at a time).

    ``reverse=False``: y[n] = sum_j t[j] v[n+j-o]  (roll by o-j).
    ``reverse=True`` : adjoint — reversed taps at the mirrored anchor:
    y[m] = sum_j t[K-1-j] v[m+j-(K-1-o)]  (roll by (K-1-o)-j).
    """
    K = taps_ref.shape[1]
    N = v.shape[axis]
    anchor = (K - 1 - o) if reverse else o

    # Explicit i32 while_loop: fori_loop promotes its index to i64 under
    # jax_enable_x64, and any i64 value (or i64->i32 convert) inside a
    # Pallas kernel sends Mosaic's convert_element_type lowering into
    # unbounded recursion.
    def cond(carry):
        return carry[0] < np.int32(K)

    def body(carry):
        j, acc = carry
        shift = jax.lax.rem(np.int32(anchor) - j + np.int32(16 * N), np.int32(N))
        r = pltpu.roll(v, shift, axis=axis)
        tap_idx = (np.int32(K - 1) - j) if reverse else j
        t = taps_ref[np.int32(sel), tap_idx]
        return (j + np.int32(1), acc + t * r)

    j0 = jnp.asarray(0, jnp.int32)
    return jax.lax.while_loop(cond, body, (j0, jnp.zeros_like(v)))[1]


def _make_res_dec_kernel(ndim_sp, lifted, Ks, level, B, nb):
    """Standalone analysis kernel: the shared ``_dec_phase`` body with no
    shrinkage (the fused pair kernel passes ``lam`` through the same
    helper — one home for the DMA/double-buffer/x64 invariants)."""
    ax_off = len(lifted) - ndim_sp

    def kernel(x_hbm, *rest):
        taps_refs = rest[:ndim_sp]
        out_hbm = rest[ndim_sp]
        xbuf, stage, sem_in, sem_out = rest[ndim_sp + 1 :]
        _dec_phase(
            x_hbm, taps_refs, out_hbm, xbuf, stage, sem_in, sem_out,
            ndim_sp, Ks, level, B, nb, ax_off, 0.0,
        )

    return kernel


def dec_resident(x, taps_np, level: int):
    """Whole-array multilevel analysis in one kernel; returns (B, *shape)."""
    shape = x.shape
    ndim_sp = len(shape)
    nb = 2**ndim_sp
    B = nb + (nb - 1) * (level - 1)
    lifted = _lifted_shape(shape)
    xl = x.reshape(lifted)
    Ks = tuple(t.shape[1] for t in taps_np)
    tdt = _compute_dtype(x.dtype)
    taps_ops = [jnp.asarray(t, tdt) for t in taps_np]

    out = pl.pallas_call(
        _make_res_dec_kernel(ndim_sp, lifted, Ks, level, B, nb),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [
            # explicit np.int32 index maps: auto-generated ones return
            # Python-int zeros, which lower to i64 under jax_enable_x64
            # and fail Mosaic legalization
            pl.BlockSpec(
                t.shape,
                lambda i: (np.int32(0), np.int32(0)),
                memory_space=pltpu.SMEM,
            )
            for t in taps_np
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B,) + lifted, x.dtype),
        scratch_shapes=[
            pltpu.VMEM(lifted, x.dtype),
            pltpu.VMEM((2,) + lifted, x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xl, *taps_ops)
    return out.reshape((B,) + shape)


def _dec_phase(x_hbm, taps_refs, out_hbm, xbuf, stage, sem_in, sem_out,
               ndim_sp, Ks, level, B, nb, ax_off, lam):
    """Shared analysis body: multilevel band fan-out with staged HBM
    writes; detail bands are soft-thresholded by ``lam`` before the write
    (``lam=0`` leaves them untouched — used by the fused pair kernel)."""
    dma = pltpu.make_async_copy(x_hbm, xbuf, sem_in)
    dma.start()
    dma.wait()
    approx = _up(xbuf[...])

    def write_band(idx, val, slot):
        stage[np.int32(slot)] = val.astype(stage.dtype)
        c = pltpu.make_async_copy(
            stage.at[np.int32(slot)],
            out_hbm.at[np.int32(idx)],
            sem_out.at[np.int32(slot)],
        )
        c.start()
        return c

    def shrink(v):
        if not lam:
            return v
        mag = jnp.abs(v)
        return v * (jnp.maximum(mag - lam, 0.0) / jnp.maximum(mag, 1e-30))

    inflight = [None, None]
    slot = 0
    off = B
    for lvl in range(level):
        # Depth-first band tree (_tree_expand): each axis pass is computed
        # ONCE per node and shared by the bands below it — (2+4+8)K
        # passes instead of 8*3K for 3D, at unchanged peak liveness.
        off -= nb - 1
        new_approx = [None]

        def emit(b, val):
            nonlocal slot
            if b == 0:
                new_approx[0] = val
                return
            if inflight[slot] is not None:
                inflight[slot].wait()
            inflight[slot] = write_band(off + b - 1, shrink(val), slot)
            slot ^= 1

        _tree_expand(
            ndim_sp,
            lambda v, ax, s: _corr_fori(
                v, taps_refs[ax], s, ax + ax_off, Ks[ax] // 2 - 1, False
            ),
            emit, approx,
        )
        approx = new_approx[0]
    if inflight[slot] is not None:
        inflight[slot].wait()
    inflight[slot] = write_band(0, approx, slot)
    for c in inflight:
        if c is not None:
            c.wait()


def _rec_phase(y_hbm, taps_refs, ndim_sp, Ks, level, nb, scale, ax_off,
               bufs, sem_in):
    """Shared synthesis body: streamed band reads, returns the
    reconstruction value (in VMEM)."""
    reads = []
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

    inflight = {}
    if len(reads) > 0:
        inflight[0] = start_read(0, 0)

    acc = None
    step = 0
    for lvl in range(level):
        # Tree-factored adjoint accumulation (_tree_reduce): axis 0 per
        # band, axis d>0 on the SUM of the 2^d bands sharing its higher
        # bits — (8+4+2)K passes instead of 8*3K for 3D. These kernels
        # are VPU-bound (scripts/exp_rec_fuse.py), so shared passes are
        # the lever; stream order is unchanged.

        def first_pass(b, acc=acc):
            nonlocal step
            nxt = step + 1
            if nxt < len(reads):
                inflight[nxt] = start_read(nxt, nxt % 2)
            c = inflight.pop(step, None)
            if c is not None:
                c.wait()
                v = _up(bufs[np.int32(step % 2)])
            else:
                v = acc  # running approximation, already in VMEM
            step += 1
            return _corr_fori(
                v, taps_refs[0], b & 1, ax_off, Ks[0] // 2 - 1, True
            )

        lvl_acc = _tree_reduce(
            nb, ndim_sp, first_pass,
            lambda v, d, b: _corr_fori(
                v, taps_refs[d], (b >> d) & 1, d + ax_off,
                Ks[d] // 2 - 1, True,
            ),
        )
        acc = lvl_acc * scale if scale != 1.0 else lvl_acc
    return acc


def _make_res_pair_kernel(ndim_sp, lifted, Ks, level, B, nb, scale, lam):
    """Whole dec -> soft-threshold(details) -> rec iterate in ONE launch.

    The launch floor on the tunneled TPU is ~1.5 ms/kernel, which dominates
    small transforms (VERDICT r1: 6.4 ms for a 1D@1024 pair); fusing the
    iterate halves the launches and drops the XLA glue between them. The
    band array is still written to HBM (it is a real output — iterative
    algorithms inspect it), overlapped with compute via the staged DMAs."""
    ax_off = len(lifted) - ndim_sp

    def kernel(x_hbm, *rest):
        taps_refs = rest[:ndim_sp]
        y_hbm, xr_hbm = rest[ndim_sp], rest[ndim_sp + 1]
        xbuf, stage, bufs, sem_in, sem_out, sem_rd, sem_wr = rest[ndim_sp + 2 :]
        _dec_phase(
            x_hbm, taps_refs, y_hbm, xbuf, stage, sem_in, sem_out,
            ndim_sp, Ks, level, B, nb, ax_off, lam,
        )
        acc = _rec_phase(
            y_hbm, taps_refs, ndim_sp, Ks, level, nb, scale, ax_off,
            bufs, sem_rd,
        )
        xbuf[...] = acc.astype(xbuf.dtype)
        c = pltpu.make_async_copy(xbuf, xr_hbm, sem_wr)
        c.start()
        c.wait()

    return kernel


def pair_resident(x, taps_np, level: int, preserve_l2: bool, lam: float = 0.0):
    """Fused multilevel dec + soft-threshold + rec; returns (bands, recon).

    ``lam=0`` is the plain round-trip pair (benchmark / frame tests);
    ``lam>0`` is cycle-spinning denoising / the FISTA prox step in a single
    kernel launch."""
    shape = x.shape
    ndim_sp = len(shape)
    nb = 2**ndim_sp
    B = nb + (nb - 1) * (level - 1)
    scale = 1.0 if preserve_l2 else 1.0 / nb
    lifted = _lifted_shape(shape)
    xl = x.reshape(lifted)
    Ks = tuple(t.shape[1] for t in taps_np)
    tdt = _compute_dtype(x.dtype)
    taps_ops = [jnp.asarray(t, tdt) for t in taps_np]

    y, xr = pl.pallas_call(
        _make_res_pair_kernel(ndim_sp, lifted, Ks, level, B, nb, scale,
                              float(lam)),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [
            pl.BlockSpec(
                t.shape,
                lambda i: (np.int32(0), np.int32(0)),
                memory_space=pltpu.SMEM,
            )
            for t in taps_np
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B,) + lifted, x.dtype),
            jax.ShapeDtypeStruct(lifted, x.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM(lifted, x.dtype),
            pltpu.VMEM((2,) + lifted, x.dtype),
            pltpu.VMEM((2,) + lifted, x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )(xl, *taps_ops)
    return y.reshape((B,) + shape), xr.reshape(shape)


def _make_res_rec_kernel(ndim_sp, lifted, Ks, level, nb, scale):
    """Standalone synthesis kernel: the shared ``_rec_phase`` streaming
    body plus the final staged write (the fused pair kernel uses the same
    helper — one home for the prefetch/x64 invariants)."""
    ax_off = len(lifted) - ndim_sp

    def kernel(y_hbm, *rest):
        taps_refs = rest[:ndim_sp]
        out_hbm = rest[ndim_sp]
        bufs, stage, sem_in, sem_out = rest[ndim_sp + 1 :]
        acc = _rec_phase(
            y_hbm, taps_refs, ndim_sp, Ks, level, nb, scale, ax_off,
            bufs, sem_in,
        )
        stage[...] = acc.astype(stage.dtype)
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
    Ks = tuple(t.shape[1] for t in taps_np)
    tdt = _compute_dtype(y.dtype)
    taps_ops = [jnp.asarray(t, tdt) for t in taps_np]

    out = pl.pallas_call(
        _make_res_rec_kernel(ndim_sp, lifted, Ks, level, nb, scale),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [
            pl.BlockSpec(
                t.shape,
                lambda i: (np.int32(0), np.int32(0)),
                memory_space=pltpu.SMEM,
            )
            for t in taps_np
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(lifted, y.dtype),
        scratch_shapes=[
            pltpu.VMEM((2,) + lifted, y.dtype),
            pltpu.VMEM(lifted, y.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )(yl, *taps_ops)
    return out.reshape(shape)
