"""Flat-lane resident Pallas kernels: whole-transform single-launch kernels
for SMALL arrays of ARBITRARY shape (any ndim, any extents).

Why this exists: the natural-layout resident kernels
(``pallas_resident.py``) require the lane dimension to be a multiple of
128, and the tiled kernels (``pallas_kernels.py``) have the same lane
constraint — so reference-style awkward sizes (``264x264``, ``54321``,
``[164,64,40]`` — the reference's own test shapes,
``Test/nddwt2D_test.m:5``) fall back to the XLA direct path. On the
available TPU backend that path is a hazard for small shapes (observed: a
``(64,64)`` f32 direct-path program fails UNIMPLEMENTED or hangs the
worker), and even where it works, per-op dispatch latency dominates.

Design: flatten the whole array into the lane dimension, padded to
``P = roundup(numel, 1024)`` and viewed as ``(8, P/8)`` (8 sublanes for
VPU utilization; row-major flat order). Two primitives:

* **flat rotate by s**: ``out[n] = v[(n - s) mod P]`` = lane rotate by
  ``s mod C`` + sublane rotate by ``s // C`` (+1 for the lanes that
  wrapped) — 3 rotates and a select.
* **circular axis shift**: for spatial axis with extent N and flat stride
  S, a circular shift by ``s`` is the masked pair of flat rotates by
  ``s*S`` and ``(s-N)*S`` selected on ``(flat_index mod N*S) < s*S`` —
  the multi-axis generalization of ``pallas_4d``'s masked double-rotate.
  Every valid output position reads only valid input positions, so the
  padding tail never contaminates results (it only ever holds garbage).

Correlations accumulate inside an i32 ``while_loop`` with taps in SMEM
(an unrolled roll chain keeps every rotate output live on Mosaic's scoped
stack — same lesson as ``pallas_resident``).

Used by ``dec_pallas``/``rec_pallas``/``NDDWT.dec_rec`` when
:func:`flat_supported` holds (after the natural-layout kernels decline).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _compute_dtype, _tree_expand, _tree_reduce, _up

_ROWS = 8
# ~8 live (8, P/8) arrays (approx, acc, rotate temps, stage, bufs) must fit
# the 16MB scoped VMEM at Mosaic's ~2.4x accounting. Re-verified on
# hardware AFTER the r4 tree factoring added 1-2 held partials per level:
# budget-edge shapes (440^2 db4 L2 and 58^3 db2 L2, 8*padded = 1.55M
# words) still compile and round-trip exactly (exp log 2026-08-20).
_BUDGET_WORDS = 1_600_000


def _padded_len(numel: int) -> int:
    return -(-numel // (_ROWS * 128)) * (_ROWS * 128)


def flat_supported(shape, dtype, taps_np) -> bool:
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return False
    numel = int(np.prod(shape))
    return 8 * _padded_len(numel) <= _BUDGET_WORDS


def _strides(shape):
    s = [1] * len(shape)
    for ax in range(len(shape) - 2, -1, -1):
        s[ax] = s[ax + 1] * shape[ax + 1]
    return tuple(s)


def _flat_rot(v, s, C):
    """Flat rotate of the row-major (8, C) view: out[n] = v[(n - s) mod P].

    ``s`` may be a traced i32 in [0, P)."""
    q = jax.lax.div(s, np.int32(C))
    r = jax.lax.rem(s, np.int32(C))
    lr = pltpu.roll(v, r, axis=1)
    r1 = pltpu.roll(lr, q, axis=0)
    r2 = pltpu.roll(lr, q + np.int32(1), axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(lane < r, r2, r1)


def _axis_shift(v, s, N, S, C, flat_idx):
    """Circular shift by ``s`` (traced, in [0, N)) along the spatial axis
    with extent ``N`` and flat stride ``S``."""
    P = v.shape[0] * C
    sS = s * np.int32(S)
    main = _flat_rot(v, sS, C)
    wrap = _flat_rot(v, jax.lax.rem(sS - np.int32(N * S) + np.int32(P), np.int32(P)), C)
    inblock = jax.lax.rem(flat_idx, np.int32(N * S))
    return jnp.where(inblock < sS, wrap, main)


def _corr_flat(v, taps_ref, sel, N, S, C, flat_idx, o, reverse):
    """K-tap circular correlation along one spatial axis of the flat view.

    ``reverse=False``: y[n] = sum_j t[j] v[n + j - o]  (shift by o - j).
    ``reverse=True``: adjoint — reversed taps at the mirrored anchor."""
    K = taps_ref.shape[1]
    anchor = (K - 1 - o) if reverse else o

    def cond(carry):
        return carry[0] < np.int32(K)

    def body(carry):
        j, acc = carry
        s = jax.lax.rem(np.int32(anchor) - j + np.int32(16 * N), np.int32(N))
        r = _axis_shift(v, s, N, S, C, flat_idx)
        tap_idx = (np.int32(K - 1) - j) if reverse else j
        t = taps_ref[np.int32(sel), tap_idx]
        return (j + np.int32(1), acc + t * r)

    j0 = jnp.asarray(0, jnp.int32)
    return jax.lax.while_loop(cond, body, (j0, jnp.zeros_like(v)))[1]


def _stream_analysis(v, taps_refs, shape, Ks, C, flat_idx, level, B, nb,
                     shrink, y_hbm, stage, sem_out):
    """Multilevel analysis of value ``v``: stream every band (details run
    through ``shrink``) to ``y_hbm`` through the 2-slot ``stage`` buffer;
    all writes are waited before returning."""
    approx = v
    inflight = [None, None]
    slot = 0
    off = B
    S = _strides(shape)
    axoff = len(shape) - len(taps_refs)
    for lvl in range(level):
        # Depth-first band tree (_tree_expand): each axis pass computed
        # once per node and shared by the bands below — (2+4+8)K passes
        # instead of 8*3K for 3D at the same peak liveness. Leaves
        # stream out in bit-reversed order (harmless).
        off -= nb - 1
        new_approx = [None]

        def emit(b, val):
            nonlocal slot
            if b == 0:
                new_approx[0] = val
                return
            if inflight[slot] is not None:
                inflight[slot].wait()
            stage[np.int32(slot)] = shrink(val).astype(stage.dtype)
            cp = pltpu.make_async_copy(
                stage.at[np.int32(slot)],
                y_hbm.at[np.int32(off + b - 1)],
                sem_out.at[np.int32(slot)],
            )
            cp.start()
            inflight[slot] = cp
            slot ^= 1

        _tree_expand(
            len(taps_refs),
            lambda v, ax, s: _corr_flat(
                v, taps_refs[ax], s, shape[ax + axoff], S[ax + axoff],
                C, flat_idx, Ks[ax] // 2 - 1, False,
            ),
            emit, approx,
        )
        approx = new_approx[0]
    if inflight[slot] is not None:
        inflight[slot].wait()
    stage[np.int32(slot)] = approx.astype(stage.dtype)
    cp = pltpu.make_async_copy(
        stage.at[np.int32(slot)], y_hbm.at[np.int32(0)],
        sem_out.at[np.int32(slot)],
    )
    cp.start()
    inflight[slot] = cp
    for cp in inflight:
        if cp is not None:
            cp.wait()


def _stream_synthesis(taps_refs, shape, Ks, C, flat_idx, level, B, nb, scale,
                      y_hbm, bufs, sem_rd):
    """Multilevel synthesis from the bands in ``y_hbm`` with a 2-slot read
    prefetch; returns the reconstruction value."""
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
        cp = pltpu.make_async_copy(
            y_hbm.at[np.int32(idx)], bufs.at[np.int32(slot)],
            sem_rd.at[np.int32(slot)],
        )
        cp.start()
        return cp

    inflight_r = {}
    if reads:
        inflight_r[0] = start_read(0, 0)
    acc = None
    step = 0
    S = _strides(shape)
    axoff = len(shape) - len(taps_refs)
    d_sp = len(taps_refs)
    for lvl in range(level):
        # Tree-factored adjoint accumulation (_tree_reduce): axis 0 per
        # band, axis d>0 on the summed 2^d bands — the kernels are
        # VPU-bound, so shared passes are the lever.

        def first_pass(b, acc=acc):
            nonlocal step
            nxt = step + 1
            if nxt < len(reads):
                inflight_r[nxt] = start_read(nxt, nxt % 2)
            cp = inflight_r.pop(step, None)
            if cp is not None:
                cp.wait()
                v = _up(bufs[np.int32(step % 2)])
            else:
                v = acc
            step += 1
            return _corr_flat(v, taps_refs[0], b & 1, shape[axoff],
                              S[axoff], C, flat_idx, Ks[0] // 2 - 1, True)

        lvl_acc = _tree_reduce(
            nb, d_sp, first_pass,
            lambda v, d, b: _corr_flat(
                v, taps_refs[d], (b >> d) & 1, shape[d + axoff],
                S[d + axoff], C, flat_idx, Ks[d] // 2 - 1, True,
            ),
        )
        acc = lvl_acc * scale if scale != 1.0 else lvl_acc
    return acc


def _make_shrink(lam, mag_pair_numel, C, flat_idx):
    """Soft-threshold closure; ``lam`` may be a Python float or a traced
    scalar. With ``mag_pair_numel`` the shrink couples the split re/im
    pair through the complex magnitude (the partner component sits
    ``mag_pair_numel`` flat positions away). Positions in the padding
    tail pair with whatever sits one component-stride below them — their
    shrunk values are garbage, but every padding lane is discarded at
    unlift and valid lanes always pair valid-with-valid."""

    def shrink(v):
        if isinstance(lam, float) and not lam:
            return v
        if mag_pair_numel is not None:
            nsp = mag_pair_numel
            P = v.shape[0] * C
            fwd = _flat_rot(v, np.int32(nsp), C)          # v[n - nsp]
            bwd = _flat_rot(v, np.int32(P - nsp), C)      # v[n + nsp]
            other = jnp.where(flat_idx < np.int32(nsp), bwd, fwd)
            mag = jnp.sqrt(v * v + other * other)
        else:
            mag = jnp.abs(v)
        return v * (jnp.maximum(mag - lam, 0.0) / jnp.maximum(mag, 1e-30))

    return shrink


def _make_flat_pair_kernel(shape, Ks, level, B, nb, scale, lam, C,
                           mode, mag_pair_numel=None):
    """mode: 'dec', 'rec', or 'pair' (dec -> soft-threshold -> rec).

    ``shape`` is the FULL flat layout shape (may carry a leading batch
    axis); ``Ks`` has one entry per *transformed* (trailing) axis. With
    ``mag_pair_numel`` set (the spatial numel of a split re/im pair whose
    components sit ``mag_pair_numel`` apart in the flat buffer), the
    soft-threshold couples the two components through the complex
    magnitude — the proper prox of the complex l1 norm."""

    ndim = len(Ks)

    def kernel(*args):
        if mode == "rec":
            y_in = args[0]
            taps_refs = args[1 : 1 + ndim]
            outs = args[1 + ndim : 2 + ndim]
            (xr_hbm,) = outs
            y_hbm = y_in
            xbuf, stage, bufs, sem_in, sem_out, sem_rd, sem_wr = args[2 + ndim :]
        else:
            x_hbm = args[0]
            taps_refs = args[1 : 1 + ndim]
            if mode == "pair":
                y_hbm, xr_hbm = args[1 + ndim], args[2 + ndim]
                rest = args[3 + ndim :]
            else:
                y_hbm = args[1 + ndim]
                xr_hbm = None
                rest = args[2 + ndim :]
            xbuf, stage, bufs, sem_in, sem_out, sem_rd, sem_wr = rest

        flat_idx = (
            jax.lax.broadcasted_iota(jnp.int32, (_ROWS, C), 0) * np.int32(C)
            + jax.lax.broadcasted_iota(jnp.int32, (_ROWS, C), 1)
        )

        shrink = _make_shrink(lam, mag_pair_numel, C, flat_idx)

        # ----- analysis phase -----
        if mode in ("dec", "pair"):
            dma = pltpu.make_async_copy(x_hbm, xbuf, sem_in)
            dma.start()
            dma.wait()
            _stream_analysis(
                _up(xbuf[...]), taps_refs, shape, Ks, C, flat_idx, level, B,
                nb, shrink, y_hbm, stage, sem_out,
            )
        if mode == "dec":
            return

        # ----- synthesis phase (streamed band reads) -----
        acc = _stream_synthesis(
            taps_refs, shape, Ks, C, flat_idx, level, B, nb, scale,
            y_hbm, bufs, sem_rd,
        )
        xbuf[...] = acc.astype(xbuf.dtype)
        cp = pltpu.make_async_copy(xbuf, xr_hbm, sem_wr)
        cp.start()
        cp.wait()

    return kernel


def _call(mode, arr, taps_np, level, preserve_l2, lam, shape, batch=0,
          mag_pair=False):
    """``batch=0``: plain transform of ``shape``. ``batch=n``: leading
    untransformed batch axis (``arr`` is ``(n, *shape)`` for dec/pair,
    ``(B, n, *shape)`` for rec) — all items in ONE kernel launch.
    ``mag_pair`` (batch=2 only) couples the soft-threshold through the
    complex magnitude of the re/im pair."""
    ndim = len(shape)
    numel_sp = int(np.prod(shape))
    full_shape = ((batch,) + shape) if batch else shape
    numel = int(np.prod(full_shape))
    P = _padded_len(numel)
    C = P // _ROWS
    nb = 2**ndim
    B = nb + (nb - 1) * (level - 1)
    scale = 1.0 if preserve_l2 else 1.0 / nb
    Ks = tuple(t.shape[1] for t in taps_np)
    tdt = _compute_dtype(arr.dtype)
    taps_ops = [jnp.asarray(t, tdt) for t in taps_np]
    mag_pair_numel = numel_sp if (mag_pair and batch == 2) else None

    def lift(a):
        flat = a.reshape(-1)
        return jnp.pad(flat, (0, P - numel)).reshape(_ROWS, C)

    if mode == "rec":
        ops = jnp.pad(arr.reshape(B, numel), ((0, 0), (0, P - numel)))
        ops = ops.reshape(B, _ROWS, C)
        out_shapes = (jax.ShapeDtypeStruct((_ROWS, C), arr.dtype),)
        out_specs = (pl.BlockSpec(memory_space=pl.ANY),)
    else:
        ops = lift(arr)
        band_out = jax.ShapeDtypeStruct((B, _ROWS, C), arr.dtype)
        if mode == "pair":
            out_shapes = (band_out, jax.ShapeDtypeStruct((_ROWS, C), arr.dtype))
            out_specs = (
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            )
        else:
            out_shapes = (band_out,)
            out_specs = (pl.BlockSpec(memory_space=pl.ANY),)

    res = pl.pallas_call(
        _make_flat_pair_kernel(full_shape, Ks, level, B, nb, scale,
                               float(lam), C, mode,
                               mag_pair_numel=mag_pair_numel),
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
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shapes if len(out_shapes) > 1 else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((_ROWS, C), arr.dtype),
            pltpu.VMEM((2, _ROWS, C), arr.dtype),
            pltpu.VMEM((2, _ROWS, C), arr.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )(ops, *taps_ops)

    def unlift(a):
        return a.reshape(-1)[:numel].reshape(full_shape)

    if mode == "dec":
        return res.reshape(B, P)[:, :numel].reshape((B,) + full_shape)
    if mode == "rec":
        return unlift(res)
    y, xr = res
    return (
        y.reshape(B, P)[:, :numel].reshape((B,) + full_shape),
        unlift(xr),
    )


def dec_flat(x, taps_np, level: int):
    """(shape) -> (B, *shape), one kernel launch."""
    return _call("dec", x, taps_np, level, False, 0.0, x.shape)


def rec_flat(y, taps_np, level: int, preserve_l2: bool):
    """(B, *shape) -> (shape), one kernel launch."""
    return _call("rec", y, taps_np, level, preserve_l2, 0.0, y.shape[1:])


def pair_flat(x, taps_np, level: int, preserve_l2: bool, lam: float = 0.0):
    """Fused dec -> soft-threshold(details) -> rec; returns (bands, recon)."""
    return _call("pair", x, taps_np, level, preserve_l2, lam, x.shape)


# ------------------------------------------------------- split-complex pair
# The complex path for the complex-less TPU backend (CLAUDE.md): re/im
# transform independently under real filters, and the flat layout makes
# the pair a leading batch axis of the SAME buffer — one launch for both
# components instead of two dispatch chains (VERDICT r2 item 4a).

def split_supported(shape, dtype, taps_np) -> bool:
    return flat_supported((2,) + tuple(shape), dtype, taps_np)


def dec_split_flat(x_pair, taps_np, level: int):
    """(2, *shape) -> (2, B, *shape), one kernel launch."""
    y = _call("dec", x_pair, taps_np, level, False, 0.0, x_pair.shape[1:],
              batch=2)
    return jnp.moveaxis(y, 0, 1)  # (B, 2, *shape) -> (2, B, *shape)


def rec_split_flat(y_pair, taps_np, level: int, preserve_l2: bool):
    """(2, B, *shape) -> (2, *shape), one kernel launch."""
    yb = jnp.moveaxis(y_pair, 0, 1)  # (B, 2, *shape)
    return _call("rec", yb, taps_np, level, preserve_l2, 0.0,
                 y_pair.shape[2:], batch=2)


def pair_split_flat(x_pair, taps_np, level: int, preserve_l2: bool,
                    lam: float = 0.0):
    """Fused split-complex dec -> complex-magnitude soft-threshold -> rec
    in ONE launch; returns ((2, B, *shape) bands, (2, *shape) recon).

    The shrink is the prox of the complex l1 norm (joint re/im magnitude,
    the reference's flagship MRI use, ``Functions/nd_dwt_1D.m:57-61``)."""
    y, xr = _call("pair", x_pair, taps_np, level, preserve_l2, lam,
                  x_pair.shape[1:], batch=2, mag_pair=True)
    return jnp.moveaxis(y, 0, 1), xr


# -------------------------------------------------------- multi-iterate
# N dec -> shrink -> rec sweeps inside ONE kernel launch (VERDICT r2
# item 3): the iterative algorithms the reference was built for
# (``README.md:2``) re-enter the transform tens of times per solve, and
# on the tunneled TPU each separate launch pays ~1.5 ms — more than the
# whole transform for small shapes. Here the loop lives in-kernel as an
# i32 while_loop (N-independent code size; Mosaic compiles once), the
# per-iteration threshold/momentum schedule sits in SMEM, and the FISTA
# variant keeps the full solver state (x, z, mask, b) resident in VMEM —
# one launch for the entire reconstruction.

# Peak live (8, C) arrays per mode, against the Mosaic scoped-VMEM
# accounting baked into _BUDGET_WORDS (pair mode == 8):
# 'chain' adds nothing persistent (9 is margin for the loop carry);
# 'fista' adds zbuf/maskbuf/bbuf plus the data-term temporaries.
_ITER_LIVE = {"chain": 9, "fista": 12}


def iter_supported(shape, dtype, taps_np, mode: str, batch: int = 0) -> bool:
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return False
    full = ((batch,) + tuple(shape)) if batch else tuple(shape)
    numel = int(np.prod(full))
    return _ITER_LIVE[mode] * _padded_len(numel) <= _BUDGET_WORDS


def _make_flat_iter_kernel(shape, Ks, level, B, nb, scale, C, mode, n_iter,
                           step, mag_pair_numel=None):
    """mode 'fista': in-kernel FISTA on the image-domain masked data term
    (v = z - step*M(Mz - b); x+ = W^T shrink(W v); z+ = x+ + mom*(x+ - x)).
    mode 'chain': x+ = W^T shrink_i(W x) — iterated prox sweeps.

    The schedule ref carries (lam_i, mom_i) rows in SMEM."""
    ndim = len(Ks)

    def kernel(*args):
        if mode == "fista":
            b_hbm, mask_hbm = args[0], args[1]
            taps_refs = args[2 : 2 + ndim]
            sched_ref = args[2 + ndim]
            y_hbm, xr_hbm = args[3 + ndim], args[4 + ndim]
            (xbuf, zbuf, maskbuf, bbuf, stage, bufs,
             sem_in, sem_out, sem_rd, sem_wr) = args[5 + ndim :]
        else:
            x_hbm = args[0]
            taps_refs = args[1 : 1 + ndim]
            sched_ref = args[1 + ndim]
            y_hbm, xr_hbm = args[2 + ndim], args[3 + ndim]
            xbuf, stage, bufs, sem_in, sem_out, sem_rd, sem_wr = args[4 + ndim :]

        flat_idx = (
            jax.lax.broadcasted_iota(jnp.int32, (_ROWS, C), 0) * np.int32(C)
            + jax.lax.broadcasted_iota(jnp.int32, (_ROWS, C), 1)
        )

        if mode == "fista":
            cp_b = pltpu.make_async_copy(b_hbm, bbuf, sem_in)
            cp_b.start()
            cp_m = pltpu.make_async_copy(mask_hbm, maskbuf, sem_wr)
            cp_m.start()
            cp_b.wait()
            cp_m.wait()
            x0 = _up(maskbuf[...]) * _up(bbuf[...])
            xbuf[...] = x0.astype(xbuf.dtype)
            zbuf[...] = x0.astype(zbuf.dtype)
        else:
            cp = pltpu.make_async_copy(x_hbm, xbuf, sem_in)
            cp.start()
            cp.wait()

        def body(i):
            lam = sched_ref[i, np.int32(0)]
            shrink = _make_shrink(lam, mag_pair_numel, C, flat_idx)
            if mode == "fista":
                mom = sched_ref[i, np.int32(1)]
                zv = _up(zbuf[...])
                mv = _up(maskbuf[...])
                v = zv - step * (mv * (mv * zv - _up(bbuf[...])))
            else:
                v = _up(xbuf[...])
            _stream_analysis(
                v, taps_refs, shape, Ks, C, flat_idx, level, B, nb,
                shrink, y_hbm, stage, sem_out,
            )
            xr = _stream_synthesis(
                taps_refs, shape, Ks, C, flat_idx, level, B, nb, scale,
                y_hbm, bufs, sem_rd,
            )
            if mode == "fista":
                xv = _up(xbuf[...])
                zbuf[...] = (xr + mom * (xr - xv)).astype(zbuf.dtype)
            xbuf[...] = xr.astype(xbuf.dtype)

        def cond(i):
            return i < np.int32(n_iter)

        def wbody(i):
            body(i)
            return i + np.int32(1)

        jax.lax.while_loop(cond, wbody, jnp.asarray(0, jnp.int32))
        cp = pltpu.make_async_copy(xbuf, xr_hbm, sem_wr)
        cp.start()
        cp.wait()

    return kernel


def _call_iter(mode, arr, mask, taps_np, level, preserve_l2, lams, moms,
               step, shape, batch=0, mag_pair=False):
    """Launch one multi-iterate kernel; returns the final reconstruction
    with the layout of ``arr`` (``(batch, *shape)`` or ``shape``)."""
    ndim = len(shape)
    numel_sp = int(np.prod(shape))
    full_shape = ((batch,) + shape) if batch else shape
    numel = int(np.prod(full_shape))
    P = _padded_len(numel)
    C = P // _ROWS
    nb = 2**ndim
    B = nb + (nb - 1) * (level - 1)
    scale = 1.0 if preserve_l2 else 1.0 / nb
    Ks = tuple(t.shape[1] for t in taps_np)
    tdt = _compute_dtype(arr.dtype)
    taps_ops = [jnp.asarray(t, tdt) for t in taps_np]
    mag_pair_numel = numel_sp if (mag_pair and batch == 2) else None
    n_iter = len(lams)
    sched = np.zeros((max(n_iter, 1), 2), np.float32)
    sched[:n_iter, 0] = np.asarray(lams, np.float64)
    if moms is not None:
        sched[:n_iter, 1] = np.asarray(moms, np.float64)

    def lift(a):
        flat = jnp.asarray(a, arr.dtype).reshape(-1)
        return jnp.pad(flat, (0, P - numel)).reshape(_ROWS, C)

    ops = [lift(arr)]
    n_arr = 1
    if mode == "fista":
        ops.append(lift(mask))
        n_arr = 2
    ops += taps_ops + [jnp.asarray(sched)]

    smem_spec = lambda shp: pl.BlockSpec(
        shp,
        lambda i: tuple(np.int32(0) for _ in shp),
        memory_space=pltpu.SMEM,
    )
    in_specs = (
        [pl.BlockSpec(memory_space=pl.ANY)] * n_arr
        + [smem_spec(t.shape) for t in taps_np]
        + [smem_spec(sched.shape)]
    )

    scratch = [pltpu.VMEM((_ROWS, C), arr.dtype)]          # xbuf
    if mode == "fista":
        scratch += [
            pltpu.VMEM((_ROWS, C), arr.dtype),             # zbuf
            pltpu.VMEM((_ROWS, C), arr.dtype),             # maskbuf
            pltpu.VMEM((_ROWS, C), arr.dtype),             # bbuf
        ]
    scratch += [
        pltpu.VMEM((2, _ROWS, C), arr.dtype),              # stage
        pltpu.VMEM((2, _ROWS, C), arr.dtype),              # bufs
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA,
    ]

    _, xr = pl.pallas_call(
        _make_flat_iter_kernel(full_shape, Ks, level, B, nb, scale, C, mode,
                               n_iter, float(step),
                               mag_pair_numel=mag_pair_numel),
        grid=(1,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, _ROWS, C), arr.dtype),  # band scratch
            jax.ShapeDtypeStruct((_ROWS, C), arr.dtype),
        ),
        scratch_shapes=scratch,
    )(*ops)
    return xr.reshape(-1)[:numel].reshape(full_shape)


def chain_flat(x, taps_np, level: int, preserve_l2: bool, lams):
    """N fused dec -> soft-threshold -> rec sweeps in ONE launch; returns
    the reconstruction after the last sweep. ``lams`` is the per-sweep
    threshold schedule."""
    return _call_iter("chain", x, None, taps_np, level, preserve_l2,
                      tuple(lams), None, 0.0, x.shape)


def fista_flat(b, mask, taps_np, level: int, preserve_l2: bool, lams, moms,
               step: float):
    """Whole FISTA inpainting solve in ONE launch: state resident in VMEM,
    schedule in SMEM. ``b`` is the masked observation, ``mask`` the 0/1
    sampling mask (both ``shape``); returns the reconstruction."""
    return _call_iter("fista", b, mask, taps_np, level, preserve_l2,
                      tuple(lams), tuple(moms), float(step), b.shape)


def fista_split_flat(b_pair, mask, taps_np, level: int, preserve_l2: bool,
                     lams, moms, step: float):
    """Split-complex whole-solve FISTA: ``b_pair`` is ``(2, *shape)``
    re/im, ``mask`` is ``shape`` (shared by both components); the shrink
    couples the pair through the complex magnitude. One launch for the
    entire complex reconstruction on the complex-less TPU backend."""
    shape = b_pair.shape[1:]
    mask2 = jnp.broadcast_to(jnp.asarray(mask)[None], (2,) + tuple(shape))
    return _call_iter("fista", b_pair, mask2, taps_np, level, preserve_l2,
                      tuple(lams), tuple(moms), float(step), shape,
                      batch=2, mag_pair=True)
