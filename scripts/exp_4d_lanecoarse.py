"""Hardware experiment (r5, VERDICT r4 item 4): 4D dec lead-stage
write-run-length via LANE-COARSENED 4D views.

The dec lead stage is write-bound (~133 GB/s) on 512B strided detail
runs. The rejected r3 levers (kgroup staging, zct>128 on the 5D
``(.., Zcnt, zct)`` operands) both kept the collapsed-k DMA indexing;
every zct>128 combo failed the remote Mosaic compile. NEW information
this round: the ragged/3D kernels prove Mosaic handles 3D/4D buffers
with >=256-lane extents and dynamic offsets fine — so this experiment
drops the k axis entirely: operands ride as flattened 4D views
``(4|B, X, Y, L)`` and the lane chunk is addressed with a dynamic LANE
slice ``pl.ds(k*zctC, zctC)`` (zctC a multiple of 128). Detail writes
then cover ``(tx, ty, zctC)`` of an (X, Y, L) array — contiguous runs of
``zctC*4`` bytes instead of 512B.

Prints ms/level per (tiles, zctC) + exactness vs the production kernel.
"""

import faulthandler
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

faulthandler.dump_traceback_later(150, repeat=True, file=sys.stderr)

import jax

jax.config.update("jax_enable_x64", True)  # match bench.py's trace env

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import non_decimated_wavelets_tpu as nw
from non_decimated_wavelets_tpu.ops import pallas_4d as p4
from non_decimated_wavelets_tpu.ops.pallas_kernels import _up


def sync(a):
    return float(jnp.sum(jnp.ravel(a)[:1]))


def lead_dec_lanecoarse(temp4, big4, band_off, taps_np, tiles, zctC):
    """(4, X, Y, L) -> 16 bands into aliased (B, X, Y, L), approx to
    band 0 (final-level form). Plain unsharded, no kgroup — the lane
    chunk rides a dynamic lane slice of the flattened L axis."""
    _, X, Y, L = temp4.shape
    tx, ty = tiles
    t0, t1 = taps_np[0], taps_np[1]
    K0, K1 = t0.shape[1], t1.shape[1]
    halos = p4._lead_halos(K0, K1, adjoint=False)
    ex0 = tx + K0 - 1
    ey = ty + 2 * halos[1][0]
    start1 = halos[1][0] - (K1 // 2 - 1)
    nK = L // zctC

    def kernel(temp_hbm, big_in, big_ref, buf, stage, sem_in, sem_out):
        del big_in
        i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        lane0 = k * np.int32(zctC)

        def load(c, slot):
            copies = []
            w0l, w0r = halos[0]
            w1 = halos[1][0]
            segs0 = [
                (jax.lax.rem(i * np.int32(tx) + np.int32(X - w0l),
                             np.int32(X)), 0, w0l),
                (i * np.int32(tx), w0l, tx),
                (jax.lax.rem(i * np.int32(tx) + np.int32(tx),
                             np.int32(X)), w0l + tx, w0r),
            ]
            segs1 = [
                (pl.multiple_of(
                    jax.lax.rem(j * np.int32(ty) + np.int32(Y - w1),
                                np.int32(Y)), 8), 0, w1),
                (pl.multiple_of(j * np.int32(ty), 8), w1, ty),
                (pl.multiple_of(
                    jax.lax.rem(j * np.int32(ty) + np.int32(ty),
                                np.int32(Y)), 8), w1 + ty, w1),
            ]
            for sx, dx, ex in segs0:
                if ex == 0:
                    continue
                for sy, dy, ey_ in segs1:
                    if ey_ == 0:
                        continue
                    copies.append(pltpu.make_async_copy(
                        temp_hbm.at[
                            np.int32(c), pl.ds(sx, ex), pl.ds(sy, ey_),
                            pl.ds(lane0, zctC),
                        ],
                        buf.at[
                            np.int32(slot), pl.ds(np.int32(dx), ex),
                            pl.ds(np.int32(dy), ey_), slice(None),
                        ],
                        sem_in.at[np.int32(slot)],
                    ))
            return copies

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
            v = _up(buf[np.int32(c % 2)])
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
                    if inflight[out_slot] is not None:
                        inflight[out_slot].wait()
                    stage[np.int32(out_slot)] = val.astype(stage.dtype)
                    out_band = 0 if b == 0 else band_off + b - 1
                    cp = pltpu.make_async_copy(
                        stage.at[np.int32(out_slot)],
                        big_ref.at[
                            np.int32(out_band),
                            pl.ds(i * np.int32(tx), tx),
                            pl.ds(j * np.int32(ty), ty),
                            pl.ds(lane0, zctC),
                        ],
                        sem_out.at[np.int32(out_slot)],
                    )
                    cp.start()
                    inflight[out_slot] = cp
                    out_slot ^= 1
        for cp in inflight:
            if cp is not None:
                cp.wait()

    return pl.pallas_call(
        kernel,
        grid=(X // tx, Y // ty, nK),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(big4.shape, temp4.dtype),
        input_output_aliases={1: 0},
        scratch_shapes=[
            pltpu.VMEM((2, ex0, ey, zctC), temp4.dtype),
            pltpu.VMEM((2, tx, ty, zctC), temp4.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(temp4, big4)


def main():
    shape = (64, 64, 64, 32)
    X, Y, Z, T = shape
    L = Z * T
    plan = nw.NDDWT(wavelet="db4", shape=shape, dtype=jnp.float32)
    taps = tuple(np.asarray(t) for t in plan.taps_hp)
    zc = p4._chunk(Z, T)
    zct = zc * T
    Zcnt = Z // zc
    nvox = int(np.prod(shape))
    print(f"shape={shape} L={L} base zct={zct}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    lane_t = p4._lane_tiles(X, Y, L, 8)
    temp4 = jax.jit(
        lambda v: p4._lane_dec_call(v.reshape(X, Y, L), taps, T, lane_t)
    )(x)
    sync(temp4)
    iters = 20

    # ---- baseline: production 5D path (32,32) zct=128 ----
    temp5 = temp4.reshape(4, X, Y, Zcnt, zct)
    big5 = jnp.empty((16, X, Y, Zcnt, zct), jnp.float32)

    def run_base(t5, big):
        def body(carry, _):
            return p4._lead_dec_call(
                t5, carry, 1, taps, (32, 32), zct, approx_to_big=True
            ), None
        out, _ = jax.lax.scan(body, big, None, length=iters)
        return out

    fb = jax.jit(run_base)
    ref = fb(temp5, big5)
    sync(ref)
    t0 = time.perf_counter(); sync(fb(temp5, big5))
    dtb = (time.perf_counter() - t0) / iters
    print(f"baseline 5D (32,32) zct=128: {dtb*1e3:.2f} ms/level", flush=True)
    ref4 = np.asarray(ref.reshape(16, X, Y, L))

    # ---- lane-coarsened 4D variants ----
    big4 = jnp.empty((16, X, Y, L), jnp.float32)
    for tiles, zctC in [((32, 32), 128), ((16, 32), 256), ((16, 16), 256),
                        ((16, 16), 512), ((8, 16), 512), ((8, 16), 1024)]:
        if X % tiles[0] or Y % tiles[1] or L % zctC:
            continue
        K0 = taps[0].shape[1]
        ex0 = tiles[0] + K0 - 1
        ey = tiles[1] + 16
        live = 2 * ex0 * ey * zctC + 10 * tiles[0] * tiles[1] * zctC
        if live > 2_400_000:
            print(f"tiles={tiles} zctC={zctC}: skipped (live {live})",
                  flush=True)
            continue
        try:
            def run_lc(t4, big, tiles=tiles, zctC=zctC):
                def body(carry, _):
                    return lead_dec_lanecoarse(
                        t4, carry, 1, taps, tiles, zctC
                    ), None
                out, _ = jax.lax.scan(body, big, None, length=iters)
                return out

            f = jax.jit(run_lc)
            out = f(temp4, big4)
            sync(out)
            err = float(np.max(np.abs(np.asarray(out) - ref4)))
            t0 = time.perf_counter(); sync(f(temp4, big4))
            dt = (time.perf_counter() - t0) / iters
            wgbs = (nvox * 4 * 16) / dt / 1e9
            print(f"tiles={tiles} zctC={zctC}: {dt*1e3:.2f} ms/level "
                  f"(write {wgbs:.0f} GB/s apparent, err {err:.2e})",
                  flush=True)
        except Exception as e:
            print(f"tiles={tiles} zctC={zctC}: FAILED {e!r}"[:300],
                  flush=True)


if __name__ == "__main__":
    main()
