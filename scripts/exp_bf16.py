"""Hardware experiment: where does bf16 time go? (VERDICT r2 item 5.)

bf16 storage at 256^3 db4 L3 measured only ~10% over f32 (20.5 vs
22.5 ms) although it halves HBM traffic. Candidate explanations:
  (a) VPU-bound: in-kernel compute upcasts every tile to f32 (the rotate
      chains are f32 either way), so halving DMA exposes the vector cost;
  (b) DMA-efficiency-bound: halved-size transfers move at a lower rate.

This script separates dec vs rec and times a pure copy kernel at f32 vs
bf16 tile sizes to measure the DMA-rate ratio directly. The bf16-native
roll idea (bitcast 2xbf16 -> i32, rotate, fix the odd seam) only pays if
(a) dominates AND the multiply/accumulate could also drop to bf16 — the
op-count analysis says the roll alone saves ~12% of the roll time while
per-tap upcasts ADD a full-length op per tap, a net loss; see CLAUDE.md.

Run on the TPU-attached host: ``python scripts/exp_bf16.py``.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import non_decimated_wavelets_tpu as nw
from non_decimated_wavelets_tpu.ops import pallas_kernels as pk


def sync(a):
    return float(jnp.sum(jnp.ravel(a).astype(jnp.float32)[:1]))


def timeit(f, x, iters=20):
    def body(c, _):
        return f(c), None

    loop = jax.jit(lambda v: jax.lax.scan(body, v, None, length=iters)[0])
    sync(loop(x))
    t0 = time.perf_counter()
    sync(loop(x))
    return (time.perf_counter() - t0) / iters


def main():
    shape = (256, 256, 256)
    level = 3
    plan = nw.NDDWT(wavelet="db4", shape=shape, dtype=jnp.float32)
    taps = tuple(np.asarray(t) for t in plan.taps_hp)
    rng = np.random.default_rng(0)
    nvox = int(np.prod(shape))

    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        x = jnp.asarray(rng.standard_normal(shape), dt)
        td = timeit(lambda v: pk.dec_pallas(v, taps, level)[0], x)
        y = jax.jit(lambda v: pk.dec_pallas(v, taps, level))(x)
        sync(y)
        tr = timeit(
            lambda b: pk.rec_pallas(
                jnp.concatenate([b[None], y[1:]], axis=0), taps, level, False
            ),
            y[0],
        )
        # dec returns band 0 only so the scan carry keeps x's shape; rec
        # reassembles bands from the captured y with a fresh band 0.
        print(f"{tag}: dec {td*1e3:.2f} ms, rec {tr*1e3:.2f} ms, "
              f"pair {((td+tr))*1e3:.2f} ms "
              f"({nvox/(td+tr)/1e6:.0f} Mvox/s)", flush=True)

    # Pure DMA microbench: ANY->VMEM->ANY copy kernel, f32 vs bf16.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = 4096, 1024  # 16MB f32

    TR = 256

    def copy_kernel(x_hbm, o_hbm, buf, sem_i, sem_o):
        i = pl.program_id(0)
        rows = pl.ds(i * np.int32(TR), TR)
        cp = pltpu.make_async_copy(x_hbm.at[rows, :], buf, sem_i)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(buf, o_hbm.at[rows, :], sem_o)
        cp.start()
        cp.wait()

    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        tile = (TR, C)
        xz = jnp.zeros((R, C), dt)

        def one(v):
            return pl.pallas_call(
                copy_kernel,
                grid=(R // TR,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                out_shape=jax.ShapeDtypeStruct((R, C), dt),
                scratch_shapes=[
                    pltpu.VMEM(tile, dt),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                ],
            )(v)

        t = timeit(one, xz, iters=50)
        nbytes = R * C * jnp.dtype(dt).itemsize * 2
        print(f"copy {tag}: {t*1e6:.0f} us -> {nbytes/t/1e9:.0f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
