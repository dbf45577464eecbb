"""Hardware experiment: where does bf16 time go? (VERDICT r2 item 5.)

bf16 storage at 256^3 db4 L3 measured only ~10-13% over f32 (19.2 vs
21.7 ms) although it halves HBM traffic. Candidate explanations:
  (a) VPU-bound: in-kernel compute upcasts every tile to f32 (the rotate
      chains are f32 either way), so halving DMA exposes the vector cost;
  (b) DMA-efficiency-bound: halved-size transfers move at a lower rate.

This script times (1) a pure copy kernel at f32 vs bf16 to measure the
DMA-rate ratio directly, then (2) dec vs rec separately at both dtypes.
The bf16-native roll idea (bitcast 2xbf16 -> i32, rotate, fix the odd
seam) only pays if (a) dominates AND the multiply/accumulate could also
drop to bf16 — the op-count analysis says the roll alone saves ~12% of
the roll time while per-tap upcasts ADD a full-length op per tap, a net
loss; see CLAUDE.md.

Structure mirrors bench.py exactly (x64 enabled, plan API, scanned
loops): an earlier variant calling ops-layer functions directly hung
>19 min pre-compile twice on the tunnel. faulthandler dumps stacks every
120 s to stderr so a stall shows where it blocks.

Run on the TPU-attached host: ``python scripts/exp_bf16.py``.
"""

import faulthandler
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

faulthandler.dump_traceback_later(120, repeat=True, file=sys.stderr)

import jax

jax.config.update("jax_enable_x64", True)  # match bench.py's trace env

import jax.numpy as jnp

import non_decimated_wavelets_tpu as nw


def sync(a):
    return float(jnp.sum(jnp.ravel(a).astype(jnp.float32)[:1]))


def time_loop(step_fn, x, iters):
    def body(carry, _):
        return step_fn(carry), None

    @jax.jit
    def loop(v):
        out, _ = jax.lax.scan(body, v, None, length=iters)
        return out

    sync(loop(x))
    t0 = time.perf_counter()
    sync(loop(x))
    return (time.perf_counter() - t0) / iters


def copy_bench():
    """ANY->VMEM->ANY copy kernel, f32 vs bf16: the raw DMA-rate ratio."""
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
        xz = jnp.zeros((R, C), dt)

        def one(v):
            return pl.pallas_call(
                copy_kernel,
                grid=(R // TR,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                out_shape=jax.ShapeDtypeStruct((R, C), dt),
                scratch_shapes=[
                    pltpu.VMEM((TR, C), dt),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                ],
            )(v)

        t = time_loop(one, xz, iters=50)
        nbytes = R * C * jnp.dtype(dt).itemsize * 2
        print(f"copy {tag}: {t*1e6:.0f} us -> {nbytes/t/1e9:.0f} GB/s",
              flush=True)


def main():
    print(f"backend={jax.default_backend()} device={jax.devices()[0]}",
          flush=True)
    copy_bench()

    shape = (256, 256, 256)
    level = 3
    iters = 30
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(shape).astype(np.float32)
    nvox = int(np.prod(shape))

    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        plan = nw.NDDWT(wavelet="db4", shape=shape, dtype=dt)
        x = jnp.asarray(x_np, dt)
        dec_fn = jax.jit(lambda v: plan.dec(v, level, band_axis=0))
        rec_fn = jax.jit(lambda v: plan.rec(v, band_axis=0))
        tp = time_loop(lambda v: rec_fn(dec_fn(v)), x, iters)
        print(f"{tag}: pair {tp*1e3:.2f} ms ({nvox/tp/1e6:.0f} Mvox/s)",
              flush=True)
        # dec-only: carry the approx band (same shape as x).
        td = time_loop(lambda v: dec_fn(v)[0], x, iters)
        print(f"{tag}: dec {td*1e3:.2f} ms, rec(by diff) {(tp-td)*1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
