"""Hardware experiment: fused-interior band reads (_FUSE_INTERIOR) on the
streaming rec kernel, f32 + bf16, 256^3 db4 L3.

Rationale (r4): exp_dec_opt showed dec is write-bound (P1 prefetch -3%,
everything else neutral) — dec writes 1.5 GB of mandatory band output per
multilevel pass. rec reads ~2.9 GB in 9-segment tiles; exp_bf16 (r3)
showed rec gains NOTHING from bf16's halved traffic because per-transfer
latency floors dominate at sub-MB sizes (f32 54 GB/s vs bf16 31 GB/s at
0.5 MB serial copies). F1 turns an interior band tile read into ONE
~1.9 MB (f32) / ~0.95 MB (bf16) contiguous DMA — past the latency floor,
so bf16 rec may finally see its traffic halving.

rec is timed by subtraction: scan carries x, body = rec(dec(x)) for the
pair and dec-only for the dec term (a rec-only scan can't carry the band
array — shapes differ).
"""

import faulthandler
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

faulthandler.dump_traceback_later(120, repeat=True, file=sys.stderr)

from bench import _wait_for_backend  # noqa: E402

if not _wait_for_backend(attempts=8, probe_timeout=120, sleep_s=120):
    print("TPU backend unavailable; aborting experiment", flush=True)
    sys.exit(2)

import jax

jax.config.update("jax_enable_x64", True)  # match bench.py's trace env

import jax.numpy as jnp  # noqa: E402

import non_decimated_wavelets_tpu as nw  # noqa: E402
from non_decimated_wavelets_tpu.ops import pallas_kernels as pk  # noqa: E402


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


def main():
    print(f"backend={jax.default_backend()} device={jax.devices()[0]}",
          flush=True)
    shape = (256, 256, 256)
    level = 3
    iters = 30
    nvox = int(np.prod(shape))
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(shape).astype(np.float32)

    for dt, tag_dt in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        x = jnp.asarray(x_np, dt)
        plan = nw.NDDWT(wavelet="db4", shape=shape, dtype=dt)
        ref = None
        for F in (False, True):
            pk._FUSE_INTERIOR = F
            pk._DEC_PREFETCH = 0
            try:
                dec_fn = jax.jit(lambda v: plan.dec(v, level, band_axis=0))
                rec_fn = jax.jit(lambda v: plan.rec(v, band_axis=0))
                xr = np.asarray(
                    rec_fn(dec_fn(x)), dtype=np.float32
                )
                if ref is None:
                    ref = xr
                err = float(np.max(np.abs(xr - ref)))
                td = time_loop(lambda v, f=dec_fn: f(v)[0].astype(v.dtype),
                               x, iters)
                tp = time_loop(lambda v: rec_fn(dec_fn(v)), x, iters)
                print(f"{tag_dt} F{int(F)}: dec {td*1e3:.2f} ms, "
                      f"pair {tp*1e3:.2f} ms ({nvox/tp/1e6:.0f} Mvox/s), "
                      f"rec-by-subtraction {(tp-td)*1e3:.2f} ms "
                      f"(err vs F0 {err:.1e})", flush=True)
            except Exception as e:
                print(f"{tag_dt} F{int(F)}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    # Best-known combined config: dec P1 + rec/dec F1, f32 pair.
    for dt, tag_dt in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        x = jnp.asarray(x_np, dt)
        plan = nw.NDDWT(wavelet="db4", shape=shape, dtype=dt)
        pk._FUSE_INTERIOR = True
        pk._DEC_PREFETCH = 2
        try:
            dec_fn = jax.jit(lambda v: plan.dec(v, level, band_axis=0))
            rec_fn = jax.jit(lambda v: plan.rec(v, band_axis=0))
            tp = time_loop(lambda v: rec_fn(dec_fn(v)), x, iters)
            print(f"{tag_dt} P1+F1: pair {tp*1e3:.2f} ms "
                  f"({nvox/tp/1e6:.0f} Mvox/s)", flush=True)
        except Exception as e:
            print(f"{tag_dt} P1+F1: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    pk._FUSE_INTERIOR = False
    pk._DEC_PREFETCH = 0


if __name__ == "__main__":
    main()
