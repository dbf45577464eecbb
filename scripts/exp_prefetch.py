"""Hardware sweep: dec input-prefetch DEPTH (slot ring) at 256^3 db4 L3.

Depth 2 gave only -3% (exp_dec_opt.py): a 2.4 MB per-step load has ONE
~7us compute window to land (~340 GB/s required). Depths 3/4 give it
2/3 windows. Mirrors bench.py's trace env."""

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

jax.config.update("jax_enable_x64", True)

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
    shape, level, iters = (256, 256, 256), 3, 30
    nvox = int(np.prod(shape))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    plan = nw.NDDWT(wavelet="db4", shape=shape, dtype=jnp.float32)
    pk._DEC_PREFETCH = 0
    y_ref = np.asarray(jax.jit(lambda v: plan.dec(v, level, band_axis=0))(x))
    best = (None, 1e9)
    for D in (0, 2, 3, 4):
        pk._DEC_PREFETCH = D
        try:
            dec_fn = jax.jit(lambda v: plan.dec(v, level, band_axis=0))
            err = float(jnp.max(jnp.abs(dec_fn(x) - y_ref)))
            td = time_loop(lambda v, f=dec_fn: f(v)[0], x, iters)
            print(f"D{D}: dec {td*1e3:.2f} ms (err {err:.1e})", flush=True)
            if td < best[1]:
                best = (D, td)
        except Exception as e:
            print(f"D{D}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    pk._DEC_PREFETCH = best[0]
    dec_fn = jax.jit(lambda v: plan.dec(v, level, band_axis=0))
    rec_fn = jax.jit(lambda v: plan.rec(v, band_axis=0))
    tp = time_loop(lambda v: rec_fn(dec_fn(v)), x, iters)
    print(f"best D{best[0]}: pair {tp*1e3:.2f} ms "
          f"({nvox/tp/1e6:.0f} Mvox/s)", flush=True)


if __name__ == "__main__":
    main()
