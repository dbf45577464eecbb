"""Hardware timing: 4D pair after the lead-adjoint pair-tree (r4).

The lead adjoint now applies Y per band and X to pair sums (~23% less
lead-stage VPU work for db4); the 3D tree rec result (11.38 -> 8.59 ms)
showed these kernels can be VPU-bound where "at the DMA ceiling" was
assumed. Mirrors bench.py's trace env (x64, plan API, scanned loops)."""

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
    rng = np.random.default_rng(0)
    for shape, wv, level, iters in (
        ((64, 64, 64, 32), "db4", 3, 20),
        ((128, 128, 128, 32), "db4", 3, 6),
        ((128, 128, 128, 32), "haar", 1, 10),
    ):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.float32)
        dec_fn = jax.jit(lambda v, p=plan, L=level: p.dec(v, L, band_axis=0))
        rec_fn = jax.jit(lambda v, p=plan: p.rec(v, band_axis=0))
        xr = np.asarray(rec_fn(dec_fn(x)))
        err = float(np.max(np.abs(xr - np.asarray(x))))
        nvox = int(np.prod(shape))
        # dec-only scan carries the full band array — OOMs HBM at
        # 128^3x32 db4 L3 (46 bands = 12.3 GB live twice); pair only.
        if nvox * 4 * (2 ** len(shape)) * 4 < 8e9:
            td = time_loop(lambda v, f=dec_fn: f(v)[0], x, iters)
            dtxt = f"dec {td*1e3:.2f} ms, "
        else:
            td = None
            dtxt = ""
        tp = time_loop(lambda v: rec_fn(dec_fn(v)), x, iters)
        rtxt = (f", rec-by-subtraction {(tp-td)*1e3:.2f} ms"
                if td is not None else "")
        print(f"{shape} {wv} L{level}: {dtxt}pair "
              f"{tp*1e3:.2f} ms ({nvox/tp/1e6:.0f} Mvox/s){rtxt}, "
              f"roundtrip err {err:.1e}", flush=True)


if __name__ == "__main__":
    main()
