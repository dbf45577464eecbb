"""Hardware verification of the ragged row-grid Pallas kernels (round 5).

Runs the reference's own awkward test configs on the real TPU through the
plan API, checks oracle exactness, and times the pair. Mirrors bench.py's
structure (x64 on, plan API, scan time_loop) per the CLAUDE.md lesson that
ops-layer-direct timing scripts hang on the tunnel.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python
scripts/exp_ragged_hw.py
"""

import faulthandler
import sys
import time

faulthandler.dump_traceback_later(2100, exit=True)

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import non_decimated_wavelets_tpu as nw
from non_decimated_wavelets_tpu import oracle


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(arr):
    return float(jnp.sum(jnp.ravel(arr)[:1]))


def time_loop(step_fn, x, iters):
    def body(carry, _):
        return step_fn(carry), None

    @jax.jit
    def loop(v):
        out, _ = jax.lax.scan(body, v, None, length=iters)
        return out

    _sync(loop(x))
    t0 = time.perf_counter()
    _sync(loop(x))
    return (time.perf_counter() - t0) / iters


def main():
    dev = jax.devices()[0]
    log(f"backend={jax.default_backend()} device={dev}")
    rng = np.random.default_rng(0)

    for shape, wv, level, tag in [
        ((164, 64, 40), "db4", 2, "3D odd db4"),
        ((164, 64, 40), ("db1", "db3", "db9"), 2, "3D odd mixed"),
        ((64, 64, 20, 10), "db2", 2, "4D odd db2"),
        ((19, 257), "db4", 1, "tiny ragged 2D"),
    ]:
        p = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.float32)
        path = p._resolve_path(is_complex=False)
        log(f"{tag} {shape}: path={path}")
        assert path == "pallas", path
        x_np = rng.standard_normal(shape).astype(np.float32)
        x = jax.device_put(jnp.asarray(x_np), dev)
        df = jax.jit(lambda v, p=p, L=level: p.dec(v, L, band_axis=0))
        rf = jax.jit(lambda v, p=p: p.rec(v, band_axis=0))
        t0 = time.perf_counter()
        y = df(x)
        _sync(y)
        log(f"{tag}: dec compiled+ran in {time.perf_counter()-t0:.1f}s")
        y_ref = np.moveaxis(
            oracle.dec(x_np.astype(np.float64), wv, level), -1, 0
        )
        err_o = float(np.max(np.abs(np.asarray(y) - y_ref)))
        xr = rf(y)
        err_rt = float(jnp.max(jnp.abs(xr - x)))
        log(f"{tag}: oracle err {err_o:.3e}, roundtrip err {err_rt:.3e}")
        assert err_o < 1e-4 and err_rt < 1e-4, (err_o, err_rt)
        tp = time_pair = time_loop(lambda v: rf(df(v)), x, 10)
        log(f"{tag}: pair {tp*1e3:.2f} ms -> "
            f"{np.prod(shape)/tp/1e6:.1f} Mvox/s")
    log("ALL RAGGED HARDWARE CHECKS PASSED")


if __name__ == "__main__":
    main()
