"""Hardware verification + timing of the compensated double-f32 kernels
(f64 contract at Pallas speed — BASELINE "100x at <=1e-12"). Mirrors
bench.py structure (x64, plan API, scan time_loop)."""
import faulthandler, sys, time
faulthandler.dump_traceback_later(2100, exit=True)
import numpy as np, jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import non_decimated_wavelets_tpu as nw
from non_decimated_wavelets_tpu import oracle

def log(*a): print(*a, file=sys.stderr, flush=True)
def sync(a): return float(jnp.sum(jnp.ravel(a)[:1]))
def time_loop(fn, x, iters):
    import jax.lax as lax
    @jax.jit
    def loop(v):
        out, _ = lax.scan(lambda c, _: (fn(c), None), v, None, length=iters)
        return out
    sync(loop(x)); t0 = time.perf_counter(); sync(loop(x))
    return (time.perf_counter() - t0) / iters

dev = jax.devices()[0]
log("backend", jax.default_backend())
rng = np.random.default_rng(0)

# accuracy vs oracle at 128^3 (hardware Mosaic semantics of the EFT chain)
shape = (128, 128, 128)
p = nw.NDDWT(wavelet="db4", shape=shape, dtype=jnp.float64)
log("path:", p._resolve_path(is_complex=False))
x_np = rng.standard_normal(shape)
x = jax.device_put(jnp.asarray(x_np), dev)
df = jax.jit(lambda v: p.dec(v, 3, band_axis=0))
rf = jax.jit(lambda v: p.rec(v, band_axis=0))
t0 = time.perf_counter(); y = df(x); sync(y)
log(f"df32 dec compiled+ran in {time.perf_counter()-t0:.1f}s")
gold = np.moveaxis(oracle.dec(x_np, "db4", 3), -1, 0)
err_o = float(np.max(np.abs(np.asarray(y) - gold)))
err_rt = float(jnp.max(jnp.abs(rf(y) - x)))
log(f"128^3 dec-vs-oracle err {err_o:.3e}, roundtrip err {err_rt:.3e}")

# throughput at 256^3 (the contract config)
shape = (256, 256, 256)
p = nw.NDDWT(wavelet="db4", shape=shape, dtype=jnp.float64)
x = jax.device_put(jnp.asarray(rng.standard_normal(shape)), dev)
df = jax.jit(lambda v: p.dec(v, 3, band_axis=0))
rf = jax.jit(lambda v: p.rec(v, band_axis=0))
err_rt = float(jnp.max(jnp.abs(rf(df(x)) - x)))
tp = time_loop(lambda v: rf(df(v)), x, 5)
log(f"256^3 db4 L3 df32: {tp*1e3:.1f} ms/pair -> "
    f"{np.prod(shape)/tp/1e6:.2f} Mvox/s (roundtrip err {err_rt:.3e})")
log("target: >=59.5 Mvox/s at <=1e-12")
