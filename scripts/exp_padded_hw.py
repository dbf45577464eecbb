"""Hardware verification of the padded big-odd mode (round 5): 250^3-class
volumes through the plan API — previously refused on TPU."""
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

# oracle exactness at a mid-size odd shape
shape = (130, 70, 90)
p = nw.NDDWT(wavelet="db4", shape=shape, dtype=jnp.float32)
log(f"{shape} path:", p._resolve_path(is_complex=False))
x_np = rng.standard_normal(shape).astype(np.float32)
x = jax.device_put(jnp.asarray(x_np), dev)
df = jax.jit(lambda v: p.dec(v, 3, band_axis=0))
rf = jax.jit(lambda v: p.rec(v, band_axis=0))
t0 = time.perf_counter(); y = df(x); sync(y)
log(f"dec compiled+ran in {time.perf_counter()-t0:.1f}s")
gold = np.moveaxis(oracle.dec(x_np.astype(np.float64), "db4", 3), -1, 0)
err_o = float(np.max(np.abs(np.asarray(y) - gold)))
err_rt = float(jnp.max(jnp.abs(rf(y) - x)))
log(f"{shape}: oracle err {err_o:.3e}, roundtrip {err_rt:.3e}")
assert err_o < 1e-4 and err_rt < 1e-4, (err_o, err_rt)
tp = time_loop(lambda v: rf(df(v)), x, 10)
log(f"{shape} db4 L3 pair: {tp*1e3:.2f} ms -> {np.prod(shape)/tp/1e6:.1f} Mvox/s")

# the 250^3 target
shape = (250, 250, 250)
p = nw.NDDWT(wavelet="db4", shape=shape, dtype=jnp.float32)
log(f"{shape} path:", p._resolve_path(is_complex=False))
x = jax.device_put(jnp.asarray(rng.standard_normal(shape), jnp.float32), dev)
df = jax.jit(lambda v: p.dec(v, 3, band_axis=0))
rf = jax.jit(lambda v: p.rec(v, band_axis=0))
err_rt = float(jnp.max(jnp.abs(rf(df(x)) - x)))
log(f"250^3 roundtrip err {err_rt:.3e}")
assert err_rt < 1e-4
tp = time_loop(lambda v: rf(df(v)), x, 5)
log(f"250^3 db4 L3 pair: {tp*1e3:.2f} ms -> {np.prod(shape)/tp/1e6:.1f} Mvox/s")
log("PADDED HW CHECKS PASSED")
