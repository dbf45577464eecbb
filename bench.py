"""Benchmark harness. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline config (BASELINE.md): 3-level db4 NDDWT on a 256^3 volume —
voxels/sec/chip for a full dec+rec pair, float32, on the available
accelerator. ``vs_baseline`` is the speedup over a single-core CPU
FFT-path implementation of the same transform (the stand-in for the
reference's single-core MEX backend, ``mex/nddwt.c`` — FFTW fast
convolution; the reference itself publishes no numbers, BASELINE.md).

Details (all configs, recon error, baseline timings) go to stderr.
Env knobs: BENCH_FAST=1 shrinks sizes/iters for smoke runs.
"""

import json
import os
import sys
import time

import numpy as np

FAST = os.environ.get("BENCH_FAST", "0") == "1"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(arr):
    """True synchronization: scalar readback (block_until_ready is not a
    reliable barrier through the remote-TPU tunnel)."""
    import jax.numpy as jnp

    return float(jnp.sum(jnp.ravel(arr)[:1]))


def time_pair(dec_fn, rec_fn, x, iters):
    """Steady-state wall time of a dec+rec pair inside a jitted scan loop.

    The reference exists for iterative algorithms applying the transform
    hundreds of times (README.md:2); the honest measurement is the fully
    on-device loop, which also amortizes the remote-dispatch overhead of
    the tunneled TPU.
    """
    import jax
    import jax.numpy as jnp

    def body(carry, _):
        return rec_fn(dec_fn(carry)), None

    @jax.jit
    def loop(v):
        out, _ = jax.lax.scan(body, v, None, length=iters)
        return out

    _sync(loop(x))  # warmup/compile
    t0 = time.perf_counter()
    _sync(loop(x))
    return (time.perf_counter() - t0) / iters


def mex_style_pair(x, wavelet, level):
    """Single-core CPU dec+rec mirroring the reference MEX algorithm.

    Precomputed full-size frequency kernels (as ``Functions/nd_dwt_3D.m:334-341``
    caches), then dec = fftn + per-band multiply + ifftn with the approx
    band re-FFT'd per level (``mex/nddwt.c:216-233``), rec = the conjugate
    accumulation (``mex/nddwt.c:142-186``). NumPy's pocketfft stands in for
    FFTW (same asymptotics, comparable single-thread throughput).
    Returns (t_dec, t_rec).
    """
    from non_decimated_wavelets_tpu import filters as flt

    shape, d = x.shape, x.ndim
    nb = 2**d
    F = [flt.frequency_response(wavelet, n) for n in shape]
    kernels = []
    for b in range(nb):
        t = np.ones((1,) * d, dtype=np.complex128)
        for ax in range(d):
            shp = [1] * d
            shp[ax] = shape[ax]
            t = t * F[ax][(b >> ax) & 1].reshape(shp)
        kernels.append(t)

    t0 = time.perf_counter()
    X = np.fft.fftn(x)
    bands = []
    approx_f = X
    for _ in range(level):
        lvl_bands = [np.fft.ifftn(approx_f * kernels[b]) for b in range(nb)]
        approx_f = np.fft.fftn(lvl_bands[0])
        bands = lvl_bands[1:] + bands
    bands = [np.fft.ifftn(approx_f * kernels[0])] + bands  # not exact approx chain; timing proxy
    t_dec = time.perf_counter() - t0

    t0 = time.perf_counter()
    Y = [np.fft.fftn(b) for b in bands[: nb]]
    acc = np.zeros(shape, dtype=np.complex128)
    for b in range(nb):
        acc += Y[b] * np.conj(kernels[b])
    _ = np.fft.ifftn(acc / nb)
    # remaining levels: same cost per level as above
    for lvl in range(1, level):
        Y = [np.fft.fftn(b) for b in bands[: nb]]
        acc = np.zeros(shape, dtype=np.complex128)
        for b in range(nb):
            acc += Y[b] * np.conj(kernels[b])
        _ = np.fft.ifftn(acc / nb)
    t_rec = time.perf_counter() - t0
    return t_dec, t_rec


def main():
    import jax

    jax.config.update("jax_enable_x64", True)  # for the f64 accuracy run
    import jax.numpy as jnp

    import non_decimated_wavelets_tpu as nw
    from non_decimated_wavelets_tpu import oracle

    backend = jax.default_backend()
    dev = jax.devices()[0]
    log(f"backend={backend} device={dev}")

    level = 3
    wavelet = "db4"
    shape = (128, 128, 128) if FAST else (256, 256, 256)
    iters = 3 if FAST else 10
    nvox = int(np.prod(shape))

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(shape).astype(np.float32)

    # ---------------- accelerator throughput (f32, auto path) -------------
    plan = nw.NDDWT(wavelet=wavelet, shape=shape, dtype=jnp.float32)
    x = jax.device_put(jnp.asarray(x_np), dev)

    dec_fn = jax.jit(lambda v: plan.dec(v, level, band_axis=0))
    rec_fn = jax.jit(lambda v: plan.rec(v, band_axis=0))
    t_pair = time_pair(dec_fn, rec_fn, x, iters)
    vps = nvox / t_pair
    log(f"3D {shape} db4 L{level} f32: {t_pair*1e3:.2f} ms/pair -> {vps/1e6:.1f} Mvox/s")

    # f32 roundtrip error (sanity)
    err32 = float(jnp.max(jnp.abs(rec_fn(dec_fn(x)) - x)))
    log(f"f32 roundtrip max-abs err: {err32:.3e}")

    # ---------------- accuracy at float64 (direct path) ------------------
    # TPU FFT is f32-only; the direct path carries the <=1e-12 requirement.
    try:
        err_shape = (64, 64, 64) if FAST else (128, 128, 128)
        xe = rng.standard_normal(err_shape)
        plan64 = nw.NDDWT(wavelet=wavelet, shape=err_shape, dtype=jnp.float64, path="direct")
        y64 = plan64.dec(jnp.asarray(xe), level, band_axis=0)
        err64 = float(jnp.max(jnp.abs(plan64.rec(y64, band_axis=0) - jnp.asarray(xe))))
        log(f"f64 roundtrip max-abs err @ {err_shape}: {err64:.3e}")
    except Exception as e:  # pragma: no cover
        log(f"f64 accuracy run failed: {e!r}")
        err64 = float("nan")

    # ---------------- single-core CPU baseline (MEX stand-in) ------------
    # One dec+rec with the NumPy FFT-path oracle (pocketfft, single
    # process), mirroring mex/nddwt.c's fast-convolution algorithm run
    # single-core. Measured at 128^3 (voxels/s for this algorithm is
    # size-independent to first order; 256^3 f64 takes >10 min of wall
    # clock, which would dominate the bench).
    # Cached: the shared-VM CPU is noisy (observed 11.6s..94s for the same
    # dec across runs); the best observed time is the honest single-core
    # capability figure and is persisted across bench runs.
    base_shape = (64,) * 3 if FAST else (128,) * 3
    cache_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_baseline_cache.json")
    cache = {}
    if os.path.exists(cache_path):
        try:
            cache = json.load(open(cache_path))
        except Exception:
            cache = {}
    key = f"mex_style_{base_shape[0]}cubed_{wavelet}_L{level}"
    xb = rng.standard_normal(base_shape)
    t_dec, t_rec = mex_style_pair(xb, wavelet, level)
    t_base = t_dec + t_rec
    if key in cache:
        t_base = min(t_base, float(cache[key]))
    cache[key] = t_base
    try:
        json.dump(cache, open(cache_path, "w"))
    except Exception:
        pass
    base_vps = int(np.prod(base_shape)) / t_base
    log(
        f"CPU single-process MEX-style baseline @ {base_shape}: "
        f"dec {t_dec:.2f}s rec {t_rec:.2f}s (best-cached pair {t_base:.2f}s) "
        f"-> {base_vps/1e6:.2f} Mvox/s"
    )

    # ---------------- secondary configs (stderr only) ---------------------
    try:
        for cfg_shape, cfg_wav, cfg_level, tag in [
            ((1024,), "db4", 3, "1D db4 L3"),
            ((512, 512), "db4", 3, "2D db4 L3"),
            ((32, 64, 64, 64) if FAST else (128, 128, 128, 32), "db1", 1, "4D haar L1"),
        ]:
            p = nw.NDDWT(wavelet=cfg_wav, shape=cfg_shape, dtype=jnp.float32)
            xi = jax.device_put(jnp.asarray(rng.standard_normal(cfg_shape), jnp.float32), dev)
            df = jax.jit(lambda v, p=p, L=cfg_level: p.dec(v, L, band_axis=0))
            rf = jax.jit(lambda v, p=p: p.rec(v, band_axis=0))
            tp = time_pair(df, rf, xi, max(3, iters // 2))
            log(f"{tag} {cfg_shape}: {tp*1e3:.2f} ms/pair -> {np.prod(cfg_shape)/tp/1e6:.1f} Mvox/s")
    except Exception as e:  # pragma: no cover
        log(f"secondary configs failed: {e!r}")

    # ---------------- end-to-end iterative recon (stderr) ------------------
    # The workload the reference was built for: repeated dec/rec inside a
    # CS recovery loop (README.md:2). FISTA, 2D 512^2, 20 iterations.
    # Image-domain (inpainting) data term: the available TPU backend has no
    # complex arithmetic, so the masked-Fourier variant is CPU-only.
    try:
        from non_decimated_wavelets_tpu.models.cs_recon import fista_inpaint

        n = 512
        img = rng.standard_normal((n, n)).astype(np.float32)
        mask_np = (rng.random((n, n)) < 0.6).astype(np.float32)
        bb = jnp.asarray(mask_np * img)
        p2 = nw.NDDWT(wavelet="db2", shape=(n, n), preserve_l2=True, dtype=jnp.float32)
        run = jax.jit(
            lambda b, m: fista_inpaint(p2, b, m, lam=1e-3, level=3, iters=20)
        )
        mj = jnp.asarray(mask_np)
        _sync(run(bb, mj))  # compile
        t0 = time.perf_counter()
        _sync(run(bb, mj))
        t_fista = time.perf_counter() - t0
        log(f"FISTA inpainting 512^2 db2 L3, 20 iters: {t_fista*1e3:.1f} ms "
            f"({t_fista/20*1e3:.2f} ms/iter)")
    except Exception as e:  # pragma: no cover
        log(f"FISTA benchmark failed: {e!r}")

    size_tag = "x".join(str(s) for s in shape)
    result = {
        "metric": f"voxels/sec/chip, 3-level db4 NDDWT dec+rec, {size_tag} f32",
        "value": round(vps, 1),
        "unit": "voxels/sec",
        "vs_baseline": round(vps / base_vps, 2),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
