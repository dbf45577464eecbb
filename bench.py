"""Benchmark harness. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline config (BASELINE.md): 3-level db4 NDDWT on a 256^3 volume —
voxels/sec/chip for a full dec+rec pair, float32, on the available
accelerator. ``vs_baseline`` is the speedup over the in-tree native C++
engine (``native/nddwt_cpu.cpp``) run SINGLE-CORE — the honest
apples-to-apples stand-in for the reference's single-core MEX backend
(``mex/nddwt.c``; the reference itself publishes no numbers, BASELINE.md).

Wedge-survival layout (the tunneled TPU can wedge for 20 min - 2+ h,
CLAUDE.md): the CPU-only native baseline runs FIRST, the backend wait is
bounded (~8 min worst case), the headline JSON line prints IMMEDIATELY
after the 256^3 measurement, every secondary config is individually
guarded, and a SIGTERM/SIGINT handler emits the already-measured headline
if the driver times the run out mid-secondaries.

Details (all configs, recon error, baseline timings) go to stderr and are
checkpointed to ``.bench_details.json`` as configs complete.
Env knobs: BENCH_FAST=1 shrinks sizes/iters for smoke runs.
"""

import json
import os
import signal
import sys
import time

import numpy as np

FAST = os.environ.get("BENCH_FAST", "0") == "1"
_HERE = os.path.dirname(os.path.abspath(__file__))
_DETAILS_PATH = os.path.join(_HERE, ".bench_details.json")

_headline = None  # set once measured; printed exactly once
_headline_printed = False
_details = {}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _emit_headline():
    """Print the ONE stdout JSON line (idempotent)."""
    global _headline_printed
    if _headline is not None and not _headline_printed:
        _headline_printed = True
        print(json.dumps(_headline), flush=True)


def _checkpoint(key, value):
    """Record a secondary result; best-effort details file for post-mortems."""
    _details[key] = value
    try:
        json.dump(_details, open(_DETAILS_PATH, "w"), indent=1)
    except Exception:
        pass


def _on_term(signum, frame):  # pragma: no cover - signal path
    log(f"signal {signum}: emitting headline (if measured) and exiting")
    _emit_headline()
    os._exit(0 if _headline_printed else 1)


def _sync(arr):
    """True synchronization: scalar readback (block_until_ready is not a
    reliable barrier through the remote-TPU tunnel)."""
    import jax.numpy as jnp

    return float(jnp.sum(jnp.ravel(arr)[:1]))


def time_loop(step_fn, x, iters):
    """Steady-state wall time of ``step_fn`` inside a jitted scan loop.

    The reference exists for iterative algorithms applying the transform
    hundreds of times (README.md:2); the honest measurement is the fully
    on-device loop, which also amortizes the remote-dispatch overhead of
    the tunneled TPU.
    """
    import jax

    def body(carry, _):
        return step_fn(carry), None

    @jax.jit
    def loop(v):
        out, _ = jax.lax.scan(body, v, None, length=iters)
        return out

    _sync(loop(x))  # warmup/compile
    t0 = time.perf_counter()
    _sync(loop(x))
    return (time.perf_counter() - t0) / iters


def time_pair(dec_fn, rec_fn, x, iters):
    return time_loop(lambda v: rec_fn(dec_fn(v)), x, iters)


def _cache(path):
    if os.path.exists(path):
        try:
            return json.load(open(path))
        except Exception:
            pass
    return {}


def native_singlecore_pair(shape, wavelet, level):
    """Single-core timing of the in-tree native C++ engine (the reference
    MEX layer's counterpart, ``native/nddwt_cpu.cpp``), f64 as the
    reference's MEX path mandates (``mex/nd_dwt_mex.c:23-30``).

    Returns (t_pair_seconds, roundtrip_err) or None if the extension is
    not built."""
    from non_decimated_wavelets_tpu.native import cpu_backend as cb

    if not cb.available():
        return None
    cb.set_num_threads(1)
    try:
        rng = np.random.default_rng(7)
        x = rng.standard_normal(shape)
        t0 = time.perf_counter()
        y = cb.dec(x, wavelet, level, False)
        t1 = time.perf_counter()
        xr = cb.rec(y, wavelet, False)
        t2 = time.perf_counter()
        err = float(np.max(np.abs(xr - x)))
        return (t2 - t0), err
    finally:
        cb.set_num_threads(os.cpu_count() or 1)


def measure_baseline(wavelet, level):
    """Single-core native baseline (MEX counterpart) — CPU only, no jax.

    Runs FIRST so a wedged TPU tunnel cannot cost us the denominator.
    Best-observed time is cached: the shared-VM CPU is noisy (observed
    >8x swings for identical runs)."""
    base_shape = (64,) * 3 if FAST else (128,) * 3
    cache_path = os.path.join(_HERE, ".bench_baseline_cache.json")
    cache = _cache(cache_path)
    key = f"native1core_{base_shape[0]}cubed_{wavelet}_L{level}"
    try:
        res = native_singlecore_pair(base_shape, wavelet, level)
    except Exception as e:  # pragma: no cover
        log(f"native baseline run failed: {e!r}")
        res = None
    if res is None:
        log("native backend not built; run `make -C native` (using cached "
            "baseline if available)")
        t_base = float(cache.get(key, float("nan")))
    else:
        t_base, base_err = res
        log(f"native single-core pair @ {base_shape}: {t_base:.2f}s "
            f"(err {base_err:.2e})")
        if key in cache:
            t_base = min(t_base, float(cache[key]))
    cache[key] = t_base
    try:
        json.dump(cache, open(cache_path, "w"))
    except Exception:
        pass
    base_vps = int(np.prod(base_shape)) / t_base
    log(f"single-core native baseline: {base_vps/1e6:.3f} Mvox/s "
        f"(best-cached)")
    return base_vps


def _wait_for_backend(attempts=6, probe_timeout=120, sleep_s=60):
    """Bounded wait for the TPU tunnel (worst case ~17 min — it must fit
    well inside the driver's window; r2's ~33-min schedule consumed the
    whole window and delivered nothing, VERDICT r2 item 1). Probed in a
    SUBPROCESS because a failed in-process backend init is sticky in
    jax's xla_bridge. On False the caller must NOT touch jax in-process:
    a wedged tunnel hangs jax.devices() itself (observed 3+ h)."""
    import subprocess

    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout,
                capture_output=True,
            )
            if r.returncode == 0:
                return True
            log(f"backend probe failed (attempt {i + 1}/{attempts})")
        except subprocess.TimeoutExpired:
            log(f"backend probe hung (attempt {i + 1}/{attempts})")
        if i + 1 < attempts:
            time.sleep(sleep_s)
    log("backend still unavailable after bounded wait; proceeding "
        "(will fail loudly rather than silently eat the window)")
    return False


def main():
    global _headline
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    level = 3
    wavelet = "db4"

    # ------------- single-core native baseline (CPU, no jax) -------------
    base_vps = measure_baseline(wavelet, level)
    _checkpoint("baseline_Mvox_s", round(base_vps / 1e6, 3))

    if not _wait_for_backend():
        # Proceeding would hang IN-PROCESS on jax.devices() (a wedged
        # tunnel hangs even device enumeration, observed 3+ h) and the
        # driver would record nothing — the r2 failure mode. Emit a
        # parseable record of the outage instead.
        _headline = {
            "metric": "voxels/sec/chip, 3-level db4 NDDWT dec+rec, "
                      "UNMEASURED (TPU tunnel wedged through the whole "
                      "bench window; see .bench_details.json)",
            "value": 0.0,
            "unit": "voxels/sec",
            "vs_baseline": 0.0,
        }
        _emit_headline()
        return
    import jax

    jax.config.update("jax_enable_x64", True)  # for the f64 accuracy run
    import jax.numpy as jnp

    import non_decimated_wavelets_tpu as nw

    backend = jax.default_backend()
    dev = jax.devices()[0]
    log(f"backend={backend} device={dev}")

    # Iteration counts per config: the tunneled TPU has a fixed ~30 ms
    # dispatch+sync overhead PER TIMED LOOP CALL (measured: 2D 512^2 pair
    # reads 3.68 ms/pair at 10 scan iters but 0.87 at 100); every config
    # needs enough in-loop iterations that this fixed cost is noise. The
    # reference's whole use case is 100+-iteration recon loops
    # (README.md:2, BASELINE config #5), so the amortized number is the
    # honest one.
    shape = (128, 128, 128) if FAST else (256, 256, 256)
    iters = 3 if FAST else 30
    iters_small = 5 if FAST else 100
    iters_4d = 3 if FAST else 10
    nvox = int(np.prod(shape))

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(shape).astype(np.float32)

    # ---------------- HEADLINE: accelerator throughput (f32) -------------
    plan = nw.NDDWT(wavelet=wavelet, shape=shape, dtype=jnp.float32)
    x = jax.device_put(jnp.asarray(x_np), dev)

    dec_fn = jax.jit(lambda v: plan.dec(v, level, band_axis=0))
    rec_fn = jax.jit(lambda v: plan.rec(v, band_axis=0))
    t_pair = time_pair(dec_fn, rec_fn, x, iters)
    vps = nvox / t_pair
    log(f"3D {shape} db4 L{level} f32: {t_pair*1e3:.2f} ms/pair -> {vps/1e6:.1f} Mvox/s")

    size_tag = "x".join(str(s) for s in shape)
    _headline = {
        "metric": f"voxels/sec/chip, 3-level db4 NDDWT dec+rec, {size_tag} f32",
        "value": round(vps, 1),
        "unit": "voxels/sec",
        "vs_baseline": round(vps / base_vps, 2),
    }
    # Print NOW: a wedge during any secondary config must not cost the
    # round its verified headline number (VERDICT r2 item 1).
    _emit_headline()
    _checkpoint("headline_3D_Mvox_s", round(vps / 1e6, 1))

    # ---------------- secondary configs (stderr only) ---------------------
    # f32 roundtrip error (sanity)
    try:
        err32 = float(jnp.max(jnp.abs(rec_fn(dec_fn(x)) - x)))
        log(f"f32 roundtrip max-abs err: {err32:.3e}")
        _checkpoint("err_f32", err32)
    except Exception as e:  # pragma: no cover
        log(f"f32 error check failed: {e!r}")

    # bf16 storage: the Pallas kernels are DMA-bound, so halving the bytes
    # is near-free throughput for loops that tolerate ~3-digit precision.
    try:
        plan16 = nw.NDDWT(wavelet=wavelet, shape=shape, dtype=jnp.bfloat16)
        x16 = jax.device_put(jnp.asarray(x_np, jnp.bfloat16), dev)
        d16 = jax.jit(lambda v: plan16.dec(v, level, band_axis=0))
        r16 = jax.jit(lambda v: plan16.rec(v, band_axis=0))
        t16 = time_pair(d16, r16, x16, iters)
        log(f"3D {shape} db4 L{level} bf16: {t16*1e3:.2f} ms/pair -> "
            f"{nvox/t16/1e6:.1f} Mvox/s")
        _checkpoint("bf16_3D_Mvox_s", round(nvox / t16 / 1e6, 1))
        del x16
    except Exception as e:  # pragma: no cover
        log(f"bf16 config failed: {e!r}")

    # ---------------- accuracy at float64 (direct path) ------------------
    # TPU has no f64 FFT; the direct path carries the <=1e-12 requirement
    # (BASELINE.md: verified at the flagship 256^3 size).
    try:
        err_shape = (64, 64, 64) if FAST else (256, 256, 256)
        xe = rng.standard_normal(err_shape)
        plan64 = nw.NDDWT(wavelet=wavelet, shape=err_shape, dtype=jnp.float64, path="direct")
        y64 = plan64.dec(jnp.asarray(xe), level, band_axis=0)
        err64 = float(jnp.max(jnp.abs(plan64.rec(y64, band_axis=0) - jnp.asarray(xe))))
        log(f"f64 roundtrip max-abs err @ {err_shape}: {err64:.3e}")
        _checkpoint("err_f64", err64)
        del y64
    except Exception as e:  # pragma: no cover
        log(f"f64 accuracy run failed: {e!r}")

    # ---------------- f64 THROUGHPUT (compensated double-f32 kernels) ----
    # The driver target couples throughput and accuracy: ">=100x the MEX
    # single-core baseline at <=1e-12 max-abs error" (BASELINE.md:19-20).
    # This config demonstrates BOTH on one line: the df32 kernels
    # (ops/pallas_df32.py — error-free-transformation f32 pairs, ~47-bit
    # mantissa) at the flagship 256^3 size. The error is GATED, not just
    # logged: EFT correctness depends on the compiler preserving rounding
    # structure, so a toolchain update that breaks it must fail the run.
    try:
        shape64 = (128, 128, 128) if FAST else (256, 256, 256)
        p64t = nw.NDDWT(wavelet=wavelet, shape=shape64, dtype=jnp.float64)
        path64 = p64t._resolve_path(is_complex=False)
        x64v = jax.device_put(
            jnp.asarray(rng.standard_normal(shape64)), dev
        )
        d64 = jax.jit(lambda v: p64t.dec(v, level, band_axis=0))
        r64 = jax.jit(lambda v: p64t.rec(v, band_axis=0))
        err64t = float(jnp.max(jnp.abs(r64(d64(x64v)) - x64v)))
        if not (err64t < 1e-12):
            _checkpoint("f64 throughput FAILED_err", err64t)
            raise RuntimeError(
                f"f64 (df32) accuracy gate FAILED: {err64t:.3e} >= 1e-12"
            )
        t64 = time_pair(d64, r64, x64v, 2 if FAST else 5)
        v64 = np.prod(shape64) / t64
        log(f"3D {shape64} db4 L{level} f64[{path64}]: {t64*1e3:.1f} "
            f"ms/pair -> {v64/1e6:.2f} Mvox/s at err {err64t:.2e} "
            f"({v64/base_vps:.0f}x single-core baseline; target >=100x "
            "at <=1e-12)")
        _checkpoint("f64_3D_Mvox_s", round(v64 / 1e6, 2))
        _checkpoint("f64_3D_err", err64t)
        _checkpoint("f64_vs_baseline_x", round(v64 / base_vps, 1))
        del x64v
    except Exception as e:  # pragma: no cover
        log(f"f64 throughput config failed: {e!r}")

    # Small configs (1D/2D) use the fused dec_rec pair — one kernel launch
    # per iterate on resident shapes (the launch floor otherwise dominates:
    # ~1.5 ms/launch through the tunnel).
    for cfg_shape, cfg_wav, cfg_level, tag in [
        ((1024,), "db4", 3, "1D db4 L3"),
        ((512, 512), "db4", 3, "2D db4 L3"),
    ]:
        try:
            p = nw.NDDWT(wavelet=cfg_wav, shape=cfg_shape, dtype=jnp.float32)
            xi = jax.device_put(jnp.asarray(rng.standard_normal(cfg_shape), jnp.float32), dev)
            step = jax.jit(
                lambda v, p=p, L=cfg_level: p.dec_rec(v, L, band_axis=0)[1]
            )
            tp = time_loop(step, xi, iters_small)
            log(f"{tag} {cfg_shape} fused pair: {tp*1e3:.2f} ms/pair -> "
                f"{np.prod(cfg_shape)/tp/1e6:.1f} Mvox/s")
            _checkpoint(f"{tag} pair ms", round(tp * 1e3, 3))
        except Exception as e:  # pragma: no cover
            log(f"{tag} failed: {e!r}")

    # Multi-iterate kernels: N dec->shrink->rec sweeps inside ONE launch
    # (plan.dec_rec_n) — the per-launch tunnel latency (~1.5 ms) is paid
    # once per CHAIN instead of once per sweep, so small-shape iterative
    # cost approaches pure compute+DMA.
    for cfg_shape, cfg_wav, cfg_level, n_sweeps, tag in [
        ((1024,), "db4", 3, 10 if FAST else 100, "1D db4 L3 chain"),
        ((264, 264), "db2", 2, 5 if FAST else 50, "2D 264^2 db2 L2 chain"),
    ]:
        try:
            p = nw.NDDWT(wavelet=cfg_wav, shape=cfg_shape, dtype=jnp.float32)
            xi = jax.device_put(
                jnp.asarray(rng.standard_normal(cfg_shape), jnp.float32), dev
            )
            lams = (1e-3,) * n_sweeps
            run_n = jax.jit(
                lambda v, p=p, L=cfg_level, lams=lams: p.dec_rec_n(v, L, lams)
            )
            _sync(run_n(xi))  # compile
            t0 = time.perf_counter()
            _sync(run_n(xi))
            tp = (time.perf_counter() - t0) / n_sweeps
            log(f"{tag} {cfg_shape} x{n_sweeps} one-launch: "
                f"{tp*1e3:.3f} ms/sweep")
            _checkpoint(f"{tag} ms_per_sweep", round(tp * 1e3, 3))
        except Exception as e:  # pragma: no cover
            log(f"{tag} failed: {e!r}")

    # Whole-solve in-kernel FISTA (flat multi-iterate kernel): the ENTIRE
    # reconstruction — data term, shrink, momentum, N iterations — is one
    # kernel launch with the solver state resident in VMEM.
    try:
        from non_decimated_wavelets_tpu.models.cs_recon import fista_inpaint

        n_ws = 256
        ws_iters = 10 if FAST else 100
        img_ws = rng.standard_normal((n_ws, n_ws)).astype(np.float32)
        mask_ws = (rng.random((n_ws, n_ws)) < 0.6).astype(np.float32)
        p_ws = nw.NDDWT(wavelet="db2", shape=(n_ws, n_ws), preserve_l2=True,
                        dtype=jnp.float32)
        run_ws = jax.jit(
            lambda b, m: fista_inpaint(p_ws, b, m, lam=1e-3, level=2,
                                       iters=ws_iters)
        )
        b_ws = jnp.asarray(mask_ws * img_ws)
        m_ws = jnp.asarray(mask_ws)
        _sync(run_ws(b_ws, m_ws))
        t0 = time.perf_counter()
        _sync(run_ws(b_ws, m_ws))
        t_ws = time.perf_counter() - t0
        log(f"FISTA 256^2 db2 L2 whole-solve in-kernel, {ws_iters} iters: "
            f"{t_ws*1e3:.1f} ms ({t_ws/ws_iters*1e3:.3f} ms/iter)")
        _checkpoint("FISTA 256^2 in-kernel ms_per_iter",
                    round(t_ws / ws_iters * 1e3, 3))
    except Exception as e:  # pragma: no cover
        log(f"whole-solve FISTA failed: {e!r}")

    # 4D configs: Haar L1 (BASELINE config #4) and db4 L3 (the 4D row of
    # the BASELINE metric) on the two-stage lane-flatten Pallas kernels.
    for cfg_shape, cfg_wav, cfg_level, tag in [
        ((32, 64, 64, 64) if FAST else (128, 128, 128, 32), "db1", 1,
         "4D haar L1"),
        ((32, 32, 32, 32) if FAST else (128, 128, 128, 32), "db4", 3,
         "4D db4 L3"),
        ((32, 32, 32, 32) if FAST else (128, 128, 64, 32), "db4", 3,
         "4D db4 L3 (small)"),
    ]:
        try:
            p = nw.NDDWT(wavelet=cfg_wav, shape=cfg_shape, dtype=jnp.float32)
            xi = jax.device_put(
                jnp.asarray(rng.standard_normal(cfg_shape), jnp.float32), dev
            )
            df = jax.jit(lambda v, p=p, L=cfg_level: p.dec(v, L, band_axis=0))
            rf = jax.jit(lambda v, p=p: p.rec(v, band_axis=0))
            tp = time_pair(df, rf, xi, iters_4d)
            log(f"{tag} {cfg_shape}: {tp*1e3:.2f} ms/pair -> "
                f"{np.prod(cfg_shape)/tp/1e6:.1f} Mvox/s")
            _checkpoint(f"{tag} Mvox_s", round(np.prod(cfg_shape) / tp / 1e6, 1))
            del xi
        except Exception as e:  # pragma: no cover
            log(f"{tag} failed: {e!r}")

    # ---------------- odd-shape (ragged) configs --------------------------
    # The reference's own awkward test sizes
    # (/root/reference/Test/nddwt3D_test.m:5, Test/nddwt4D_test.m:5) run
    # HERE on hardware via the round-5 ragged row-grid Pallas kernels —
    # previously these shapes silently fell to the hazardous XLA direct
    # path (VERDICT r4 item 1). Exactness is checked against the NumPy
    # oracle (reference semantics), not just the roundtrip.
    try:
        from non_decimated_wavelets_tpu import oracle

        odd_cfgs = [
            ((164, 64, 40), "db4", 2, "3D odd 164x64x40 db4 L2"),
            ((164, 64, 40), ("db1", "db3", "db9"), 2,
             "3D odd 164x64x40 mixed L2"),
            ((64, 64, 20, 10), "db2", 2, "4D odd 64x64x20x10 db2 L2"),
        ]
        if not FAST:  # the NumPy oracle at these sizes costs minutes
            odd_cfgs += [
                # big-odd padded mode
                ((130, 70, 90), "db4", 3, "3D odd 130x70x90 db4 L3"),
                # 4D padded mode (dynamic-MRI-class odd frames/slices)
                ((64, 64, 100, 25), "db4", 3,
                 "4D odd 64x64x100x25 db4 L3"),
                # chunked long-1D mode (beyond the flat kernels' budget)
                ((1_000_000,), "db4", 3, "1D 1M db4 L3"),
            ]
        for cfg_shape, cfg_wav, cfg_level, tag in odd_cfgs:
            p = nw.NDDWT(wavelet=cfg_wav, shape=cfg_shape,
                         dtype=jnp.float32)
            assert p._resolve_path(is_complex=False) == "pallas", (
                f"{tag}: expected pallas dispatch, got "
                f"{p._resolve_path(is_complex=False)}"
            )
            xo_np = rng.standard_normal(cfg_shape).astype(np.float32)
            xo = jax.device_put(jnp.asarray(xo_np), dev)
            df = jax.jit(lambda v, p=p, L=cfg_level: p.dec(v, L,
                                                           band_axis=0))
            rf = jax.jit(lambda v, p=p: p.rec(v, band_axis=0))
            yo = df(xo)
            # Oracle exactness on hardware (band order + scaling parity
            # with the reference semantics, f64 oracle vs f32 kernels).
            # Above ~5M voxels the NumPy oracle costs ~10 CPU-minutes,
            # so the largest configs keep only the roundtrip gate (their
            # oracle exactness is pinned by the interpret-mode tests and
            # was hardware-recorded in the r5 experiment logs).
            if np.prod(cfg_shape) <= 5_000_000:
                y_ref = np.moveaxis(
                    oracle.dec(xo_np.astype(np.float64), cfg_wav,
                               cfg_level),
                    -1, 0,
                )
                err_o = float(np.max(np.abs(np.asarray(yo) - y_ref)))
            else:
                err_o = 0.0
            err_rt = float(jnp.max(jnp.abs(rf(yo) - xo)))
            if not (err_o < 1e-4 and err_rt < 1e-4):
                _checkpoint(f"{tag} FAILED_err", {"oracle": err_o,
                                                  "roundtrip": err_rt})
                raise RuntimeError(
                    f"{tag}: exactness FAILED (oracle {err_o:.3e}, "
                    f"roundtrip {err_rt:.3e})"
                )
            tp = time_pair(df, rf, xo, iters_4d)
            log(f"{tag}: {tp*1e3:.2f} ms/pair -> "
                f"{np.prod(cfg_shape)/tp/1e6:.1f} Mvox/s "
                f"(oracle err {err_o:.2e}, rt err {err_rt:.2e})")
            _checkpoint(f"{tag} Mvox_s",
                        round(np.prod(cfg_shape) / tp / 1e6, 1))
            _checkpoint(f"{tag} oracle_err", err_o)
            del xo, yo
    except Exception as e:  # pragma: no cover
        log(f"odd-shape (ragged) bench failed: {e!r}")

    # ---------------- sharded pair on this chip (shard_map path) ----------
    # The multi-chip compute path (Pallas 'valid' kernels + ppermute halos)
    # run on a 1-device mesh: per-chip throughput should track the
    # unsharded Pallas path (VERDICT r1 item 2).
    try:
        from non_decimated_wavelets_tpu.parallel import ShardedNDDWT, make_mesh

        # f32 tolerance for the exactness gate: the unsharded roundtrip
        # measures ~1.4e-6; a sharded tile-selection regression (the r2
        # interior-vs-boundary class of bug) produces O(1) garbage. A
        # huge error must FAIL the config, not ride along with a healthy
        # throughput number (ADVICE r4).
        SHARD_TOL = 1e-4

        # Same-process unsharded re-measurement immediately before the
        # sharded configs: the headline was taken much earlier in the
        # process (different allocator/cache state), and the r3/r4
        # same-process A/Bs measured a 1.02x true residue vs the 1.13x
        # the stale comparison suggested (VERDICT r4 item 6).
        t_ref = time_pair(dec_fn, rec_fn, x, max(3, iters // 3))
        log(f"3D unsharded re-measured (A/B reference): {t_ref*1e3:.2f} ms")
        _checkpoint("3D unsharded AB_ref_ms", round(t_ref * 1e3, 3))

        for mesh_axes, spec, tag in (
            ({"x": 1}, ("x", None, None), "x-sharded"),
            ({"x": 1, "y": 1}, ("x", "y", None), "xy-sharded"),
        ):
            mesh = make_mesh(mesh_axes, jax.devices()[:1])
            sh = ShardedNDDWT(plan, mesh, spec, use_pallas=True)
            xs = sh.shard_input(x)
            dec_s = sh.dec_fn(level)
            rec_s = sh.rec_fn(level)
            # HARDWARE exactness, not just throughput: interpret-mode CI
            # has missed sharded tile-selection bugs before (the r2
            # interior-vs-boundary lesson, CLAUDE.md).
            errs = float(jnp.max(jnp.abs(rec_s(dec_s(xs)) - x)))
            if not (errs < SHARD_TOL):
                _checkpoint(f"3D {tag} FAILED_err", errs)
                raise RuntimeError(
                    f"sharded exactness FAILED ({tag}): err {errs:.3e} "
                    f">= {SHARD_TOL:.0e}"
                )
            tp = time_pair(dec_s, rec_s, xs, max(3, iters // 3))
            log(f"3D {shape} {tag}(1-dev mesh) pair: {tp*1e3:.2f} ms -> "
                f"{nvox/tp/1e6:.1f} Mvox/s per chip (err {errs:.2e}, "
                f"residue {tp/t_ref:.3f}x vs same-process unsharded)")
            _checkpoint(f"3D {tag} Mvox_s", round(nvox / tp / 1e6, 1))
            _checkpoint(f"3D {tag} err", errs)
            _checkpoint(f"3D {tag} residue_x", round(tp / t_ref, 3))

        # 4D sharded (the BASELINE config #5 compute path, scaled to 1 chip)
        shape4 = (32, 32, 16, 16) if FAST else (64, 64, 64, 32)
        p4s = nw.NDDWT(wavelet="db4", shape=shape4, dtype=jnp.float32)
        mesh = make_mesh({"x": 1}, jax.devices()[:1])
        sh4 = ShardedNDDWT(p4s, mesh, ("x", None, None, None),
                           use_pallas=True)
        x4 = jax.device_put(
            jnp.asarray(rng.standard_normal(shape4), jnp.float32), dev
        )
        x4s = sh4.shard_input(x4)
        err4s = float(jnp.max(jnp.abs(
            sh4.rec_fn(level)(sh4.dec_fn(level)(x4s)) - x4
        )))
        if not (err4s < SHARD_TOL):
            _checkpoint("4D x-sharded FAILED_err", err4s)
            raise RuntimeError(
                f"4D sharded exactness FAILED: err {err4s:.3e} "
                f">= {SHARD_TOL:.0e}"
            )
        tp = time_pair(sh4.dec_fn(level), sh4.rec_fn(level), x4s, iters_4d)
        log(f"4D {shape4} x-sharded(1-dev mesh) db4 L{level} pair: "
            f"{tp*1e3:.2f} ms -> {np.prod(shape4)/tp/1e6:.1f} Mvox/s per "
            f"chip (err {err4s:.2e})")
        _checkpoint("4D x-sharded err", err4s)
        _checkpoint("4D x-sharded Mvox_s",
                    round(np.prod(shape4) / tp / 1e6, 1))
    except Exception as e:  # pragma: no cover
        log(f"sharded bench failed: {e!r}")

    # ---------------- end-to-end iterative recon (stderr) ------------------
    # The workload the reference was built for: repeated dec/rec inside a
    # CS recovery loop (README.md:2). FISTA, 2D 512^2, 20 iterations.
    # Image-domain (inpainting) data term: the available TPU backend has no
    # complex arithmetic, so the masked-Fourier variant is CPU-only.
    try:
        from non_decimated_wavelets_tpu.models.cs_recon import fista_inpaint

        n = 512
        fista_iters = 20 if FAST else 100
        img = rng.standard_normal((n, n)).astype(np.float32)
        mask_np = (rng.random((n, n)) < 0.6).astype(np.float32)
        bb = jnp.asarray(mask_np * img)
        p2 = nw.NDDWT(wavelet="db2", shape=(n, n), preserve_l2=True, dtype=jnp.float32)
        run = jax.jit(
            lambda b, m: fista_inpaint(p2, b, m, lam=1e-3, level=3,
                                       iters=fista_iters)
        )
        mj = jnp.asarray(mask_np)
        _sync(run(bb, mj))  # compile
        t0 = time.perf_counter()
        _sync(run(bb, mj))
        t_fista = time.perf_counter() - t0
        log(f"FISTA inpainting 512^2 db2 L3, {fista_iters} iters: "
            f"{t_fista*1e3:.1f} ms ({t_fista/fista_iters*1e3:.2f} ms/iter)")
        _checkpoint("FISTA ms_per_iter", round(t_fista / fista_iters * 1e3, 3))

        # Split-complex variant (the reference's flagship MRI use on the
        # complex-less TPU backend): per-component Pallas transforms +
        # fused magnitude-shrink + fused glue, no XLA elementwise.
        from non_decimated_wavelets_tpu.models.cs_recon import (
            fista_inpaint_split,
        )

        imag = rng.standard_normal((n, n)).astype(np.float32)
        pair = jnp.asarray(np.stack([mask_np * img, mask_np * imag]))
        run_s = jax.jit(
            lambda p, m: fista_inpaint_split(p2, p, m, lam=1e-3, level=3,
                                             iters=fista_iters)
        )
        _sync(run_s(pair, mj))
        t0 = time.perf_counter()
        _sync(run_s(pair, mj))
        t_fs = time.perf_counter() - t0
        log(f"FISTA split-complex 512^2 db2 L3, {fista_iters} iters: "
            f"{t_fs*1e3:.1f} ms ({t_fs/fista_iters*1e3:.2f} ms/iter)")
        _checkpoint("FISTA split ms_per_iter",
                    round(t_fs / fista_iters * 1e3, 3))
    except Exception as e:  # pragma: no cover
        log(f"FISTA benchmark failed: {e!r}")

    _emit_headline()  # no-op if already printed; belt and braces


if __name__ == "__main__":
    main()
