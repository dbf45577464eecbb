"""Hardware experiment: per-level 3D dec kernel write-grouping / input
prefetch / tile-shape sweep (round-4 headline lever).

Motivation (measured r3 state): at 256^3 db4 L3 rec (11.3 ms) sits at the
~265 GB/s DMA ceiling given its (32,32)-tile halo amplification, but dec
(10.2 ms) is ~45% above its traffic floor (~1.9 GB -> ~7 ms). The per-level
dec kernel runs (16,16) tiles = 256 grid steps/level, with (a) 9
serially-waited read DMAs per step and NO cross-step prefetch, (b) 8
per-band 256KB write DMAs per step although detail bands are CONTIGUOUS in
the band-first output (the multilevel kernel already groups them —
``_detail_groups``). Per exp_bf16.py the kernels are DMA-count/latency
bound, so fewer+larger transfers is the lever.

Variants (knobs in ops/pallas_kernels.py, read at trace time):
  * bgroup G: adjacent detail bands per write DMA (1 = shipped)
  * prefetch P: cross-grid-step input double-buffering
  * tiles: (16,16) shipped; (16,32)/(32,16) fit the live-words budget with
    lower halo amplification (2.16x/2.44x vs 2.875x) but were never tried.

Structure mirrors bench.py exactly (x64 enabled, plan API, scanned loops);
faulthandler dumps stacks every 120 s so a tunnel stall shows where.

Run on the TPU-attached host: ``python scripts/exp_dec_opt.py``.
"""

import faulthandler
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

faulthandler.dump_traceback_later(120, repeat=True, file=sys.stderr)

from bench import _wait_for_backend  # noqa: E402  (repo root on sys.path)

if not _wait_for_backend(attempts=8, probe_timeout=120, sleep_s=120):
    print("TPU backend unavailable; aborting experiment", flush=True)
    sys.exit(2)

import jax

jax.config.update("jax_enable_x64", True)  # match bench.py's trace env

import jax.numpy as jnp

import non_decimated_wavelets_tpu as nw
from non_decimated_wavelets_tpu.ops import pallas_kernels as pk


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
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    plan = nw.NDDWT(wavelet="db4", shape=shape, dtype=jnp.float32)

    # Reference output for exactness checks (shipped config).
    pk._DEC_TILES_OVERRIDE, pk._DEC_LEVEL_BGROUP, pk._DEC_PREFETCH, \
        pk._FUSE_INTERIOR = None, 1, False, False
    y_ref = np.asarray(jax.jit(
        lambda v: plan.dec(v, level, band_axis=0))(x))

    # (tiles_override, bgroup, prefetch, fuse_interior, tag)
    variants = [
        (None, 1, False, False, "control (16,16) G1 P0 F0"),
        (None, 4, False, False, "(16,16) G4 P0 F0"),
        (None, 1, True, False, "(16,16) G1 P1 F0"),
        (None, 1, False, True, "(16,16) G1 P0 F1"),
        (None, 4, True, False, "(16,16) G4 P1 F0"),
        (None, 4, True, True, "(16,16) G4 P1 F1"),
        ((16, 32), 1, False, False, "(16,32) G1 P0 F0"),
        ((16, 32), 4, True, True, "(16,32) G4 P1 F1"),
        ((32, 16), 2, True, True, "(32,16) G2 P1 F1"),
    ]
    results = {}
    for tiles, G, P, F, tag in variants:
        pk._DEC_TILES_OVERRIDE = tiles
        pk._DEC_LEVEL_BGROUP = G
        pk._DEC_PREFETCH = 2 if P else 0
        pk._FUSE_INTERIOR = F
        try:
            dec_fn = jax.jit(lambda v: plan.dec(v, level, band_axis=0))
            y = dec_fn(x)
            err = float(jnp.max(jnp.abs(y - y_ref)))
            del y
            td = time_loop(lambda v, f=dec_fn: f(v)[0], x, iters)
            results[tag] = td
            print(f"{tag}: dec {td*1e3:.2f} ms (err vs control {err:.1e})",
                  flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # rec is knob-sensitive only to F (fused interior band reads).
    pk._DEC_TILES_OVERRIDE, pk._DEC_LEVEL_BGROUP, pk._DEC_PREFETCH = (
        None, 1, False)
    yb = jax.jit(lambda v: plan.dec(v, level, band_axis=0))(x)
    xr_ref = np.asarray(jax.jit(lambda v: plan.rec(v, band_axis=0))(yb))
    for F in (False, True):
        pk._FUSE_INTERIOR = F
        try:
            rec_fn = jax.jit(lambda v: plan.rec(v, band_axis=0))
            err = float(jnp.max(jnp.abs(rec_fn(yb) - xr_ref)))
            tr = time_loop(lambda v, f=rec_fn: f(v), yb, iters)
            print(f"rec F{int(F)}: {tr*1e3:.2f} ms (err {err:.1e})",
                  flush=True)
        except Exception as e:
            print(f"rec F{int(F)}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # Pair timing for control and best dec variant (each with rec F1/F0).
    best_tag = min(results, key=results.get)
    for tiles, G, P, F, tag in variants:
        if tag not in (best_tag, "control (16,16) G1 P0 F0"):
            continue
        pk._DEC_TILES_OVERRIDE = tiles
        pk._DEC_LEVEL_BGROUP = G
        pk._DEC_PREFETCH = 2 if P else 0
        pk._FUSE_INTERIOR = F
        dec_fn = jax.jit(lambda v: plan.dec(v, level, band_axis=0))
        rec_fn = jax.jit(lambda v: plan.rec(v, band_axis=0))
        tp = time_loop(lambda v: rec_fn(dec_fn(v)), x, iters)
        nvox = int(np.prod(shape))
        print(f"{tag}: pair {tp*1e3:.2f} ms ({nvox/tp/1e6:.0f} Mvox/s)",
              flush=True)


if __name__ == "__main__":
    main()
