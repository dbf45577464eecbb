"""Hardware experiment: 4D dec lead-stage write-run-length (VERDICT r2
item 8). The dec lead stage is WRITE-bound at ~133 GB/s because the 15
detail-band tiles go out as 512B strided runs (zct=128 lanes x 4B);
``_lead_dec_call(kgroup=G)`` stages G adjacent k-chunks per band DMA so
runs become G*512B. zct itself is hard-capped at 128 (every zct>256-lane
Mosaic compile fails — CLAUDE.md REJECTED), so run-length growth must come
from the k axis.

Times one analysis level at 64^3x32 db4 across (tile, G) combos and
prints ms/level; the winner sets the `_lead_kgroup`/`_lead_tiles` policy.
Run directly on the TPU-attached host: ``python scripts/exp_4d_kgroup.py``.
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
from non_decimated_wavelets_tpu.ops import pallas_4d as p4


def sync(a):
    return float(jnp.sum(jnp.ravel(a)[:1]))


def main():
    shape = (64, 64, 64, 32)
    X, Y, Z, T = shape
    plan = nw.NDDWT(wavelet="db4", shape=shape, dtype=jnp.float32)
    taps = tuple(np.asarray(t) for t in plan.taps_hp)
    zc = p4._chunk(Z, T)
    zct = zc * T
    Zcnt = Z // zc
    nvox = int(np.prod(shape))
    print(f"shape={shape} zc={zc} zct={zct} Zcnt={Zcnt}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    lane_t = p4._lane_tiles(X, Y, Z * T, 8)
    temp5 = jax.jit(
        lambda v: p4._lane_dec_call(v.reshape(X, Y, Z * T), taps, T, lane_t)
    )(x).reshape(4, X, Y, Zcnt, zct)
    sync(temp5)

    iters = 20
    for tiles, g in [((32, 32), 1), ((16, 32), 2), ((16, 16), 2),
                     ((16, 16), 4), ((8, 16), 4)]:
        if X % tiles[0] or Y % tiles[1] or Zcnt % g:
            continue
        try:
            B = 16
            big5 = jnp.empty((B, X, Y, Zcnt, zct), jnp.float32)

            def run(t5, big):
                def body(carry, _):
                    out = p4._lead_dec_call(
                        t5, carry, 1, taps, tiles, zct, approx_to_big=True,
                        kgroup=g,
                    )
                    return out, None
                out, _ = jax.lax.scan(body, big, None, length=iters)
                return out

            f = jax.jit(run)
            sync(f(temp5, big5))
            t0 = time.perf_counter()
            sync(f(temp5, big5))
            dt = (time.perf_counter() - t0) / iters
            gbs = (nvox * 4 * (4 + 16)) / dt / 1e9  # 4 band reads+16 writes
            print(f"tiles={tiles} G={g}: {dt*1e3:.2f} ms/level "
                  f"({gbs:.0f} GB/s apparent)", flush=True)
        except Exception as e:
            print(f"tiles={tiles} G={g}: FAILED {e!r}"[:300], flush=True)


if __name__ == "__main__":
    main()
