"""CPU interpret-mode exactness check of every exp_dec_opt.py variant
(bgroup/prefetch/tile-override) before any hardware run — catches logic
errors cheaply; hardware still revalidates (interpret has missed
segment-selection bugs before, see CLAUDE.md round-2 slab lesson)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: F401,E402
from jax.experimental import pallas as pl  # noqa: F401,E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import non_decimated_wavelets_tpu as nw  # noqa: E402
from non_decimated_wavelets_tpu.ops import direct_path  # noqa: E402
from non_decimated_wavelets_tpu.ops import pallas_kernels as pk  # noqa: E402


def main():
    shape = (32, 32, 128)  # small enough for interpret, 128-lane aligned
    level = 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    plan = nw.NDDWT(wavelet="db4", shape=shape, dtype=jnp.float32)
    taps_np = tuple(np.asarray(t) for t in plan.taps_hp)
    taps_f32 = tuple(np.asarray(t) for t in plan.taps)
    y_ref = np.asarray(direct_path.dec_direct(x, taps_f32, level))

    def dec_levels(v):
        # The per-level kernel chain (the path under test) — dec_pallas
        # would route small shapes to the one-launch multilevel kernel.
        nb = 8
        B = nb + (nb - 1) * (level - 1)
        big = jnp.empty((B,) + shape, v.dtype)
        approx = v
        off = B
        for lvl in range(level):
            off -= nb - 1
            final = lvl == level - 1
            out = pk._fused_dec_level(approx, big, off, taps_np,
                                      approx_to_big=final)
            if final:
                return out
            big, approx = out

    variants = [
        (None, 1, False, "control"),
        (None, 2, False, "G2"),
        (None, 4, False, "G4"),
        (None, 1, True, "P1"),
        (None, 4, True, "G4 P1"),
        ((16, 32), 1, False, "(16,32)"),
        ((16, 32), 4, True, "(16,32) G4 P1"),
        ((8, 16), 2, True, "(8,16) G2 P1"),
    ]
    bad = 0
    for tiles, G, P, tag in variants:
        pk._DEC_TILES_OVERRIDE = tiles
        pk._DEC_LEVEL_BGROUP = G
        pk._DEC_PREFETCH = P
        with pltpu.force_tpu_interpret_mode():
            y = np.asarray(jax.jit(dec_levels)(x))
        err = float(np.max(np.abs(y - y_ref)))
        ok = err < 2e-5
        bad += not ok
        print(f"{tag}: err {err:.2e} {'ok' if ok else 'BAD'}", flush=True)
    pk._DEC_TILES_OVERRIDE, pk._DEC_LEVEL_BGROUP, pk._DEC_PREFETCH = (
        None, 1, False)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
