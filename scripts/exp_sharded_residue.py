"""Hardware experiment: localize the sharded-vs-unsharded residue
(VERDICT r2 weak item 7 / next-round item 6): 256^3 db4 L3 pair measured
26.3 ms sharded (1-dev mesh, slab 'valid' mode) vs 22.5 unsharded. The
two suspects are (a) the XLA slab builds (2 slices + ppermute(s) + concat
per axis per level per direction at XLA's ~55 GB/s + ~0.2-1 ms/op
dispatch) and (b) the pl.when-conditional segment-DMA scalar work in the
kernels. This script separates them:

  1. unsharded pair          (floor)
  2. sharded pair            (status quo)
  3. slab builds alone       (XLA cost of (a), jitted loop)
  4. sharded pair, slabs frozen — kernels fed PRECOMPUTED slabs every
     level (wrong numerics, right timing): isolates (b)+kernels.

Run on the TPU-attached host: ``python scripts/exp_sharded_residue.py``.
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
from non_decimated_wavelets_tpu.ops import pallas_kernels as pk
from non_decimated_wavelets_tpu.parallel import ShardedNDDWT, make_mesh
from non_decimated_wavelets_tpu.parallel import sharded as shd


def sync(a):
    return float(jnp.sum(jnp.ravel(a)[:1]))


def timeit(f, x, iters):
    def body(c, _):
        return f(c), None

    loop = jax.jit(lambda v: jax.lax.scan(body, v, None, length=iters)[0])
    sync(loop(x))
    t0 = time.perf_counter()
    sync(loop(x))
    return (time.perf_counter() - t0) / iters


def main():
    shape = (256, 256, 256)
    level = 3
    iters = 20
    plan = nw.NDDWT(wavelet="db4", shape=shape, dtype=jnp.float32)
    taps = tuple(np.asarray(t) for t in plan.taps_hp)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    nvox = int(np.prod(shape))

    # 1. unsharded pair
    t1 = timeit(
        lambda v: pk.rec_pallas(
            pk.dec_pallas(v, taps, level), taps, level, False
        ),
        x, iters,
    )
    print(f"1 unsharded pair: {t1*1e3:.2f} ms ({nvox/t1/1e6:.0f} Mvox/s)",
          flush=True)

    # 2. sharded pair (1-dev mesh, slab mode)
    mesh = make_mesh({"x": 1}, jax.devices()[:1])
    sh = ShardedNDDWT(plan, mesh, ("x", None, None), use_pallas=True)
    xs = sh.shard_input(x)
    dec_s, rec_s = sh.dec_fn(level), sh.rec_fn(level)
    t2 = timeit(lambda v: rec_s(dec_s(v)), xs, iters)
    print(f"2 sharded pair:   {t2*1e3:.2f} ms ({nvox/t2/1e6:.0f} Mvox/s)",
          flush=True)

    # 3. slab builds alone: the XLA ops the sharded body runs per level
    # (dec: 1 slab of approx; rec: slabs of y (once) + acc per level).
    halos = pk._dec_halos(3, taps)

    def slab_once(v):
        import functools

        body = functools.partial(
            shd._build_slabs, slab_axes=(0,), axis_names=("x", None, None),
            halos=halos, lead_off=0,
        )
        mapped = jax.shard_map(
            lambda a: body(a)[0],
            mesh=mesh,
            in_specs=(jax.sharding.PartitionSpec("x", None, None),),
            out_specs=jax.sharding.PartitionSpec("x", None, None),
        )
        return v + 0 * jnp.sum(mapped(v)[0, 0])  # keep carry shape

    t3 = timeit(slab_once, xs, iters)
    print(f"3 one slab build + carry add: {t3*1e3:.2f} ms", flush=True)

    # 4. sharded pair with frozen slabs: patch _build_slabs to return
    # precomputed constants (timing-only; numerics wrong at shard edges).
    orig = shd._build_slabs
    cache = {}

    def frozen(arr, slab_axes, axis_names, halos, lead_off):
        key = (arr.shape, tuple(slab_axes), lead_off)
        if key not in cache:
            cache[key] = tuple(
                jnp.zeros_like(s)
                for s in orig(arr, slab_axes, axis_names, halos, lead_off)
            )
        return cache[key]

    shd._build_slabs = frozen
    try:
        sh2 = ShardedNDDWT(plan, mesh, ("x", None, None), use_pallas=True)
        dec2, rec2 = sh2.dec_fn(level), sh2.rec_fn(level)
        t4 = timeit(lambda v: rec2(dec2(v)), xs, iters)
    finally:
        shd._build_slabs = orig
    print(f"4 sharded, slabs frozen: {t4*1e3:.2f} ms "
          f"(residue attributable to slab builds: {(t2-t4)*1e3:.2f} ms; "
          f"kernel-side conditional-DMA residue: {(t4-t1)*1e3:.2f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
