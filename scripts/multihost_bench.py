"""Multi-host NDDWT benchmark — BASELINE.md config #5.

Runs the 100-iteration dec/rec loop on a 4D volume sharded over a global
device mesh (spatial axes over ICI/DCN, periodic halos via collective
permute). On a real pod, launch one process per host:

    python scripts/multihost_bench.py \
        --shape 512,512,512,64 --wavelet db4 --level 3 \
        --mesh x=4,y=2 --iters 100

(`jax.distributed.initialize` auto-detects TPU pod topology; pass
--coordinator/--num-processes/--process-id only on non-auto clusters.)

Single-process validation (no pod needed; 8 virtual CPU devices):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/multihost_bench.py --cpu --shape 64,32,16,8 \
        --wavelet db2 --level 2 --mesh x=4,y=2 --iters 3

Per-host shard construction uses ``make_array_from_callback`` so no host
ever materializes the global volume (512^3 x 64 f32 = 34 GB).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# Make the package importable no matter where (or with what PYTHONPATH)
# this script is launched — multi-process runs spawn it directly.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="512,512,512,64")
    p.add_argument("--wavelet", default="db4")
    p.add_argument("--level", type=int, default=3)
    p.add_argument("--mesh", default="x=2,y=1", help="axis=size pairs, comma-sep")
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument(
        "--streamed", action="store_true",
        help="use the level-streamed fused iterate (config-#5 memory "
        "layout: one level's bands live at a time — see DESIGN.md)",
    )
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    import non_decimated_wavelets_tpu as nw
    from non_decimated_wavelets_tpu.parallel import ShardedNDDWT, multihost

    multihost.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    shape = tuple(int(s) for s in args.shape.split(","))
    mesh_axes = {}
    for part in args.mesh.split(","):
        k, v = part.split("=")
        mesh_axes[k.strip()] = int(v)
    mesh = multihost.global_mesh(mesh_axes)
    multihost.assert_mesh_synchronized(mesh)

    # Shard the leading spatial axes over the mesh axes, in order.
    names = list(mesh_axes)
    spec = tuple(names[i] if i < len(names) else None for i in range(len(shape)))
    plan = nw.NDDWT(wavelet=args.wavelet, shape=shape, dtype=jnp.float32)
    sh = ShardedNDDWT(plan, mesh, spec)

    rng = np.random.default_rng(jax.process_index())

    def fill(idx):
        lshape = tuple(
            (sl.stop or shape[d]) - (sl.start or 0) for d, sl in enumerate(idx)
        )
        return rng.standard_normal(lshape).astype(np.float32)

    x = multihost.host_local_array(shape, mesh, P(*spec), fill)

    dec = sh.dec_fn(args.level)
    rec = sh.rec_fn(args.level)
    if args.streamed:
        pair = sh.dec_rec_streamed_fn(args.level)
        mem = sh.peak_memory_model(args.level)
    else:
        pair = lambda v: rec(dec(v))
        mem = None

    def sync(a):
        return float(jnp.sum(jnp.ravel(a)[:1]))

    import jax.lax as lax

    @jax.jit
    def loop(v):
        def body(c, _):
            return pair(c), None

        out, _ = lax.scan(body, v, None, length=args.iters)
        return out

    sync(loop(x))  # compile
    t0 = time.perf_counter()
    out = loop(x)
    sync(out)
    dt = (time.perf_counter() - t0) / args.iters
    nvox = int(np.prod(shape))
    n_chips = jax.device_count()
    # Single-pair reconstruction error plus the accumulated error of the
    # whole `iters`-deep identity chain (both computed sharded — no host
    # gather of the global volume).
    err1 = float(jnp.max(jnp.abs(pair(x) - x)))
    err = float(jnp.max(jnp.abs(out - x)))

    if jax.process_index() == 0:
        rec_obj = {
            "metric": f"voxels/sec, {args.level}-level {args.wavelet} "
            f"NDDWT dec+rec, shape {shape}, {n_chips} chips"
            + (" [level-streamed layout]" if args.streamed else ""),
            "seconds_per_pair": dt,
            "voxels_per_sec": nvox / dt,
            "voxels_per_sec_per_chip": nvox / dt / n_chips,
            "iters": args.iters,
            "processes": jax.process_count(),
            "devices": n_chips,
            "max_abs_roundtrip_err_1pair": err1,
            "max_abs_roundtrip_err_accumulated": err,
        }
        if mem is not None:
            rec_obj["streamed_peak_model"] = mem
        print(json.dumps(rec_obj), flush=True)


if __name__ == "__main__":
    main()
