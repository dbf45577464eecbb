"""Hardware probe: leading-axis K-tap correlation as a banded MXU matmul
vs the slice-MAC chain (r4).

After the tree factoring, rec at 256^3 sits at its VPU floor (~8.6 ms =
(8+4+2)K tap-passes of multiply-accumulate slices). The MXU is ~50x the
VPU in FLOP/s; a leading-axis pass y[i,:,:] = sum_k M[i,k] v[k,:,:] is a
(tx, ex0) x (ex0, sublane*lane) banded matmul. This probes whether
Mosaic (a) accepts rank-3 dot_general contractions on the outer axis,
and (b) lowers them to something faster than the slice chain.

Kernel A: slice-MAC (the shipped form). Kernel B: dot_general.
Both run R repetitions in-kernel on a resident buffer to isolate
compute from DMA."""

import faulthandler
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

faulthandler.dump_traceback_later(120, repeat=True, file=sys.stderr)

INTERP = os.environ.get("MXU_INTERP", "0") == "1"

if not INTERP:
    from bench import _wait_for_backend

    if not _wait_for_backend(attempts=8, probe_timeout=120, sleep_s=120):
        print("TPU backend unavailable; aborting experiment", flush=True)
        sys.exit(2)

import jax

if INTERP:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

EX0, TX, EY, Z = 40, 32, 48, 256
K = 8
R = 64  # in-kernel repetitions


def _mk_band(rng):
    # (TX, EX0) banded: M[i, k] = t[k - i] for k-i in [0, K)
    t = rng.standard_normal(K).astype(np.float32)
    M = np.zeros((TX, EX0), np.float32)
    for i in range(TX):
        M[i, i : i + K] = t
    return t, M


def kernel_slice(t):
    def kernel(x_ref, o_ref):
        v = x_ref[...]
        acc0 = jnp.zeros((TX, EY, Z), jnp.float32)
        for _ in range(R):
            a = None
            for j in range(K):
                r = v[j : j + TX, :, :]
                term = float(t[j]) * r
                a = term if a is None else a + term
            acc0 = acc0 + a
        o_ref[...] = acc0

    return kernel


def kernel_mxu(M):
    def kernel(m_ref, x_ref, o_ref):
        v = x_ref[...]
        Mv = m_ref[...]
        acc0 = jnp.zeros((TX, EY, Z), jnp.float32)
        for _ in range(R):
            y = jax.lax.dot_general(
                Mv, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            acc0 = acc0 + y
        o_ref[...] = acc0

    return kernel


def run(kern, x, extra=()):
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((TX, EY, Z), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (1 + len(extra)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(f)(*extra, x)


def sync(a):
    return float(jnp.sum(jnp.ravel(a).astype(jnp.float32)[:1]))


def main():
    rng = np.random.default_rng(0)
    t, M = _mk_band(rng)
    x = jnp.asarray(rng.standard_normal((EX0, EY, Z)).astype(np.float32))
    ctx = pltpu.force_tpu_interpret_mode() if INTERP else None
    if ctx:
        ctx.__enter__()
    Mj = jnp.asarray(M)
    ya = run(kernel_slice(t), x)
    try:
        yb = run(kernel_mxu(M), x, extra=(Mj,))
        err = float(jnp.max(jnp.abs(ya - yb)))
        print(f"mxu form compiles; err vs slice {err:.2e}", flush=True)
    except Exception as e:
        print(f"mxu form FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        yb = None
    if ctx:
        ctx.__exit__(None, None, None)
        return
    for tag, kern, extra in (
        ("slice", kernel_slice(t), ()),
        ("mxu", kernel_mxu(M) if yb is not None else None, (Mj,)),
    ):
        if kern is None:
            continue
        f = jax.jit(pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((TX, EY, Z), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            * (1 + len(extra)),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))
        sync(f(*extra, x))
        n = 50
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*extra, x)
        sync(r)
        dt = (time.perf_counter() - t0) / n / R
        work = K * TX * EY * Z
        print(f"{tag}: {dt*1e6:.2f} us/pass ({2*work/dt/1e12:.2f} TFLOP/s)",
              flush=True)


if __name__ == "__main__":
    main()
