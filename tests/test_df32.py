"""Compensated double-f32 kernel tests (the f64-contract-at-Pallas-speed
path, ``ops/pallas_df32.py``).

Split verification strategy (load-bearing): XLA:CPU rewrites EFT chains
inside compiled programs (measured: a jitted constant-operand
two_prod+renorm loses its whole compensation term), so interpret-mode CI
can only verify TRANSFORM STRUCTURE at f32-level tolerance. The
<=1e-12 ACCURACY contract is verified (a) eagerly here for the EFT
primitives (op-by-op execution preserves rounding structure) and (b) on
real hardware by bench.py, which GATES the 256^3 f64 config on
err < 1e-12 every run (hardware Mosaic preserves the EFT: measured
7.1e-14 roundtrip, 5.0e-13 vs oracle at 128^3, r5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import non_decimated_wavelets_tpu as nw
from non_decimated_wavelets_tpu import oracle
from non_decimated_wavelets_tpu.ops import pallas_df32 as pdf


def test_eft_primitives_exact_eager(rng):
    """two_sum/two_prod/mac are exact double-f32 ops when executed
    op-by-op (the rounding-structure ground truth the kernels rely on)."""
    x = rng.standard_normal(4096)
    taps = rng.standard_normal(8)
    th, tl = pdf._tap_split(taps.reshape(1, 8).repeat(2, 0))
    x2 = pdf._split_f64(jnp.asarray(x))
    assert float(
        jnp.max(jnp.abs(
            x2[0].astype(jnp.float64) + x2[1].astype(jnp.float64)
            - jnp.asarray(x)
        ))
    ) < 1e-14
    v = pdf._D(x2[0], x2[1])
    acc = None
    for j in range(8):
        acc = pdf._mac(acc, v, jnp.asarray(th[0, j]), jnp.asarray(tl[0, j]))
    got = np.asarray(acc.hi, np.float64) + np.asarray(acc.lo, np.float64)
    assert float(np.max(np.abs(got - x * taps.sum()))) < 1e-12


@pytest.mark.parametrize(
    "shape,wv,level,pl2",
    [
        ((16, 16, 128), "db4", 2, False),
        ((32, 256), "db6", 3, True),
        ((16, 16, 128), ("db2", "db3", "db4"), 2, False),
    ],
)
def test_structure_matches_oracle_interpret(shape, wv, level, pl2, rng):
    """Interpret mode: band order/scaling/adjoint structure vs the f64
    oracle at f32 tolerance (see module docstring for why not 1e-12)."""
    plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.float64,
                    path="direct", preserve_l2=pl2)
    x = rng.standard_normal(shape)
    with pltpu.force_tpu_interpret_mode():
        y = pdf.dec64(jnp.asarray(x), plan.taps_hp, level)
        xr = pdf.rec64(y, plan.taps_hp, level, pl2)
    gold = np.moveaxis(oracle.dec(x, wv, level, preserve_l2=pl2), -1, 0)
    np.testing.assert_allclose(np.asarray(y), gold, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xr), x, atol=1e-5)
    assert y.dtype == jnp.float64
    assert xr.dtype == jnp.float64


def test_f64_resolves_to_df32_on_accel(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    p = nw.NDDWT(wavelet="db4", shape=(256, 256, 256), dtype=jnp.float64)
    assert p._resolve_path(is_complex=False) == "pallas"
    # unsupported (4D) f64 stays on the direct path
    p4 = nw.NDDWT(wavelet="db4", shape=(128, 128, 128, 32),
                  dtype=jnp.float64)
    assert p4._resolve_path(is_complex=False) == "direct"
    # odd f64 shapes warn (no df32, no f64 ragged kernels)
    podd = nw.NDDWT(wavelet="db4", shape=(164, 64, 40), dtype=jnp.float64)
    with pytest.warns(UserWarning, match="float64"):
        assert podd._resolve_path(is_complex=False) == "direct"


def test_supported_gates():
    taps = tuple(
        np.asarray(t)
        for t in nw.NDDWT(wavelet="db4", shape=(16, 16, 128)).taps_hp
    )
    assert pdf.supported((256, 256, 256), taps)
    assert pdf.supported((512, 512), taps[:2])
    assert not pdf.supported((164, 64, 40), taps)  # odd lanes
    assert not pdf.supported((1024,), taps[:1])  # 1D out of scope


def test_df32_grad_rides_linear_call(rng):
    """grad through the f64 df32 kernels uses the registered exact
    adjoint (structure check in interpret mode)."""
    shape = (16, 128)
    plan = nw.NDDWT(wavelet="db2", shape=shape, dtype=jnp.float64,
                    path="direct")
    x = jnp.asarray(rng.standard_normal(shape))

    def loss(v):
        y = pdf.dec64(v, plan.taps_hp, 2)
        return jnp.sum(y**2)

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss)(x)
    assert g.shape == shape
    assert bool(jnp.isfinite(g).all())
