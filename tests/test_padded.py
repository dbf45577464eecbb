"""Padded big-odd mode tests (``ops/pallas_padded.py``): the tiled level
kernels on large odd shapes via XLA wrap-pad glue + logical-lane masked
rolls. Closes the last refused f32 shape class on accelerators
(250^3-class volumes; hardware-verified r5: 250^3 db4 L3 at 352 Mvox/s,
roundtrip 1.4e-6)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import non_decimated_wavelets_tpu as nw
from non_decimated_wavelets_tpu.ops import direct_path, pallas_padded


CASES = [
    # odd lanes + odd leading (masked rolls + wrap-pad)
    ((40, 40, 72), "db4", 2, False),
    ((40, 40, 72), ("db2", "db3", "db4"), 2, True),
    # 2D odd
    ((70, 200), "db2", 3, False),
    # 128-multiple lanes, ragged leading only (plain rolls)
    ((34, 32, 128), "db2", 2, False),
]


def _taps(plan):
    return tuple(np.asarray(t) for t in plan.taps_hp)


@pytest.mark.parametrize("shape,wv,level,pl2", CASES)
def test_matches_direct(shape, wv, level, pl2, rng):
    plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.float32,
                    preserve_l2=pl2)
    taps = _taps(plan)
    assert pallas_padded.supported(shape, jnp.float32, taps)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = pallas_padded.dec_padded(x, taps, level)
        xr = pallas_padded.rec_padded(y, taps, level, pl2)
    yd = direct_path.dec_direct(x, plan.taps, level)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yd), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-4)


def test_fused_shrink(rng):
    shape = (40, 40, 72)
    plan = nw.NDDWT(wavelet="db2", shape=shape, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = pallas_padded.dec_padded(x, _taps(plan), 2, lam=0.1)
    from non_decimated_wavelets_tpu.models.denoise import soft_threshold

    yd = direct_path.dec_direct(x, plan.taps, 2)
    ref = jnp.concatenate([yd[:1], soft_threshold(yd[1:], 0.1)], axis=0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_supported_gates():
    plan = nw.NDDWT(wavelet="db4", shape=(16, 16, 128))
    taps = _taps(plan)
    assert pallas_padded.supported((250, 250, 250), jnp.float32, taps)
    assert pallas_padded.supported((250, 250, 256), jnp.float32, taps)
    taps4 = _taps(nw.NDDWT(wavelet="db4", shape=(16, 16, 8, 16)))
    # lane filter longer than the Z extent: unsupported
    assert not pallas_padded.supported((10, 6, 4, 6), jnp.float32, taps4)
    # halo larger than a tiny true extent: wrap slices would be invalid
    assert not pallas_padded.supported((3, 40, 72), jnp.float32, taps)


@pytest.mark.parametrize(
    "shape,wv,level,pl2",
    [
        ((20, 20, 12, 10), "db2", 2, False),
        ((20, 20, 12, 10), ("db2", "db2", "db3", "db1"), 2, True),
    ],
)
def test_4d_matches_direct(shape, wv, level, pl2, rng):
    """4D padded mode: logical-geometry masked lane rolls (Z inside Zp,
    T inside Tp) + padded lead stage."""
    plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.float32,
                    preserve_l2=pl2)
    taps = _taps(plan)
    assert pallas_padded.supported(shape, jnp.float32, taps)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = pallas_padded.dec_padded(x, taps, level)
        xr = pallas_padded.rec_padded(y, taps, level, pl2)
    yd = direct_path.dec_direct(x, plan.taps, level)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yd), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-4)


def test_4d_geometry_picker():
    assert pallas_padded._pick_geom4(100, 25) == (100, 25, 100, 32, 4)
    assert pallas_padded._pick_geom4(60, 9) == (60, 9, 64, 16, 8)
    assert pallas_padded._pick_geom4(32, 130) is None  # T > 128


def test_bf16(rng):
    shape = (40, 40, 72)
    plan = nw.NDDWT(wavelet="db2", shape=shape, dtype=jnp.bfloat16)
    taps = _taps(plan)
    assert pallas_padded.supported(shape, jnp.bfloat16, taps)
    x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        y = pallas_padded.dec_padded(x, taps, 2)
        xr = pallas_padded.rec_padded(y, taps, 2, False)
    assert y.dtype == jnp.bfloat16
    err = float(jnp.max(jnp.abs(
        xr.astype(jnp.float32) - x.astype(jnp.float32)
    )))
    assert err < 0.05


@pytest.mark.parametrize(
    "N,wv,level,pl2",
    [
        (5000, "db4", 3, False),
        (4096, "db2", 2, True),
        (130001, "db6", 3, False),
    ],
)
def test_1d_matches_direct(N, wv, level, pl2, rng):
    """Chunked 1D mode: long signals beyond the flat kernels' ~196K-sample
    budget (hardware r5: 1M samples at 374 Mvox/s, 8.4M db6 L4 at 492,
    oracle-exact — previously REFUSED)."""
    plan = nw.NDDWT(wavelet=wv, shape=(N,), dtype=jnp.float32,
                    preserve_l2=pl2)
    taps = _taps(plan)
    assert pallas_padded.supported((N,), jnp.float32, taps)
    x = jnp.asarray(rng.standard_normal(N), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = pallas_padded.dec_padded1(x, taps, level)
        xr = pallas_padded.rec_padded1(y, taps, level, pl2)
    yd = direct_path.dec_direct(x, plan.taps, level)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yd), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-4)


def test_1d_resolves_to_pallas(monkeypatch):
    import jax as j

    monkeypatch.setattr(j, "default_backend", lambda: "tpu")
    for N in (200000, 1000000, 8388608):
        plan = nw.NDDWT(wavelet="db4", shape=(N,), dtype=jnp.float32)
        assert plan._resolve_path(is_complex=False) == "pallas", N
