"""Pallas kernel tests in TPU interpreter mode (runs on the CPU CI mesh —
the Pallas analogue of the reference's mat-vs-mex cross-backend tier,
``mex/mex_test.m``). On real TPU hardware the same kernels are exercised by
``bench.py``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import non_decimated_wavelets_tpu as nw
from non_decimated_wavelets_tpu.ops import direct_path, pallas_kernels


CASES = [
    ((32, 128), "db4", 2),
    ((32, 256), ("db2", "db6"), 1),
    ((16, 16, 128), ("db2", "db3", "db4"), 2),
    ((8, 8, 128), "db1", 3),
]


@pytest.mark.parametrize("shape,wv,level", CASES)
def test_dec_matches_direct(shape, wv, level, rng):
    plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        yp = pallas_kernels.dec_pallas(x, plan.taps, level)
    yd = direct_path.dec_direct(x, plan.taps, level)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yd), atol=1e-5)


@pytest.mark.parametrize("shape,wv,level", CASES)
@pytest.mark.parametrize("pl2", [False, True])
def test_rec_roundtrip(shape, wv, level, pl2, rng):
    plan = nw.NDDWT(wavelet=wv, shape=shape, preserve_l2=pl2, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    yd = direct_path.dec_direct(x, plan.taps, level)
    with pltpu.force_tpu_interpret_mode():
        xr = pallas_kernels.rec_pallas(yd, plan.taps, level, pl2)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-4)


MULTI_CASES = [
    ((64, 128), "db2", 3, False),
    ((32, 16, 128), "db4", 3, True),
    ((16, 16, 256), ("db1", "db3", "db2"), 2, False),
    ((24, 8, 128), ("db6", "db2", "db4"), 4, True),
]


@pytest.mark.parametrize("shape,wv,level,pl2", MULTI_CASES)
def test_multilevel_one_launch_kernels(shape, wv, level, pl2, rng):
    """Whole-cascade single-launch kernels (grid over levels, HBM ping-pong
    carry, traced band offsets) match the direct path exactly, both
    directions, including the fused detail shrink."""
    plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.float32,
                    preserve_l2=pl2)
    taps_np = tuple(np.asarray(t) for t in plan.taps_hp)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    yd = direct_path.dec_direct(x, plan.taps, level)
    with pltpu.force_tpu_interpret_mode():
        y = pallas_kernels._fused_dec_multi(x, taps_np, level)
        ys = pallas_kernels._fused_dec_multi(x, taps_np, level, lam=0.1)
        xr = pallas_kernels._fused_rec_multi(yd, taps_np, level, pl2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yd), atol=1e-5)
    ref = pallas_kernels._shrink_details_xla(yd, 0.1)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-4)


def test_multilevel_gates():
    """The one-launch cascade declines level 1 and shapes past the tile-
    count crossover (measured: a wash at 256^3, 1.63x at 512^2)."""
    taps = tuple(
        np.asarray(t)
        for t in nw.NDDWT(wavelet="db2", shape=(64, 128)).taps_hp
    )
    x = jnp.zeros((64, 128), jnp.float32)
    assert pallas_kernels._fused_dec_multi(x, taps, 1) is None
    big_taps = tuple(
        np.asarray(t)
        for t in nw.NDDWT(wavelet="db2", shape=(256, 256, 256)).taps_hp
    )
    xb = jnp.zeros((256, 256, 256), jnp.float32)
    assert pallas_kernels._fused_dec_multi(xb, big_taps, 3) is None
    yb = jnp.zeros((10, 256, 256, 256), jnp.float32)
    assert pallas_kernels._fused_rec_multi(yb, big_taps, 3, False) is None


def test_fallback_unsupported_shape(rng):
    """Small non-tileable shapes ride the flat-lane kernels and larger
    non-tileable shapes the ragged row-grid kernels (the XLA direct path
    is a hazard on the target backend and is never dispatched on it)."""
    plan = nw.NDDWT(wavelet="db2", shape=(30, 50), dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((30, 50)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = pallas_kernels.dec_pallas(x, plan.taps, 2)  # flat-lane kernel
    yd = direct_path.dec_direct(x, plan.taps, 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yd), atol=1e-5)

    big = (130, 34, 130)  # numel over the flat budget, lanes not 128-mult
    planb = nw.NDDWT(wavelet="db2", shape=big, dtype=jnp.float32)
    xb = jnp.asarray(rng.standard_normal(big), jnp.float32)
    # Round 5: such shapes ride the ragged row-grid kernels now (no shape
    # reaches the XLA direct path on accelerators anymore).
    with pltpu.force_tpu_interpret_mode():
        yb = pallas_kernels.dec_pallas(xb, planb.taps, 1)
    ydb = direct_path.dec_direct(xb, planb.taps, 1)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ydb), atol=1e-5)


def test_plan_pallas_path(rng):
    """path='pallas' through the public plan API (interpret mode)."""
    plan = nw.NDDWT(wavelet="db2", shape=(16, 128), dtype=jnp.float32, path="pallas")
    x = rng.standard_normal((16, 128)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        y = plan.dec(x, 2)
        xr = plan.rec(y)
    assert np.max(np.abs(np.asarray(xr) - x)) < 1e-4


# --------------------------------------------------------------------------
# Resident whole-array kernels (small shapes, incl. 1D).
# --------------------------------------------------------------------------
from non_decimated_wavelets_tpu.ops import pallas_resident


@pytest.mark.parametrize(
    "shape,wv,level",
    [
        ((1024,), "db4", 3),
        ((256,), "db2", 2),
        ((64, 128), ("db3", "db5"), 3),
        ((128, 256), "db1", 2),
    ],
)
def test_resident_matches_direct(shape, wv, level, rng):
    plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.float32)
    taps_np = tuple(np.asarray(t) for t in plan.taps)
    assert pallas_resident.resident_supported(shape, jnp.float32, taps_np)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        yr = pallas_resident.dec_resident(x, taps_np, level)
    yd = direct_path.dec_direct(x, plan.taps, level)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yd), atol=1e-5)
    with pltpu.force_tpu_interpret_mode():
        xr = pallas_resident.rec_resident(yd, taps_np, level, False)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-4)


def test_resident_unsupported_shapes():
    taps = (np.zeros((2, 8), np.float32),) * 2
    assert not pallas_resident.resident_supported((1000,), jnp.float32, (taps[0],))
    assert not pallas_resident.resident_supported((512, 512), jnp.float64, taps)
    assert not pallas_resident.resident_supported((1024, 1024), jnp.float32, taps)


@pytest.mark.parametrize(
    "shape,wv,level",
    [
        ((32, 32, 128), "db8", 2),     # long filter: halo == W exactly
        ((64, 64, 128), "db10", 1),    # halo > 8 -> W = 16
        ((32, 32, 128), ("db2", "db8", "db4"), 2),  # mixed K per axis
    ],
)
def test_long_filters_tiled(shape, wv, level, rng):
    """Long/mixed filters stress the halo and segment arithmetic."""
    plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    yd = direct_path.dec_direct(x, plan.taps, level)
    with pltpu.force_tpu_interpret_mode():
        yp = pallas_kernels.dec_pallas(x, plan.taps, level)
        xr = pallas_kernels.rec_pallas(yd, plan.taps, level, False)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yd), atol=2e-5)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=2e-4)


# --------------------------------------------------------------------------
# 4D two-stage kernels (lane-flattened Z,T + halo'd leading axes).
# --------------------------------------------------------------------------
from non_decimated_wavelets_tpu.ops import pallas_4d


CASES_4D = [
    ((8, 8, 4, 32), "db2", 2),
    ((8, 16, 8, 16), ("db1", "db2", "db3", "db2"), 1),
    ((16, 8, 4, 32), "db1", 3),
]


@pytest.mark.parametrize("shape,wv,level", CASES_4D)
def test_4d_dec_matches_direct(shape, wv, level, rng):
    plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.float32)
    taps_np = tuple(np.asarray(t) for t in plan.taps)
    assert pallas_4d.supported(shape, jnp.float32, taps_np)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        yp = pallas_4d.dec4(x, taps_np, level)
    yd = direct_path.dec_direct(x, plan.taps, level)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yd), atol=1e-5)


@pytest.mark.parametrize("shape,wv,level", CASES_4D[:2])
@pytest.mark.parametrize("pl2", [False, True])
def test_4d_rec_roundtrip(shape, wv, level, pl2, rng):
    plan = nw.NDDWT(wavelet=wv, shape=shape, preserve_l2=pl2, dtype=jnp.float32)
    taps_np = tuple(np.asarray(t) for t in plan.taps)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    yd = direct_path.dec_direct(x, plan.taps, level)
    with pltpu.force_tpu_interpret_mode():
        xr = pallas_4d.rec4(yd, taps_np, level, pl2)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-4)


def test_4d_unsupported_falls_back(rng):
    """Odd lane extents decline the 4D kernels; small ones land on the
    flat-lane kernels instead of the XLA direct path."""
    shape = (6, 6, 5, 5)  # L=25, not a multiple of 128
    plan = nw.NDDWT(wavelet="db1", shape=shape, dtype=jnp.float32)
    taps_np = tuple(np.asarray(t) for t in plan.taps)
    assert not pallas_4d.supported(shape, jnp.float32, taps_np)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = pallas_kernels.dec_pallas(x, plan.taps, 2)
    yd = direct_path.dec_direct(x, plan.taps, 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yd), atol=1e-5)


# --------------------------------------------------------------------------
# Fused dec+threshold+rec pair kernel (single launch).
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape,wv,level,lam",
    [
        ((1024,), "db4", 3, 0.0),
        ((1024,), "db4", 3, 0.1),
        ((64, 128), ("db3", "db5"), 2, 0.05),
    ],
)
@pytest.mark.parametrize("pl2", [False, True])
def test_pair_resident_matches_compose(shape, wv, level, lam, pl2, rng):
    plan = nw.NDDWT(wavelet=wv, shape=shape, preserve_l2=pl2, dtype=jnp.float32)
    taps_np = tuple(np.asarray(t) for t in plan.taps)
    assert pallas_resident.resident_supported(shape, jnp.float32, taps_np)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y, xr = pallas_resident.pair_resident(x, taps_np, level, pl2, lam)
    yd = direct_path.dec_direct(x, plan.taps, level)
    if lam:
        from non_decimated_wavelets_tpu.models.denoise import soft_threshold

        yd = jnp.concatenate([yd[:1], soft_threshold(yd[1:], lam)], axis=0)
    xd = direct_path.rec_direct(yd, plan.taps, level, pl2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yd), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(xd), atol=1e-4)


def test_plan_dec_rec_api(rng):
    """plan.dec_rec: XLA fallback path equals dec + shrink + rec."""
    plan = nw.NDDWT(wavelet="db2", shape=(24, 24), dtype="double")
    x = rng.standard_normal((24, 24))
    y, xr = plan.dec_rec(x, 2, threshold=0.1, band_axis=0)
    yd = plan.dec(x, 2, band_axis=0)
    from non_decimated_wavelets_tpu.models.denoise import soft_threshold

    yd = jnp.concatenate([yd[:1], soft_threshold(yd[1:], 0.1)], axis=0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yd), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(xr), np.asarray(plan.rec(yd, band_axis=0)), atol=1e-12
    )


# --------------------------------------------------------------------------
# Flat-lane resident kernels (arbitrary small shapes — the reference's own
# awkward sizes, Test/nddwt2D_test.m:5).
# --------------------------------------------------------------------------
from non_decimated_wavelets_tpu.ops import pallas_flat


CASES_FLAT = [
    ((64, 64), "db2", 2),
    ((54,), "db4", 3),
    ((26, 26), ("db1", "db3"), 2),
    ((24, 18, 10), ("db2", "db3", "db2"), 2),
    ((264, 264), "db4", 1),
    ((14, 10, 6, 6), "db1", 2),
]


@pytest.mark.parametrize("shape,wv,level", CASES_FLAT)
def test_flat_dec_matches_direct(shape, wv, level, rng):
    plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.float32)
    taps_np = tuple(np.asarray(t) for t in plan.taps)
    assert pallas_flat.flat_supported(shape, jnp.float32, taps_np)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        yp = pallas_flat.dec_flat(x, taps_np, level)
    yd = direct_path.dec_direct(x, plan.taps, level)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yd), atol=1e-5)


@pytest.mark.parametrize("shape,wv,level", CASES_FLAT[:4])
@pytest.mark.parametrize("pl2", [False, True])
def test_flat_rec_roundtrip(shape, wv, level, pl2, rng):
    plan = nw.NDDWT(wavelet=wv, shape=shape, preserve_l2=pl2, dtype=jnp.float32)
    taps_np = tuple(np.asarray(t) for t in plan.taps)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    yd = direct_path.dec_direct(x, plan.taps, level)
    with pltpu.force_tpu_interpret_mode():
        xr = pallas_flat.rec_flat(yd, taps_np, level, pl2)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-4)


def test_flat_pair_with_threshold(rng):
    shape, lam = (26, 26), 0.1
    plan = nw.NDDWT(wavelet="db2", shape=shape, dtype=jnp.float32)
    taps_np = tuple(np.asarray(t) for t in plan.taps)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y, xr = pallas_flat.pair_flat(x, taps_np, 2, False, lam)
    from non_decimated_wavelets_tpu.models.denoise import soft_threshold

    yd = direct_path.dec_direct(x, plan.taps, 2)
    yd = jnp.concatenate([yd[:1], soft_threshold(yd[1:], lam)], axis=0)
    xd = direct_path.rec_direct(yd, plan.taps, 2, False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yd), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(xd), atol=1e-4)


# --------------------------------------------------------------------------
# Autodiff through the Pallas dispatchers (linear_call: adjoint-based vjp).
# --------------------------------------------------------------------------


@pytest.mark.parametrize("pl2", [False, True])
def test_pallas_grad_matches_direct(pl2, rng):
    shape, wv, level = (16, 128), "db3", 2
    plan = nw.NDDWT(wavelet=wv, shape=shape, preserve_l2=pl2, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((plan.num_bands(level),) + shape),
                    jnp.float32)

    def loss_pallas(v):
        return jnp.sum(w * pallas_kernels.dec_pallas(v, plan.taps, level))

    def loss_direct(v):
        return jnp.sum(w * direct_path.dec_direct(v, plan.taps, level))

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_pallas)(x)
    gd = jax.grad(loss_direct)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gd), atol=2e-4)

    # rec side
    y = direct_path.dec_direct(x, plan.taps, level)

    def rloss_pallas(v):
        return jnp.sum(pallas_kernels.rec_pallas(v, plan.taps, level, pl2) ** 2)

    def rloss_direct(v):
        return jnp.sum(direct_path.rec_direct(v, plan.taps, level, pl2) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(rloss_pallas)(y)
    gd = jax.grad(rloss_direct)(y)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gd), atol=2e-4)


# --------------------------------------------------------------------------
# bf16 through every kernel family: buffers/bands stay bf16 (half the HBM
# traffic), in-kernel compute upcasts to f32 (Mosaic cannot rotate
# non-32-bit vectors — "Rotate with non-32-bit data", observed on v5e).
# Interpret mode checks the dtype plumbing and numerics.
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape,wv,level",
    [
        ((16, 16, 128), "db4", 2),   # tiled 3D kernels
        ((64, 128), "db2", 2),       # resident
        ((30, 50), "db2", 2),        # flat-lane
        ((16, 16, 16, 16), "db2", 2),  # 4D two-stage
    ],
)
def test_bf16_kernels_roundtrip(shape, wv, level, rng):
    plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.bfloat16)
    x32 = rng.standard_normal(shape).astype(np.float32)
    x = jnp.asarray(x32, jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        y = pallas_kernels.dec_pallas(x, plan.taps, level)
        assert y.dtype == jnp.bfloat16
        xr = pallas_kernels.rec_pallas(y, plan.taps, level, False)
    assert xr.dtype == jnp.bfloat16
    err = np.max(np.abs(np.asarray(xr, np.float32) - x32))
    assert err < 0.25  # bf16 storage: ~2-3 significant digits


def test_batched_pallas_matches_per_item(rng):
    """dec_batched/rec_batched through the Pallas path (lax.map over the
    hand-DMA kernels, which have no vmap rule)."""
    shape = (16, 128)
    plan = nw.NDDWT(wavelet="db2", shape=shape, dtype=jnp.float32,
                    path="pallas")
    xb = jnp.asarray(rng.standard_normal((3,) + shape), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        yb = plan.dec_batched(xb, 2)
        per = jnp.stack([plan.dec(xb[i], 2, band_axis=0) for i in range(3)])
        np.testing.assert_allclose(np.asarray(yb), np.asarray(per), atol=1e-6)
        xr = plan.rec_batched(yb)
    assert np.max(np.abs(np.asarray(xr) - np.asarray(xb))) < 1e-4


def test_4d_dynamic_lane_form_matches_direct(rng):
    """The while_loop (dynamic-rotate) lane form — selected on hardware when
    unrolled liveness would blow scoped VMEM — must stay correct even though
    every CASES_4D shape now picks the static form."""
    shape, wv, level = (8, 8, 4, 32), "db2", 2
    plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.float32)
    taps_np = tuple(np.asarray(t) for t in plan.taps_hp)
    X, Y, Z, T = shape
    L = Z * T
    tx, ty, static = pallas_4d._lane_tiles(X, Y, L, 4)
    assert static  # this shape would normally go static
    dyn_tiles = (tx, ty, False)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        # analysis lane stage
        t_dyn = pallas_4d._lane_dec_call(x.reshape(X, Y, L), taps_np, T,
                                         dyn_tiles)
        t_sta = pallas_4d._lane_dec_call(x.reshape(X, Y, L), taps_np, T,
                                         (tx, ty, True))
        np.testing.assert_allclose(
            np.asarray(t_dyn), np.asarray(t_sta), atol=1e-5
        )
        # adjoint lane stage
        p = jnp.asarray(rng.standard_normal((4, X, Y, L)), jnp.float32)
        a_dyn = pallas_4d._lane_adj_call(p, taps_np, T, dyn_tiles, 1 / 16)
        a_sta = pallas_4d._lane_adj_call(p, taps_np, T, (tx, ty, True), 1 / 16)
        np.testing.assert_allclose(
            np.asarray(a_dyn), np.asarray(a_sta), atol=1e-5
        )


# ---------------------------------------------------------- split-complex flat
class TestSplitFlat:
    """One-launch split-complex flat kernels (VERDICT r2 item 4a): both
    re/im components ride a leading batch axis of the same flat buffer."""

    @pytest.mark.parametrize("shape,wv,level", [
        ((54,), "db4", 3),
        ((24, 36), ("db2", "db3"), 2),
        ((10, 12, 14), "db2", 2),
    ])
    def test_dec_rec_match_complex_oracle(self, shape, wv, level, rng):
        from non_decimated_wavelets_tpu.ops import pallas_flat

        plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.float32)
        taps_np = tuple(np.asarray(t) for t in plan.taps_hp)
        assert pallas_flat.split_supported(shape, jnp.float32, taps_np)
        xc = (rng.standard_normal(shape)
              + 1j * rng.standard_normal(shape)).astype(np.complex64)
        pair = jnp.stack([jnp.asarray(xc.real), jnp.asarray(xc.imag)])
        with pltpu.force_tpu_interpret_mode():
            y = pallas_flat.dec_split_flat(pair, taps_np, level)
            xr = pallas_flat.rec_split_flat(y, taps_np, level, False)
        # Complex oracle on CPU (native complex path).
        yc = plan.dec(xc, level, band_axis=0)
        np.testing.assert_allclose(np.asarray(y[0]), np.asarray(yc.real),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(y[1]), np.asarray(yc.imag),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(xr[0]), xc.real, atol=1e-4)
        np.testing.assert_allclose(np.asarray(xr[1]), xc.imag, atol=1e-4)

    def test_pair_split_complex_magnitude_shrink(self, rng):
        """The fused split iterate must apply the COMPLEX soft-threshold
        (joint re/im magnitude), matching the explicit computation."""
        from non_decimated_wavelets_tpu.ops import pallas_flat

        shape, level, lam = (20, 24), 2, 0.35
        plan = nw.NDDWT(wavelet="db2", shape=shape, dtype=jnp.float32)
        taps_np = tuple(np.asarray(t) for t in plan.taps_hp)
        pair = jnp.asarray(rng.standard_normal((2,) + shape), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y, xr = pallas_flat.pair_split_flat(pair, taps_np, level, False,
                                                lam)
        # Explicit: dec both components, joint-magnitude shrink, rec.
        yd = plan.dec_split(pair, level)
        mag = np.sqrt(np.asarray(yd[0]) ** 2 + np.asarray(yd[1]) ** 2)
        fac = np.maximum(mag - lam, 0.0) / np.maximum(mag, 1e-30)
        fac[0] = 1.0  # approx band unshrunk
        ys = np.stack([np.asarray(yd[0]) * fac, np.asarray(yd[1]) * fac])
        np.testing.assert_allclose(np.asarray(y), ys, atol=1e-4)
        xref = plan.rec_split(jnp.asarray(ys))
        np.testing.assert_allclose(np.asarray(xr), np.asarray(xref),
                                   atol=1e-4)

    def test_plan_dec_rec_split_roundtrip(self, rng):
        """Public API: dec_rec_split with zero threshold is the identity."""
        shape = (18, 22)
        plan = nw.NDDWT(wavelet="db3", shape=shape, dtype=jnp.float32,
                        path="pallas")
        pair = jnp.asarray(rng.standard_normal((2,) + shape), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y, xr = plan.dec_rec_split(pair, 2)
        assert y.shape == (2, plan.num_bands(2)) + shape
        np.testing.assert_allclose(np.asarray(xr), np.asarray(pair),
                                   atol=1e-4)


# --------------------------------------------------------------------------
# Multi-iterate kernels: N dec->shrink->rec sweeps / a whole FISTA solve in
# ONE launch (VERDICT r2 item 3).
# --------------------------------------------------------------------------


class TestMultiIterate:
    def test_chain_flat_matches_sequential(self, rng):
        """chain_flat with a varying threshold schedule == the sequence of
        explicit dec -> shrink-details -> rec sweeps (direct path)."""
        from non_decimated_wavelets_tpu.models.denoise import soft_threshold

        shape, level = (22, 30), 2
        lams = (0.3, 0.12, 0.05)
        plan = nw.NDDWT(wavelet="db2", shape=shape, dtype=jnp.float32)
        taps_np = tuple(np.asarray(t) for t in plan.taps_hp)
        assert pallas_flat.iter_supported(shape, jnp.float32, taps_np, "chain")
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            xr = pallas_flat.chain_flat(x, taps_np, level, False, lams)
        ref = x
        for lam in lams:
            y = direct_path.dec_direct(ref, plan.taps, level)
            y = jnp.concatenate([y[:1], soft_threshold(y[1:], lam)], axis=0)
            ref = direct_path.rec_direct(y, plan.taps, level, False)
        np.testing.assert_allclose(np.asarray(xr), np.asarray(ref), atol=1e-4)

    def test_plan_dec_rec_n(self, rng):
        """Public API: one-launch chain == the dec_rec fallback loop."""
        shape = (16, 20)
        plan_p = nw.NDDWT(wavelet="db3", shape=shape, dtype=jnp.float32,
                          path="pallas")
        plan_d = nw.NDDWT(wavelet="db3", shape=shape, dtype=jnp.float32,
                          path="direct")
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        lams = [0.2, 0.1]
        with pltpu.force_tpu_interpret_mode():
            xr = plan_p.dec_rec_n(x, 2, lams)
        ref = plan_d.dec_rec_n(x, 2, lams)
        np.testing.assert_allclose(np.asarray(xr), np.asarray(ref), atol=1e-4)
        with pytest.raises(ValueError, match="at least one"):
            plan_d.dec_rec_n(x, 2, [])

    def test_fista_fused_matches_loop(self, rng):
        """The one-launch in-kernel FISTA solve == the XLA scan loop (same
        schedule, same data term), to f32 iterative tolerance."""
        from non_decimated_wavelets_tpu.models import fista_inpaint

        n, lam, iters = 40, 0.05, 12
        x0 = rng.standard_normal((n, n))
        mask = (rng.random((n, n)) < 0.6).astype(np.float32)
        b = jnp.asarray(mask * x0, jnp.float32)
        maskj = jnp.asarray(mask)
        plan_p = nw.NDDWT(wavelet="db2", shape=(n, n), preserve_l2=True,
                          dtype=jnp.float32, path="pallas")
        plan_d = nw.NDDWT(wavelet="db2", shape=(n, n), preserve_l2=True,
                          dtype=jnp.float32, path="direct")
        with pltpu.force_tpu_interpret_mode():
            fast = fista_inpaint(plan_p, b, maskj, lam, level=2, iters=iters)
        # jnp-scalar lam forces the generic scan loop (no fused path).
        ref = fista_inpaint(plan_d, b, maskj, jnp.float32(lam), level=2,
                            iters=iters)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=2e-3)

    def test_fista_fused_split_matches_complex(self, rng):
        """One-launch split-complex FISTA == the complex-arithmetic loop
        (CPU oracle): real filters + joint-magnitude shrink."""
        from non_decimated_wavelets_tpu.models import (
            fista_inpaint,
            fista_inpaint_split,
        )

        n, lam, iters = 32, 0.04, 10
        xc = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        mask = (rng.random((n, n)) < 0.6).astype(np.float32)
        b = (mask * xc).astype(np.complex64)
        plan_p = nw.NDDWT(wavelet="db2", shape=(n, n), preserve_l2=True,
                          dtype=jnp.float32, path="pallas")
        plan_d = nw.NDDWT(wavelet="db2", shape=(n, n), preserve_l2=True,
                          dtype=jnp.float32, path="direct")
        pair = jnp.asarray(np.stack([b.real, b.imag]))
        with pltpu.force_tpu_interpret_mode():
            fast = fista_inpaint_split(plan_p, pair, jnp.asarray(mask), lam,
                                       level=2, iters=iters)
        ref = fista_inpaint(plan_d, jnp.asarray(b), jnp.asarray(mask),
                            jnp.float32(lam), level=2, iters=iters)
        np.testing.assert_allclose(
            np.asarray(fast[0]) + 1j * np.asarray(fast[1]), np.asarray(ref),
            atol=2e-3,
        )

    def test_dec_pallas_lam_fused(self, rng):
        """Tiled dec with in-kernel shrink == dec + XLA detail shrink."""
        from non_decimated_wavelets_tpu.models.denoise import soft_threshold

        shape, level, lam = (16, 128), 2, 0.2
        plan = nw.NDDWT(wavelet="db3", shape=shape, dtype=jnp.float32)
        taps_np = tuple(np.asarray(t) for t in plan.taps_hp)
        assert pallas_kernels._dec_tiles(shape, taps_np) is not None
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y = pallas_kernels.dec_pallas(x, taps_np, level, lam=lam)
            y0 = pallas_kernels.dec_pallas(x, taps_np, level)
        ref = jnp.concatenate([y0[:1], soft_threshold(y0[1:], lam)], axis=0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)

    def test_fista_step_elemwise(self, rng):
        """Fused momentum + data-term pass == the XLA formula."""
        from non_decimated_wavelets_tpu.ops import pallas_elemwise

        shape, mom, step = (8, 128), 0.63, 0.9
        assert pallas_elemwise.supported(shape, jnp.float32)
        xn, xp, b = (
            jnp.asarray(rng.standard_normal(shape), jnp.float32)
            for _ in range(3)
        )
        mask = jnp.asarray(
            (rng.random(shape) < 0.5).astype(np.float32)
        )
        with pltpu.force_tpu_interpret_mode():
            v = pallas_elemwise.fista_step(
                xn, xp, mask, b, jnp.float32(mom), step
            )
        z = xn + mom * (xn - xp)
        ref = z - step * (mask * (mask * z - b))
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref), atol=1e-5)

    def test_fista_stepped_matches_loop(self, rng):
        """Big-shape FISTA fast path (fused-shrink tiled dec + fused
        elementwise glue) == the generic scan loop."""
        from non_decimated_wavelets_tpu.models import fista_inpaint
        from non_decimated_wavelets_tpu.ops import pallas_flat

        shape, lam, iters = (192, 1024), 0.05, 3
        taps_np = None
        # beyond the flat whole-solve budget -> must take the stepped path
        assert not pallas_flat.iter_supported(
            shape, jnp.float32, taps_np, "fista"
        )
        x0 = rng.standard_normal(shape)
        mask = (rng.random(shape) < 0.6).astype(np.float32)
        b = jnp.asarray(mask * x0, jnp.float32)
        maskj = jnp.asarray(mask)
        plan_p = nw.NDDWT(wavelet="db2", shape=shape, preserve_l2=True,
                          dtype=jnp.float32, path="pallas")
        plan_d = nw.NDDWT(wavelet="db2", shape=shape, preserve_l2=True,
                          dtype=jnp.float32, path="direct")
        with pltpu.force_tpu_interpret_mode():
            fast = fista_inpaint(plan_p, b, maskj, lam, level=1, iters=iters)
        ref = fista_inpaint(plan_d, b, maskj, jnp.float32(lam), level=1,
                            iters=iters)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=2e-3)

    def test_dec4_lam_fused(self, rng):
        """4D lead-stage in-kernel shrink == dec4 + XLA detail shrink."""
        from non_decimated_wavelets_tpu.models.denoise import soft_threshold
        from non_decimated_wavelets_tpu.ops import pallas_4d

        shape, level, lam = (8, 8, 4, 32), 2, 0.15
        plan = nw.NDDWT(wavelet="db2", shape=shape, dtype=jnp.float32)
        taps_np = tuple(np.asarray(t) for t in plan.taps_hp)
        assert pallas_4d.supported(shape, jnp.float32, taps_np)
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y = pallas_4d.dec4(x, taps_np, level, lam=lam)
            y0 = pallas_4d.dec4(x, taps_np, level)
        ref = jnp.concatenate([y0[:1], soft_threshold(y0[1:], lam)], axis=0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)

    def test_dec4_kgroup_matches_direct(self, rng, monkeypatch):
        """k-grouped lead-stage writes (G=2, forced): same bands.

        The auto-policy is pinned to G=1 (hardware-measured dead-end —
        see ``_lead_kgroup``), but the plumbing stays for toolchain
        updates; keep it correct by forcing G=2 through the policy."""
        from non_decimated_wavelets_tpu.ops import pallas_4d

        shape, level = (8, 8, 8, 32), 2
        plan = nw.NDDWT(wavelet="db2", shape=shape, dtype=jnp.float32)
        taps_np = tuple(np.asarray(t) for t in plan.taps_hp)
        monkeypatch.setattr(
            pallas_4d, "_lead_kgroup", lambda *a, **k: 2
        )
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y = pallas_4d.dec4(x, taps_np, level)
        yd = direct_path.dec_direct(x, plan.taps, level)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yd), atol=1e-4)

    def test_mag_shrink_pair_elemwise(self, rng):
        """Fused split-pair magnitude shrink == the shared XLA helper."""
        from non_decimated_wavelets_tpu.models.denoise import (
            soft_threshold_mag_pair,
        )
        from non_decimated_wavelets_tpu.ops import pallas_elemwise

        B, n, lam = 7, 32, 0.3
        y = jnp.asarray(rng.standard_normal((2, B, n, n)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = pallas_elemwise.mag_shrink_pair(y, lam)
        assert out is not None
        ref = soft_threshold_mag_pair(y, lam)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_fista_stepped_split_matches_loop(self, rng):
        """Big-shape split-complex FISTA fast path == the generic loop."""
        from non_decimated_wavelets_tpu.models import fista_inpaint_split
        from non_decimated_wavelets_tpu.ops import pallas_flat

        shape, lam, iters = (192, 1024), 0.05, 3
        assert not pallas_flat.iter_supported(
            shape, jnp.float32, None, "fista", batch=2
        )
        xc = (rng.standard_normal(shape)
              + 1j * rng.standard_normal(shape)).astype(np.complex64)
        mask = (rng.random(shape) < 0.6).astype(np.float32)
        pair = jnp.asarray(
            np.stack([(mask * xc).real, (mask * xc).imag]), jnp.float32
        )
        maskj = jnp.asarray(mask)
        plan_p = nw.NDDWT(wavelet="db2", shape=shape, preserve_l2=True,
                          dtype=jnp.float32, path="pallas")
        plan_d = nw.NDDWT(wavelet="db2", shape=shape, preserve_l2=True,
                          dtype=jnp.float32, path="direct")
        with pltpu.force_tpu_interpret_mode():
            fast = fista_inpaint_split(plan_p, pair, maskj, lam, level=1,
                                       iters=iters)
        ref = fista_inpaint_split(plan_d, pair, maskj, jnp.float32(lam),
                                  level=1, iters=iters)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=2e-3)


@pytest.mark.parametrize(
    "tiles,bgroup,prefetch,fuse",
    [
        (None, 2, 0, False),
        (None, 4, 0, False),
        (None, 1, 2, False),
        (None, 1, 3, False),
        (None, 4, 2, False),
        ((16, 24), 4, 2, False),
        ((8, 16), 2, 3, False),
        (None, 1, 0, True),
        (None, 4, 2, True),
    ],
)
def test_dec_level_knob_variants(tiles, bgroup, prefetch, fuse, rng):
    """Per-level kernel tuning knobs (write grouping / input prefetch /
    tile override / fused-interior loads — scripts/exp_dec_opt.py) stay
    exact vs the direct path. Drives the per-level chain directly:
    dec_pallas routes small shapes to the one-launch multilevel kernel,
    bypassing the knobbed kernel. 48^2 leading extent -> a 3x3 grid at
    (16,16) tiles, so true INTERIOR tiles exercise the fused single-DMA
    load variant (a 2x2 grid is all boundary and would never fire it)."""
    shape, level = (48, 48, 128), 3
    plan = nw.NDDWT(wavelet="db4", shape=shape, dtype=jnp.float32)
    taps_np = tuple(np.asarray(t) for t in plan.taps_hp)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    y_ref = direct_path.dec_direct(x, plan.taps, level)

    def dec_levels(v):
        nb = 8
        B = nb + (nb - 1) * (level - 1)
        big = jnp.empty((B,) + shape, v.dtype)
        approx = v
        off = B
        for lvl in range(level):
            off -= nb - 1
            final = lvl == level - 1
            out = pallas_kernels._fused_dec_level(
                approx, big, off, taps_np, approx_to_big=final
            )
            if final:
                return out
            big, approx = out

    def rec_levels(y):
        # Per-level streaming rec chain (mirrors _rec_dispatch's tail).
        nb = 8
        scale = 1.0 / nb
        band_src = [("y", b) for b in range(nb)]
        acc = pallas_kernels._fused_rec_level(y, None, band_src, taps_np,
                                              scale)
        pos = nb
        for _ in range(1, level):
            band_src = [("a", 0)] + [("y", pos + b - 1)
                                     for b in range(1, nb)]
            acc = pallas_kernels._fused_rec_level(y, acc, band_src, taps_np,
                                                  scale)
            pos += nb - 1
        return acc

    saved = (pallas_kernels._DEC_TILES_OVERRIDE,
             pallas_kernels._DEC_LEVEL_BGROUP,
             pallas_kernels._DEC_PREFETCH,
             pallas_kernels._FUSE_INTERIOR)
    try:
        pallas_kernels._DEC_TILES_OVERRIDE = tiles
        pallas_kernels._DEC_LEVEL_BGROUP = bgroup
        pallas_kernels._DEC_PREFETCH = prefetch
        pallas_kernels._FUSE_INTERIOR = fuse
        with pltpu.force_tpu_interpret_mode():
            y = jax.jit(dec_levels)(x)
            xr = jax.jit(rec_levels)(y)
    finally:
        (pallas_kernels._DEC_TILES_OVERRIDE,
         pallas_kernels._DEC_LEVEL_BGROUP,
         pallas_kernels._DEC_PREFETCH,
         pallas_kernels._FUSE_INTERIOR) = saved
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=2e-5)


def test_interpret_probe_pins_jax_internal():
    """``NDDWT._pallas_interpret_forced`` reads a jax-internal config
    attribute (no public probe exists for ``force_tpu_interpret_mode``).
    Pin it: if a JAX upgrade moves the attribute this test fails visibly
    instead of CPU CI regressing to an opaque Mosaic lowering error
    (VERDICT r4 item 7)."""
    from jax._src import config as _jcfg

    assert hasattr(_jcfg, "pallas_tpu_interpret_mode_context_manager"), (
        "jax internal moved: update NDDWT._pallas_interpret_forced"
    )
    assert hasattr(
        _jcfg.pallas_tpu_interpret_mode_context_manager, "value"
    )
    # The probe itself must track the context manager state.
    assert nw.NDDWT._pallas_interpret_forced() is False
    with pltpu.force_tpu_interpret_mode():
        assert nw.NDDWT._pallas_interpret_forced() is True
    assert nw.NDDWT._pallas_interpret_forced() is False
