"""Ragged (arbitrary-shape) Pallas kernel tests — the round-5 closure of
the odd-shape TPU dispatch hole (VERDICT r4 item 1).

The reference runs any size on every backend; its own test configs use
deliberately awkward extents (``[164,64,40]``
``/root/reference/Test/nddwt3D_test.m:5``; ``[64,64,20,10]``
``Test/nddwt4D_test.m:5``). These tests assert (a) the row-grid ragged
kernels reproduce the engine exactly in interpret mode, (b) the plan's
accelerator path resolution serves such shapes via Pallas and NEVER
dispatches the XLA direct path (a documented worker-wedging hazard on the
available TPU backend), and (c) shapes beyond every kernel family's
budget are refused loudly instead of silently routed to the hazard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import non_decimated_wavelets_tpu as nw
from non_decimated_wavelets_tpu.ops import direct_path, pallas_ragged


# Small enough for interpret mode; every case is ragged in at least one
# way (odd leading extent / non-128 trailing flat / tail-overlap tiles).
CASES = [
    ((41, 16, 10), "db2", 2),
    ((19, 257), "db4", 1),
    ((20, 12, 10), ("db1", "db2", "db3"), 2),
    ((10, 6, 4, 6), "db2", 2),
]


def _taps(plan):
    return tuple(np.asarray(t) for t in plan.taps_hp)


@pytest.mark.parametrize("shape,wv,level", CASES)
def test_dec_matches_direct(shape, wv, level, rng):
    plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    assert pallas_ragged.supported(shape, jnp.float32, _taps(plan))
    with pltpu.force_tpu_interpret_mode():
        yp = pallas_ragged.dec_ragged(x, _taps(plan), level)
    yd = direct_path.dec_direct(x, plan.taps, level)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yd), atol=1e-5)


@pytest.mark.parametrize("shape,wv,level", CASES)
@pytest.mark.parametrize("pl2", [False, True])
def test_rec_roundtrip(shape, wv, level, pl2, rng):
    plan = nw.NDDWT(wavelet=wv, shape=shape, preserve_l2=pl2,
                    dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    yd = direct_path.dec_direct(x, plan.taps, level)
    with pltpu.force_tpu_interpret_mode():
        xr = pallas_ragged.rec_ragged(yd, _taps(plan), level, pl2)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-4)


def test_reference_odd_configs_exact(rng):
    """The reference's own awkward test sizes, via the ragged kernels
    (interpret mode; bench.py runs the same configs on hardware)."""
    for shape, wv, level in [
        ((164, 64, 40), ("db1", "db3", "db9"), 2),
        ((64, 64, 20, 10), "db2", 2),
    ]:
        plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y = pallas_ragged.dec_ragged(x, _taps(plan), level)
            xr = pallas_ragged.rec_ragged(y, _taps(plan), level, False)
        yd = direct_path.dec_direct(x, plan.taps, level)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yd),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(xr), np.asarray(x),
                                   atol=1e-4)


def test_fused_shrink_matches_xla(rng):
    shape = (41, 16, 10)
    plan = nw.NDDWT(wavelet="db2", shape=shape, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = pallas_ragged.dec_ragged(x, _taps(plan), 2, lam=0.1)
    from non_decimated_wavelets_tpu.models.denoise import soft_threshold

    yd = direct_path.dec_direct(x, plan.taps, 2)
    ref = jnp.concatenate([yd[:1], soft_threshold(yd[1:], 0.1)], axis=0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_bf16(rng):
    shape = (41, 16, 10)
    plan = nw.NDDWT(wavelet="db2", shape=shape, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        y = pallas_ragged.dec_ragged(x, _taps(plan), 2)
        xr = pallas_ragged.rec_ragged(y, _taps(plan), 2, False)
    assert y.dtype == jnp.bfloat16
    err = float(jnp.max(jnp.abs(
        xr.astype(jnp.float32) - x.astype(jnp.float32)
    )))
    assert err < 0.05  # bf16 storage precision


def test_bases_cover_and_never_straddle():
    """Property check of the static base table on awkward extents."""
    for N0 in [9, 13, 19, 20, 41, 64, 97, 164, 250, 251]:
        for t in [4, 8, 16, 32]:
            for h_l, h_r in [(1, 2), (3, 4), (9, 10)]:
                bs = pallas_ragged._bases(N0, min(t, N0), h_l, h_r)
                if bs is None:
                    continue
                tt = min(t, N0)
                covered = set()
                for b in bs:
                    assert b == 0 or b >= h_l, (N0, t, h_l, h_r, bs)
                    assert b + tt == N0 or b + tt <= N0 - h_r, (
                        N0, t, h_l, h_r, bs)
                    covered.update(range(b, b + tt))
                assert covered == set(range(N0)), (N0, t, h_l, h_r, bs)


def test_resolve_path_never_direct_on_accel(monkeypatch):
    """On an accelerator backend, f32 plans for the reference's odd
    shapes resolve to 'pallas' (the ragged family), and shapes beyond
    every family's budget raise instead of dispatching the hazardous XLA
    direct path (VERDICT r4 item 1)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for shape, wv in [
        ((164, 64, 40), "db4"),
        ((164, 64, 40), ("db1", "db3", "db9")),
        ((64, 64, 20, 10), "db2"),
        ((264, 264), "db2"),
        ((54321,), "db4"),
    ]:
        plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.float32)
        assert plan._resolve_path(is_complex=False) == "pallas", shape
    # big odd volumes ride the padded concat-valid mode (round 5)
    big_odd = nw.NDDWT(wavelet="db4", shape=(250, 250, 250),
                       dtype=jnp.float32)
    assert big_odd._resolve_path(is_complex=False) == "pallas"
    # big odd 4D rides the padded pallas_4d mode (round 5)
    for shape4 in [(128, 128, 60, 9), (192, 192, 100, 25)]:
        p4odd = nw.NDDWT(wavelet="db4", shape=shape4, dtype=jnp.float32)
        assert p4odd._resolve_path(is_complex=False) == "pallas", shape4
    # beyond every family (T > 128 exceeds the lane-chunk geometry; the
    # trailing flat volume exceeds the ragged budget): loud refusal,
    # not silent 'direct'
    refused = nw.NDDWT(wavelet="db4", shape=(32, 32, 32, 130),
                       dtype=jnp.float32)
    with pytest.raises(ValueError, match="hazard"):
        refused._resolve_path(is_complex=False)
    # explicit path='pallas' refuses too (would otherwise silently fall
    # through to the XLA path inside the dispatcher)
    refused_p = nw.NDDWT(wavelet="db4", shape=(32, 32, 32, 130),
                         dtype=jnp.float32, path="pallas")
    with pytest.raises(ValueError, match="pallas"):
        refused_p._resolve_path(is_complex=False)
    # f64 outside the proven 128-multiple class warns loudly
    p64 = nw.NDDWT(wavelet="db4", shape=(164, 64, 40), dtype=jnp.float64)
    with pytest.warns(UserWarning, match="float64"):
        assert p64._resolve_path(is_complex=False) == "direct"
    # f64 on the tiled class rides the compensated df32 kernels, silently
    p64ok = nw.NDDWT(wavelet="db4", shape=(256, 256, 256),
                     dtype=jnp.float64)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert p64ok._resolve_path(is_complex=False) == "pallas"
    # f64 on the 128-multiple class NOT served by df32 (4D) stays on the
    # direct path without the odd-shape warning
    p64d = nw.NDDWT(wavelet="db4", shape=(128, 128, 128, 128),
                    dtype=jnp.float64)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert p64d._resolve_path(is_complex=False) == "direct"


def test_adjointness_interpret(rng):
    """<dec(x), y> == <x, rec_pl2(y)> — the ragged synthesis is the exact
    adjoint of the analysis (tight-frame form)."""
    shape = (20, 12, 10)
    plan = nw.NDDWT(wavelet="db2", shape=shape, preserve_l2=True,
                    dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    B = plan.num_bands(2)
    yr = jnp.asarray(rng.standard_normal((B,) + shape), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        yx = pallas_ragged.dec_ragged(x, _taps(plan), 2)
        xy = pallas_ragged.rec_ragged(yr, _taps(plan), 2, True)
    lhs = float(jnp.vdot(yx, yr))
    rhs = float(jnp.vdot(x, xy))
    assert abs(lhs - rhs) < 1e-2 * max(abs(lhs), 1.0)


def test_random_odd_shape_sweep(rng):
    """Property sweep: random awkward shapes (odd extents, prime dims,
    ragged tails) reproduce the XLA engine in interpret mode."""
    cases = [
        ((23, 11), "db3", 2),
        ((9, 7, 26), "db1", 2),
        ((17, 5, 6), "db2", 1),
        ((7, 5, 3, 4), "db1", 2),
    ]
    for shape, wv, level in cases:
        plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=jnp.float32)
        taps = _taps(plan)
        if not pallas_ragged.supported(shape, jnp.float32, taps):
            continue
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y = pallas_ragged.dec_ragged(x, taps, level)
            xr = pallas_ragged.rec_ragged(y, taps, level, False)
        yd = direct_path.dec_direct(x, plan.taps, level)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yd),
                                   atol=1e-5, err_msg=str(shape))
        np.testing.assert_allclose(np.asarray(xr), np.asarray(x),
                                   atol=1e-4, err_msg=str(shape))


def test_dispatch_ladder_never_crashes(monkeypatch):
    """Gate-consistency fuzz: for a sweep of random shapes/dtypes the
    accelerator path resolution must either serve ('pallas'/'direct')
    or refuse with ValueError — never crash (an IndexError-class gate
    bug was caught by exactly this pattern in r5)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(7)
    shapes = []
    for nd in (1, 2, 3, 4):
        for _ in range(6):
            shapes.append(tuple(int(rng.integers(3, 70)) for _ in range(nd)))
    shapes += [(54321,), (7000000,), (250, 250, 250), (1000, 999),
               (32, 32, 32, 130), (128, 128, 60, 9)]
    for shape in shapes:
        for wv in ("db1", "db4"):
            for dt in (jnp.float32, jnp.float64):
                try:
                    plan = nw.NDDWT(wavelet=wv, shape=shape, dtype=dt)
                except ValueError:
                    continue  # filter longer than an axis etc.
                import warnings

                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    try:
                        path = plan._resolve_path(is_complex=False)
                        assert path in ("pallas", "direct"), (shape, path)
                    except ValueError:
                        pass  # loud refusal is a valid outcome
