"""Multi-host glue tests (single-process degenerate forms on the virtual
8-device CPU mesh) and plan config round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import non_decimated_wavelets_tpu as nw
from non_decimated_wavelets_tpu.parallel import make_mesh, multihost


def test_global_mesh_and_sync():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = multihost.global_mesh({"x": 8})
    multihost.assert_mesh_synchronized(mesh)


def test_global_mesh_wrong_count():
    with pytest.raises(ValueError):
        multihost.global_mesh({"x": 3})


def test_host_local_array():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = multihost.global_mesh({"x": 8})
    base = np.arange(64, dtype=np.float32).reshape(64, 1) * np.ones((64, 16), np.float32)

    def fill(idx):
        return base[idx]

    arr = multihost.host_local_array((64, 16), mesh, P("x", None), fill)
    np.testing.assert_allclose(np.asarray(arr), base, atol=0)


def test_initialize_single_process_noop():
    multihost.initialize(num_processes=1)  # must not raise


def test_plan_config_roundtrip():
    plan = nw.NDDWT(
        wavelet=("db2", "db4"), shape=(32, 64), preserve_l2=True, dtype="double"
    )
    cfg = plan.to_config()
    plan2 = nw.NDDWT.from_config(cfg)
    assert plan2.wavelets == plan.wavelets
    assert plan2.shape == plan.shape
    assert plan2.preserve_l2 == plan.preserve_l2
    assert plan2.real_dtype == plan.real_dtype
    for a, b in zip(plan.resp, plan2.resp):
        np.testing.assert_allclose(a, b, atol=0)


def test_desync_check_multi_axis():
    """The desync psum must cover every mesh axis and use
    placement-dependent contributions (a 2-axis mesh regression)."""
    import jax
    from non_decimated_wavelets_tpu.parallel import multihost

    mesh = multihost.global_mesh({"x": 4, "y": 2})
    multihost.assert_mesh_synchronized(mesh)
    mesh1 = multihost.global_mesh({"x": 8})
    multihost.assert_mesh_synchronized(mesh1)
