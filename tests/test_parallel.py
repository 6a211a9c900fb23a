"""Multi-device tests on the virtual 8-CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from syn3r_tpu.parallel.mesh import make_mesh, replicated, sharded

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 devices")


@needs_8
def test_mesh_and_shardings():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    x = jax.device_put(jnp.arange(16.0), sharded(mesh))
    assert len(x.sharding.device_set) == 8
    y = jax.device_put(jnp.arange(4.0), replicated(mesh))
    assert len(y.sharding.device_set) == 8


@needs_8
def test_dp_gs_train_step_matches_single_device():
    """The 8-way sharded DP step must produce the same update as the
    unsharded computation."""
    from syn3r_tpu.gs.densify import DensifyStats
    from syn3r_tpu.gs.trainer import (AdamState, TrainConfig, TrainState,
                                      make_viewset)
    from syn3r_tpu.models import gaussians as G
    from syn3r_tpu.ops.rasterize import render
    from syn3r_tpu.parallel.data_parallel import make_dp_gs_train_step
    from syn3r_tpu.utils.camera import camera_from_fov, look_at_w2c

    rng = np.random.default_rng(0)
    n = 64
    xyz = np.concatenate([rng.uniform(-0.5, 0.5, (n, 2)),
                          rng.uniform(1.5, 2.5, (n, 1))], 1).astype(np.float32)
    state = G.from_points(jnp.asarray(xyz),
                          jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
                          capacity=64)
    cams, imgs = [], []
    for i in range(8):
        cam = camera_from_fov(0.9, 0.7, 32, 24,
                              look_at_w2c(jnp.asarray([0.15 * (i - 4), 0., 0.]),
                                          jnp.asarray([0., 0., 2.0])))
        img = np.asarray(render(state, cam, chunk=64, group=1).rgb)
        cams.append(cam)
        imgs.append(np.clip(img + rng.normal(0, 0.05, img.shape), 0,
                            1).astype(np.float32))
    views = make_viewset(cams, np.stack(imgs))

    cfg = TrainConfig(chunk=64, group=1, rasterizer="dense")
    ts = TrainState(gaussians=state,
                    adam=AdamState.init(G.get_params(state)),
                    stats=DensifyStats.zeros(64),
                    step=jnp.zeros((), jnp.int32), key=jax.random.PRNGKey(0))

    mesh = make_mesh(8)
    with mesh:
        step, prepare = make_dp_gs_train_step(mesh, cfg, extent=1.0)
        ts_p, cams_p, imgs_p = prepare(ts, views.cameras, views.images)
        new_sharded, loss_sharded = step(ts_p, cams_p, imgs_p)
        # same step on one device (no sharding hints)
        new_single, loss_single = step(ts, views.cameras, views.images)

    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_sharded.gaussians.means),
                               np.asarray(new_single.gaussians.means),
                               atol=1e-5)
    assert float(loss_sharded) > 0


@needs_8
def test_dp_unet_forward_sharded():
    from syn3r_tpu.models.svd_unet import UNetSpatioTemporalConditionModel
    from syn3r_tpu.parallel.data_parallel import make_dp_unet_forward

    unet = UNetSpatioTemporalConditionModel(
        block_out_channels=(32, 64), num_attention_heads=(2, 4),
        layers_per_block=1)
    key = jax.random.PRNGKey(0)
    sample = jax.random.normal(key, (8, 2, 8, 8, 8))
    ehs = jax.random.normal(key, (8, 1, 1024))
    tids = jnp.tile(jnp.asarray([[6.0, 127.0, 0.02]]), (8, 1))
    params = unet.init(key, sample, 1.0, ehs, tids)
    mesh = make_mesh(8)
    with mesh:
        fwd = make_dp_unet_forward(mesh, unet, params)
        out = fwd(sample, 1.0, ehs, tids)
        ref = unet.apply(params, sample, 1.0, ehs, tids)
    assert out.shape == (8, 2, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
