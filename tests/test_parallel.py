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


@needs_8
def test_tp_unet_forward_matches_replicated():
    """Megatron-pattern tensor-parallel UNet forward (params sharded over a
    model axis, GSPMD-inserted collectives) must match the single-device
    forward, and the sharding rules must actually hit the attention/FF
    weights."""
    from jax.sharding import Mesh, PartitionSpec as P
    from syn3r_tpu.models.svd_unet import UNetSpatioTemporalConditionModel
    from syn3r_tpu.parallel.tensor_parallel import (make_tp_unet_forward,
                                                    unet_tp_shardings)

    unet = UNetSpatioTemporalConditionModel(
        block_out_channels=(32, 64), num_attention_heads=(2, 4),
        layers_per_block=1)
    key = jax.random.PRNGKey(0)
    sample = jax.random.normal(key, (2, 2, 8, 8, 8))
    ehs = jax.random.normal(key, (2, 1, 1024))
    tids = jnp.tile(jnp.asarray([[6.0, 127.0, 0.02]]), (2, 1))
    params = unet.init(key, sample, 1.0, ehs, tids)

    mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
    specs = unet_tp_shardings(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    col = [jax.tree_util.keystr(k) for k, s in flat if s.spec == P(None, "model")]
    row = [jax.tree_util.keystr(k) for k, s in flat if s.spec == P("model", None)]
    assert any("to_q" in k for k in col)
    assert any("to_v" in k for k in col)
    assert any("proj" in k and "ff" in k for k in col)
    assert any("to_out" in k for k in row)
    assert any("ff" in k for k in row)
    # conv/norm params stay replicated
    assert all("conv" not in k and "norm" not in k for k in col + row)

    run, params_tp = make_tp_unet_forward(mesh, unet, params)
    # each sharded weight holds half its sharded axis per device
    qk = next(v for k, v in
              jax.tree_util.tree_flatten_with_path(params_tp)[0]
              if "to_q']['kernel" in jax.tree_util.keystr(k))
    assert len(qk.sharding.device_set) == 2

    out = run(sample, 1.0, ehs, tids)
    ref = unet.apply(params, sample, 1.0, ehs, tids)
    assert out.shape == (2, 2, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@needs_8
def test_sp_unet_forward_matches_replicated():
    """Frame-axis (sequence-parallel) sharded UNet forward must match the
    replicated forward: spatial work partitions freely over frames; XLA
    inserts collectives only at the temporal transformers / (3,1,1)
    temporal convs."""
    from jax.sharding import Mesh
    from syn3r_tpu.models.svd_unet import UNetSpatioTemporalConditionModel
    from syn3r_tpu.parallel.sequence_parallel import make_sp_unet_forward

    unet = UNetSpatioTemporalConditionModel(
        block_out_channels=(32, 64), num_attention_heads=(2, 4),
        layers_per_block=1)
    key = jax.random.PRNGKey(0)
    sample = jax.random.normal(key, (2, 8, 8, 8, 8))   # F=8 over 8 devices
    ehs = jax.random.normal(key, (2, 1, 1024))
    tids = jnp.tile(jnp.asarray([[6.0, 127.0, 0.02]]), (2, 1))
    params = unet.init(key, sample, 1.0, ehs, tids)

    mesh = Mesh(np.array(jax.devices()), ("seq",))
    run = make_sp_unet_forward(mesh, unet, params)
    out = run(sample, 1.0, ehs, tids)
    assert len(out.sharding.device_set) == 8
    ref = unet.apply(params, sample, 1.0, ehs, tids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@needs_8
def test_gpipe_matches_sequential():
    """GPipe over a 4-stage transformer-block tower: the pipelined result
    (4 stages x 4 microbatches on a 4-device stage axis) must equal the
    plain sequential application."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from syn3r_tpu.models.svd_unet import BasicTransformerBlock
    from syn3r_tpu.parallel.pipeline_parallel import make_gpipe

    n_stages, d = 4, 16
    blk = BasicTransformerBlock(heads=2, dim_head=d // 2)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 6, d))               # (B, tokens, d)
    ctx = jnp.zeros((8, 1, d))
    ps = [blk.init(jax.random.PRNGKey(i), x, ctx) for i in range(n_stages)]
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *ps)

    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("stage",))
    stacked = jax.device_put(
        stacked, NamedSharding(mesh, P("stage")))

    def stage_fn(p, xin):
        return blk.apply(p, xin, jnp.zeros((xin.shape[0], 1, d)))

    run = make_gpipe(mesh, stage_fn, n_stages)
    out = run(stacked, x, 4)

    ref = x
    for p in ps:
        ref = blk.apply(p, ref, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@needs_8
def test_dir_tp_composed_guided_denoise():
    """The v5e-8 production configuration: 2D (dir=2, model=4) mesh — the
    guided denoise's two directions sharded over "dir" while the UNet's
    attention/FF params are Megatron-sharded over "model". Pure GSPMD
    composition (params enter _denoise_impl as a jit argument carrying
    their sharding); must match the unsharded pipeline bit-for-bit-ish."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from syn3r_tpu.diffusion.pipeline import (GuidedSVDConfig,
                                              GuidedSVDPipeline, SVDModels)
    from syn3r_tpu.models.svd_unet import UNetSpatioTemporalConditionModel
    from syn3r_tpu.parallel.mesh import make_mesh_2d
    from syn3r_tpu.parallel.tensor_parallel import unet_tp_shardings

    unet = UNetSpatioTemporalConditionModel(
        block_out_channels=(32, 64), num_attention_heads=(2, 4),
        layers_per_block=1)
    frames, h, w = 2, 8, 8
    key = jax.random.PRNGKey(3)
    sample = jax.random.normal(key, (1, frames, h, w, 8))
    ehs = jax.random.normal(key, (1, 1, 1024))
    tids = jnp.tile(jnp.asarray([[6.0, 127.0, 0.02]]), (1, 1))
    params = unet.init(key, sample, 1.0, ehs, tids)

    lat = jax.random.normal(key, (1, frames, h, w, 4))
    clip_s = jax.random.normal(key, (2, 1, 1024))
    cond = jax.random.normal(key, (frames, h, w, 4)) * 0.1
    msk = jnp.full((frames - 2, h, w), 0.4)
    lam = jnp.ones((2, frames))

    def build(params_in, sharding=None):
        cfg = GuidedSVDConfig(num_inference_steps=2, num_frames=frames,
                              variant="post", compute_dtype=jnp.float32,
                              direction_parallel=True,
                              direction_sharding=sharding)
        return GuidedSVDPipeline(
            SVDModels(unet=unet, unet_params=params_in, vae=None,
                      vae_params=None, clip=None, clip_params=None), cfg)

    ref = build(params).denoise(lat, clip_s, clip_s, cond, msk, lam)

    mesh = make_mesh_2d(2, 4)
    params_tp = jax.device_put(params, unet_tp_shardings(params, mesh))
    # latents batch axis = direction; (2, F, h, w, 4) sharded over "dir"
    dir_sh = NamedSharding(mesh, P("dir"))
    out = build(params_tp, dir_sh).denoise(lat, clip_s, clip_s, cond,
                                           msk, lam)
    # 4-way sharded contractions reorder the fp32 sums; ~4e-5 observed
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_make_scene_topology():
    """The CLI's --scene_parallel auto placement: (pair, dir) mesh over
    the visible devices; single device -> disabled; 2 devices ->
    direction-only (pair axis 1)."""
    from syn3r_tpu.parallel.mesh import make_scene_topology

    devs = jax.devices()
    if len(devs) >= 8:
        pair_sh, dir_sh = make_scene_topology(devs[:8])
        assert pair_sh.mesh.devices.shape == (4, 2)
        assert pair_sh.mesh.axis_names == ("pair", "dir")
        assert str(pair_sh.spec) != str(dir_sh.spec)
    pair_sh, dir_sh = make_scene_topology(devs[:2])
    assert pair_sh.mesh.devices.shape == (1, 2)
    pair_sh, dir_sh = make_scene_topology(devs[:1])
    assert pair_sh is None and dir_sh is None
