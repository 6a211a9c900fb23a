"""End-to-end refine-cycle test: synthetic 3-view scene, warp-only
completion (no SVD weights needed), one full DiffusionGS.run cycle."""
import numpy as np
import jax
import jax.numpy as jnp

from syn3r_tpu.gs.trainer import GSTrainer, TrainConfig, make_viewset
from syn3r_tpu.models import gaussians as G
from syn3r_tpu.ops.rasterize import render
from syn3r_tpu.pipeline import completion as C
from syn3r_tpu.pipeline.orchestrator import DiffusionGS, DiffusionGSConfig
from syn3r_tpu.utils.camera import camera_from_fov, look_at_w2c


def _scene(n_views=3, w=64, h=48):
    rng = np.random.default_rng(0)
    n = 120
    xyz = np.concatenate([rng.uniform(-0.8, 0.8, (n, 2)),
                          rng.uniform(1.8, 2.6, (n, 1))], 1).astype(np.float32)
    rgb = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    gt = G.from_points(jnp.asarray(xyz), jnp.asarray(rgb), capacity=128)
    gt = gt.replace(log_scales=gt.log_scales + 0.7,
                    opacity_logits=jnp.where(gt.active[:, None], 2.0, -100.0))
    cams, imgs = [], []
    for i in range(n_views):
        eye = jnp.asarray([0.3 * (i - 1), 0.02 * i, 0.0])
        cam = camera_from_fov(0.9, 0.7, w, h,
                              look_at_w2c(eye, jnp.asarray([0., 0., 2.2])))
        cams.append(cam)
        imgs.append(np.asarray(render(gt, cam, chunk=64, group=1).rgb))
    return cams, np.stack(imgs), xyz


def test_search_hypers_v2_schedule():
    masks = jnp.zeros((3, 8, 8)).at[1].set(1.0)  # middle frame uncertain
    lam = np.asarray(C.search_hypers_v2(masks, num_steps=10))
    assert lam.shape == (10, 5)
    np.testing.assert_allclose(lam[:, 0], 1.0)   # endpoints always guided
    np.testing.assert_allclose(lam[:, -1], 1.0)
    # certain frame (u=0): threshold quad_tau(0)=20 -> lambda=1 while
    # 10 - t > 20 -> never... with 10 steps all zero
    assert lam[:, 1].sum() == 0
    # uncertain frame (u=1): quad_tau(1)=(a+b+c)*100 ≈ 37.7 -> also 0 at
    # 10 steps; with more steps the uncertain frame stops being guided
    # EARLIER (smaller threshold crossing) than certain frames
    lam100 = np.asarray(C.search_hypers_v2(masks, num_steps=100))
    t_certain = lam100[:, 1].sum()    # steps guided for certain frame
    t_uncertain = lam100[:, 2].sum()
    assert t_certain > t_uncertain > 0


def test_prepare_pair_conditioning_shapes():
    cams, imgs, xyz = _scene()
    gt = G.from_points(jnp.asarray(xyz),
                       jnp.asarray(np.full_like(xyz, 0.5)), capacity=128)

    def render_fn(pose):
        from syn3r_tpu.utils.camera import make_camera
        cam = make_camera(np.asarray(cams[0].K), pose, 64, 48)
        out = render(gt, cam, chunk=64, group=1)
        alpha = out.alpha
        depth = jnp.where(alpha > 1e-6, out.depth / jnp.maximum(alpha, 1e-6),
                          0.0)
        return out.rgb, depth

    poses = C.interpolate_pair_poses(np.asarray(cams[0].w2c),
                                     np.asarray(cams[1].w2c), 9)
    img_l, depth_l = render_fn(jnp.asarray(poses[0]))
    img_r, depth_r = render_fn(jnp.asarray(poses[-1]))
    cond = C.prepare_pair_conditioning(render_fn, cams[0].K,
                                       jnp.asarray(poses), img_l, depth_l,
                                       img_r, depth_r, num_steps=10,
                                       latent_downsample=8)
    assert cond.cond_images.shape == (7, 48, 64, 3)
    assert cond.masks.shape == (7, 6, 8)
    assert cond.lambda_ts.shape == (10, 9)
    assert np.isfinite(np.asarray(cond.cond_images)).all()
    m = np.asarray(cond.masks)
    assert (0 <= m).all() and (m <= 1).all()


def test_prepare_pair_conditioning_forward_warp():
    """interp_type='forward_warp' (reference warp_images, diffusionGS.py:
    1512-1605): endpoint splatting, BINARY latent masks, no GS render of
    the target poses (render_fn must not be called)."""
    cams, imgs, xyz = _scene()
    gt = G.from_points(jnp.asarray(xyz),
                       jnp.asarray(np.full_like(xyz, 0.5)), capacity=128)

    def render_fn(pose):
        from syn3r_tpu.utils.camera import make_camera
        cam = make_camera(np.asarray(cams[0].K), pose, 64, 48)
        out = render(gt, cam, chunk=64, group=1)
        alpha = out.alpha
        depth = jnp.where(alpha > 1e-6, out.depth / jnp.maximum(alpha, 1e-6),
                          0.0)
        return out.rgb, depth

    def forbidden_render_fn(pose):
        raise AssertionError("forward_warp must not render target poses")

    poses = C.interpolate_pair_poses(np.asarray(cams[0].w2c),
                                     np.asarray(cams[1].w2c), 9)
    img_l, depth_l = render_fn(jnp.asarray(poses[0]))
    img_r, depth_r = render_fn(jnp.asarray(poses[-1]))
    cond = C.prepare_pair_conditioning(forbidden_render_fn, cams[0].K,
                                       jnp.asarray(poses), img_l, depth_l,
                                       img_r, depth_r, num_steps=10,
                                       latent_downsample=8,
                                       warp_mode="forward_warp")
    assert cond.cond_images.shape == (7, 48, 64, 3)
    assert cond.masks.shape == (7, 6, 8)
    assert cond.lambda_ts.shape == (10, 9)
    assert np.isfinite(np.asarray(cond.cond_images)).all()
    m = np.asarray(cond.masks)
    assert set(np.unique(m)).issubset({0.0, 1.0})    # binary (:1595-1596)
    # near-endpoint frames splat from a close pose -> mostly covered
    assert m[0].mean() < 0.8
    # cond frames are the splat with dilated holes zeroed
    c = np.asarray(cond.cond_images)
    assert (0 <= c).all() and (c <= 1).all()
    assert (c.sum(-1) > 0).mean() > 0.2


def test_full_refine_cycle(tmp_path):
    cams, imgs, xyz = _scene()
    views = make_viewset(cams, imgs)
    rng = np.random.default_rng(1)
    init = G.from_points(
        jnp.asarray(xyz + rng.normal(0, 0.02, xyz.shape).astype(np.float32)),
        jnp.asarray(np.full_like(xyz, 0.5)), capacity=128)
    cfg = TrainConfig(iterations=40, densify_from_iter=10 ** 9, chunk=64,
                      group=1, start_sample_svd_iter=10,
                      sample_svd_pseudo_interval=2)
    tr = GSTrainer(views, cfg, init, model_path=str(tmp_path))
    dcfg = DiffusionGSConfig(diffusion_width=64, diffusion_height=48,
                             num_frames=5, num_inference_steps=10,
                             refine_cycle_num=1, perturb_interp_poses=False)
    runner = DiffusionGS(tr, dcfg, save_dir=str(tmp_path / "dense"))
    runner.run(refine_cycles=1)
    # pseudo views installed with the configured confidence; the default
    # interpolate_gs_v2 topology gives N pairs INCLUDING the wrap-around
    # (last -> first), reference diffusionGS.py:227,248-250 — and each
    # pair contributes frames[:-1] to the refine set (its final frame
    # duplicates the next pair's first, reference :278-280)
    assert tr.pseudo_views is not None
    assert len(tr.pseudo_views) == 3 * 4  # wrap-around pairs x (frames-1)
    np.testing.assert_allclose(
        np.asarray(tr.pseudo_views.cameras.confidence), 0.05)
    # caches written and reusable
    import os
    assert len(os.listdir(tmp_path / "dense")) == 3
    frames, poses = runner.densify_views(0)     # second call: cache hit
    assert frames.shape == (3, 5, 48, 64, 3)
    # checkpoints with reference naming
    assert tr.latest_checkpoint() is not None


def test_densify_endpoints_are_original_photos(tmp_path):
    """The endpoint conditioning images are the ORIGINAL input photos, not
    GS renders: reference render_GS(idx=...) returns cam.get_image() for a
    train index (diffusionGS.py:152-154) and warp_images_bw nearest-upsizes
    them (:1398-1441); only the endpoint depths come from the GS render.
    With a deliberately bad GS fit and diffusion res == GS res, the cached
    frames' endpoints (replace_endpoints) must equal the photos exactly."""
    cams, imgs, xyz = _scene()
    views = make_viewset(cams, imgs)
    rng = np.random.default_rng(3)
    bad = G.from_points(                      # random cloud: render != photo
        jnp.asarray(rng.uniform(-0.8, 0.8, (64, 3)).astype(np.float32)
                    + np.asarray([0, 0, 2.0], np.float32)),
        jnp.asarray(rng.uniform(0, 1, (64, 3)).astype(np.float32)),
        capacity=128)
    cfg = TrainConfig(iterations=4, densify_from_iter=10 ** 9, chunk=64,
                      group=1)
    tr = GSTrainer(views, cfg, bad, model_path=str(tmp_path))
    dcfg = DiffusionGSConfig(diffusion_width=64, diffusion_height=48,
                             num_frames=3, num_inference_steps=5,
                             refine_cycle_num=1, perturb_interp_poses=False)
    runner = DiffusionGS(tr, dcfg, save_dir=str(tmp_path / "dense"))
    tr.training(0)
    frames, _ = runner.densify_views(0)
    order = runner._ordered_train_indices()
    for pi in range(frames.shape[0]):
        i, j = order[pi], order[(pi + 1) % len(order)]
        np.testing.assert_allclose(np.asarray(frames[pi, 0]), imgs[i],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(frames[pi, -1]), imgs[j],
                                   atol=1e-5)
        gs_render, _ = runner.render_diffusion_res(
            jnp.asarray(views.cameras.w2c[i]))
        assert np.abs(np.asarray(gs_render) - imgs[i]).max() > 0.05


def test_densify_loop0_pair_topology(tmp_path):
    """interpolate_loop0_gs (the DTU preset) stops before the wrap-around:
    N-1 pairs (reference diffusionGS.py:244-246)."""
    cams, imgs, xyz = _scene()
    views = make_viewset(cams, imgs)
    init = G.from_points(jnp.asarray(xyz),
                         jnp.asarray(np.full_like(xyz, 0.5)), capacity=128)
    cfg = TrainConfig(iterations=8, densify_from_iter=10 ** 9, chunk=64,
                      group=1)
    tr = GSTrainer(views, cfg, init, model_path=str(tmp_path))
    dcfg = DiffusionGSConfig(diffusion_width=64, diffusion_height=48,
                             num_frames=3, num_inference_steps=5,
                             refine_cycle_num=1, perturb_interp_poses=False,
                             densify_type="interpolate_loop0_gs")
    runner = DiffusionGS(tr, dcfg, save_dir=str(tmp_path / "dense"))
    tr.training(0)
    frames, poses = runner.densify_views(0)
    assert frames.shape[0] == 2                  # N-1 = 2 pairs, no wrap
    # the refine view set drops each pair's final frame but appends the
    # very last pair's back — the loop0 chain has no successor pair
    # (reference diffusionGS.py:278-289): 2 pairs x (3-1) + 1 = 5 views
    flat_f, flat_p = runner._refine_view_stack(frames, poses)
    assert flat_f.shape[0] == flat_p.shape[0] == 2 * (3 - 1) + 1
    np.testing.assert_allclose(flat_f[-1], np.asarray(frames[-1, -1]))
    np.testing.assert_allclose(flat_p[-1], np.asarray(poses[-1, -1]))


def test_fps_keyframes():
    poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(6)])
    for i in range(6):
        poses[i][0, 3] = i * 0.1
    sel = C.fps_keyframes(poses, 3)
    assert len(sel) == 3 and 0 in sel and 5 in sel  # endpoints farthest


def test_pcd_densification_branch(tmp_path):
    cams, imgs, xyz = _scene()
    views = make_viewset(cams, imgs)
    init = G.from_points(jnp.asarray(xyz),
                         jnp.asarray(np.full_like(xyz, 0.5)), capacity=128)
    cfg = TrainConfig(iterations=10, densify_from_iter=10 ** 9, chunk=64,
                      group=1)
    tr = GSTrainer(views, cfg, init, model_path=str(tmp_path))
    calls = {}

    def fake_dust3r(frames, c2w, K):
        calls["frames"] = np.asarray(frames)
        rng = np.random.default_rng(0)
        return (rng.normal(size=(50, 3)).astype(np.float32),
                rng.uniform(size=(50, 3)).astype(np.float32))

    dcfg = DiffusionGSConfig(diffusion_width=64, diffusion_height=48,
                             num_frames=3, num_inference_steps=5,
                             refine_cycle_num=1, perturb_interp_poses=False,
                             num_views_for_pcd_densification=2)
    runner = DiffusionGS(tr, dcfg, save_dir=str(tmp_path / "dense"),
                         dust3r_fn=fake_dust3r)
    runner.run(refine_cycles=1)
    # per-pair keyframes (reference :274-284): linspace(0, F-1, 2)=[0, 2]
    # minus each pair's last selected index -> 1 keyframe x 3 wrap pairs
    assert calls["frames"].shape[0] == 3
    assert (tmp_path / "dense" / "dense_views_cyc0.ply").exists()
    # gaussians were reset from the (fake) pcd: <=50 active
    assert int(tr.gaussians.num_active) <= 50


def test_refine_captures_pseudo_depths(tmp_path):
    """When svd_depth_warmup > 0, refine_GS captures GS depths at the
    pseudo poses and installs them as depth-supervision targets."""
    cams, imgs, xyz = _scene()
    views = make_viewset(cams, imgs)
    init = G.from_points(jnp.asarray(xyz),
                         jnp.asarray(np.full_like(xyz, 0.5)), capacity=128)
    cfg = TrainConfig(iterations=8, densify_from_iter=10 ** 9, chunk=64,
                      group=1, svd_depth_warmup=1,
                      sample_svd_pseudo_interval=1, start_sample_svd_iter=0,
                      pseudo_cam_sampling_rate=0.5)
    tr = GSTrainer(views, cfg, init, model_path=str(tmp_path))
    dcfg = DiffusionGSConfig(diffusion_width=64, diffusion_height=48,
                             num_frames=3, num_inference_steps=5,
                             refine_cycle_num=1, perturb_interp_poses=False)
    runner = DiffusionGS(tr, dcfg, save_dir=str(tmp_path / "dense"))
    runner.run(refine_cycles=1)
    assert tr.pseudo_depths is not None
    assert tr.pseudo_depths.shape[0] == len(tr.pseudo_views)
    assert np.isfinite(np.asarray(tr.pseudo_depths)).all()


def test_pair_parallel_densify_matches_sequential(tmp_path):
    """pair_parallel=True (one vmapped completion, pair axis sharded over
    the mesh) must reproduce the sequential pair loop exactly — same
    per-pair PRNG keys, same caches."""
    import pytest
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cams, imgs, xyz = _scene()
    views = make_viewset(cams, imgs)
    init = G.from_points(jnp.asarray(xyz),
                         jnp.asarray(np.full_like(xyz, 0.5)), capacity=128)
    cfg = TrainConfig(iterations=8, densify_from_iter=10 ** 9, chunk=64,
                      group=1)
    tr = GSTrainer(views, cfg, init, model_path=str(tmp_path))
    tr.training(0)

    def run(save_dir, **kw):
        dcfg = DiffusionGSConfig(diffusion_width=64, diffusion_height=48,
                                 num_frames=3, num_inference_steps=5,
                                 refine_cycle_num=1,
                                 perturb_interp_poses=False, **kw)
        runner = DiffusionGS(tr, dcfg, save_dir=str(tmp_path / save_dir))
        return runner.densify_views(0)

    f_seq, p_seq = run("seq")
    mesh = Mesh(np.array(jax.devices()[:2]), ("pair",))
    f_par, p_par = run("par", pair_parallel=True,
                       pair_sharding=NamedSharding(mesh, P("pair")))
    assert f_par.shape == f_seq.shape == (3, 3, 48, 64, 3)
    np.testing.assert_allclose(np.asarray(f_par), np.asarray(f_seq),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_par), np.asarray(p_seq),
                               atol=0)
    # caches written for the parallel path too; reload hits them
    f2, _ = run("par", pair_parallel=True)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f_par), atol=0)


def _toy_render_fns():
    cams, imgs, xyz = _scene()
    gt = G.from_points(jnp.asarray(xyz),
                       jnp.asarray(np.full_like(xyz, 0.5)), capacity=128)
    from syn3r_tpu.utils.camera import make_camera

    def render_fn(pose):
        cam = make_camera(np.asarray(cams[0].K), pose, 64, 48)
        out = render(gt, cam, chunk=64, group=1)
        alpha = out.alpha
        depth = jnp.where(alpha > 1e-6, out.depth / jnp.maximum(alpha, 1e-6),
                          0.0)
        return out.rgb, depth

    def render_many_fn(poses):
        rgbs, depths = [], []
        for q in poses:
            r, d = render_fn(q)
            rgbs.append(r)
            depths.append(d)
        return jnp.stack(rgbs), jnp.stack(depths)

    return cams, render_fn, render_many_fn


def test_conditioning_batched_matches_sequential():
    cams, render_fn, render_many_fn = _toy_render_fns()
    poses = C.interpolate_pair_poses(np.asarray(cams[0].w2c),
                                     np.asarray(cams[1].w2c), 9)
    img_l, depth_l = render_fn(jnp.asarray(poses[0]))
    img_r, depth_r = render_fn(jnp.asarray(poses[-1]))
    seq = C.prepare_pair_conditioning(render_fn, cams[0].K,
                                      jnp.asarray(poses), img_l, depth_l,
                                      img_r, depth_r, num_steps=10)
    bat = C.prepare_pair_conditioning(render_fn, cams[0].K,
                                      jnp.asarray(poses), img_l, depth_l,
                                      img_r, depth_r, num_steps=10,
                                      render_many_fn=render_many_fn)
    np.testing.assert_allclose(np.asarray(bat.cond_images),
                               np.asarray(seq.cond_images), atol=1e-6)
    np.testing.assert_allclose(np.asarray(bat.masks),
                               np.asarray(seq.masks), atol=1e-6)
    np.testing.assert_allclose(np.asarray(bat.lambda_ts),
                               np.asarray(seq.lambda_ts))


def test_perturb_batched_matches_sequential():
    cams, render_fn, render_many_fn = _toy_render_fns()
    poses = C.interpolate_pair_poses(np.asarray(cams[0].w2c),
                                     np.asarray(cams[1].w2c), 6)
    refs = [poses[0], poses[-1]]
    seq = C.perturb_and_select_poses(
        render_fn, cams[0].K, poses[1:-1], refs,
        np.random.default_rng(7), perturb_num=3)
    bat = C.perturb_and_select_poses(
        render_fn, cams[0].K, poses[1:-1], refs,
        np.random.default_rng(7), perturb_num=3,
        render_many_fn=render_many_fn)
    np.testing.assert_allclose(bat, seq, atol=0)


def test_trainer_render_views_batch_matches_render_view():
    from syn3r_tpu.utils.camera import Camera
    cams, imgs, xyz = _scene()
    views = make_viewset(cams, imgs)
    init = G.from_points(jnp.asarray(xyz),
                         jnp.asarray(np.full_like(xyz, 0.5)), capacity=128)
    tr = GSTrainer(views, TrainConfig(rasterizer="dense", chunk=64, group=1),
                   init, model_path="/tmp/gs_batch_render")
    poses = jnp.stack([c.w2c for c in cams])
    batched = Camera(K=jnp.stack([c.K for c in cams]), w2c=poses,
                     confidence=jnp.ones((len(cams),)),
                     width=cams[0].width, height=cams[0].height)
    rgb_b, depth_b = tr.render_views_batch(batched)
    for i, c in enumerate(cams):
        out = tr.render_view(c)
        np.testing.assert_allclose(np.asarray(rgb_b[i]),
                                   np.asarray(out["render"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(depth_b[i]),
                                   np.asarray(out["depth"]), atol=1e-6)


def test_densify_cache_shape_guard(tmp_path):
    # a cache written at a different num_frames must be recomputed, not fed
    # through (stale-config resume)
    cams, imgs, xyz = _scene()
    views = make_viewset(cams, imgs)
    init = G.from_points(jnp.asarray(xyz),
                         jnp.asarray(np.full_like(xyz, 0.5)), capacity=128)
    tr = GSTrainer(views, TrainConfig(iterations=5, chunk=64, group=1,
                                      densify_from_iter=10 ** 9),
                   init, model_path=str(tmp_path))
    cfg = DiffusionGSConfig(num_frames=5, diffusion_width=64,
                            diffusion_height=48, num_inference_steps=5,
                            perturb_interp_poses=False)
    dgs = DiffusionGS(tr, cfg, save_dir=str(tmp_path / "dense"))
    dgs.init_GS(0)
    # poison pair-0's cache with a wrong-shaped entry
    bad = np.zeros((9, 48, 64, 3), np.float32)
    np.savez(str(tmp_path / "dense" /
                 "interpolated_dense_views_cyc0_view0.npz"),
             frames=bad, poses=np.zeros((9, 4, 4), np.float32))
    frames, poses = dgs.densify_views(0)
    assert frames.shape[1] == 5                  # recomputed at num_frames=5


def test_scene_pair_x_direction_mesh_end_to_end(tmp_path):
    """The production v5e-8 within-scene topology — pair_parallel on one
    mesh axis x direction_sharding on the other (LLFF: 3 wrap-around
    pairs x 2 directions on a (4, 2) mesh) — runs a FULL 2-cycle scene
    (init -> densify -> pcd -> refine) end-to-end with a REAL (tiny)
    GuidedSVDPipeline completion, and its densify output reproduces the
    sequential single-device pipeline. This is the end-to-end orchestration
    evidence behind the v5e-8 scene-time projection (PARITY.md '3x
    target'): the inner direction constraint composes with the outer pair
    vmap into a PartitionSpec('pair', 'dir') placement via GSPMD."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs >=8 devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from syn3r_tpu.diffusion.pipeline import (GuidedSVDConfig,
                                              GuidedSVDPipeline, SVDModels)
    from syn3r_tpu.models.clip import CLIPVisionModelWithProjection
    from syn3r_tpu.models.svd_unet import UNetSpatioTemporalConditionModel
    from syn3r_tpu.models.vae import AutoencoderKLTemporalDecoder

    # tiny models with the PRODUCTION 8x VAE downsample (4 levels), so the
    # orchestrator's default latent_downsample=8 mask resolution matches
    rng = jax.random.PRNGKey(0)
    unet = UNetSpatioTemporalConditionModel(
        block_out_channels=(32, 64), num_attention_heads=(2, 4),
        layers_per_block=1, addition_time_embed_dim=32)
    vae = AutoencoderKLTemporalDecoder(block_out_channels=(32, 32, 32, 32),
                                       layers_per_block=1)
    clip = CLIPVisionModelWithProjection(hidden=64, layers=2, heads=4,
                                         mlp_dim=128, patch=32,
                                         image_size=224, projection_dim=1024)
    f, hd, wd = 3, 48, 64                      # latents 6x8
    up = jax.jit(lambda k: unet.init(
        k, jnp.zeros((1, f, 6, 8, 8)), 1.0, jnp.zeros((1, 1, 1024)),
        jnp.zeros((1, 3))))(rng)
    vp = jax.jit(lambda k: vae.init(k, jnp.zeros((1, hd, wd, 3)), 1))(rng)
    cp = jax.jit(lambda k: clip.init(k, jnp.zeros((1, 224, 224, 3))))(rng)
    models = SVDModels(unet=unet, unet_params=up, vae=vae, vae_params=vp,
                       clip=clip, clip_params=cp)

    def make_pipe(**kw):
        return GuidedSVDPipeline(models, GuidedSVDConfig(
            num_inference_steps=2, num_frames=f, decode_chunk_size=4,
            compute_dtype=jnp.float32, **kw))

    cams, imgs, xyz = _scene()
    init = G.from_points(jnp.asarray(xyz),
                         jnp.asarray(np.full_like(xyz, 0.5)), capacity=128)

    def make_trainer(name):
        tr = GSTrainer(make_viewset(cams, imgs),
                       TrainConfig(iterations=8, densify_from_iter=10 ** 9,
                                   chunk=64, group=1),
                       init, model_path=str(tmp_path / name))
        return tr

    def dcfg(**kw):
        return DiffusionGSConfig(diffusion_width=wd, diffusion_height=hd,
                                 num_frames=f, num_inference_steps=2,
                                 refine_cycle_num=2,
                                 perturb_interp_poses=False, **kw)

    # sequential reference: plain pipeline, pair loop, cycle-0 densify
    tr_seq = make_trainer("seq")
    tr_seq.training(0)
    run_seq = DiffusionGS(tr_seq, dcfg(), completion_fn=make_pipe(),
                          save_dir=str(tmp_path / "seq_dense"))
    f_seq, p_seq = run_seq.densify_views(0)

    # production topology: (pair=4, dir=2) mesh, FULL 2-cycle run
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("pair", "dir"))
    pipe_par = make_pipe(
        direction_sharding=NamedSharding(mesh, P("dir")))
    tr_par = make_trainer("par")
    run_par = DiffusionGS(
        tr_par, dcfg(pair_parallel=True,
                     pair_sharding=NamedSharding(mesh, P("pair"))),
        completion_fn=pipe_par, save_dir=str(tmp_path / "par_dense"))
    run_par.run(refine_cycles=2)

    # cycle-0 parity: the sharded vmapped completion must reproduce the
    # sequential pipeline (direction vmap reassociation noise only)
    assert f_seq.shape == (3, f, 48, 64, 3)
    cached = [np.load(str(tmp_path / "par_dense" /
                          f"interpolated_dense_views_cyc0_view{pi}.npz"))
              for pi in range(3)]
    f_par = np.stack([c["frames"] for c in cached])
    p_par = np.stack([c["poses"] for c in cached])
    np.testing.assert_allclose(f_par, np.asarray(f_seq), atol=5e-3)
    np.testing.assert_allclose(p_par, np.asarray(p_seq), atol=0)

    # the full mesh run finished both cycles: cycle-1 caches + a finite
    # held-out render from the refined state
    for pi in range(3):
        assert (tmp_path / "par_dense" /
                f"interpolated_dense_views_cyc1_view{pi}.npz").exists()
    out = tr_par.render_view(cams[1])
    assert np.isfinite(np.asarray(out["render"])).all()
