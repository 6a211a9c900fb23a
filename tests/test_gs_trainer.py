import jax
import jax.numpy as jnp
import numpy as np

from syn3r_tpu.gs.densify import DensifyStats, densify_and_prune, reset_opacity
from syn3r_tpu.gs.trainer import (GSTrainer, TrainConfig, make_viewset,
                                  order_cameras_tsp, scene_extent)
from syn3r_tpu.models import gaussians as G
from syn3r_tpu.ops.rasterize import render
from syn3r_tpu.utils.camera import camera_from_fov, look_at_w2c, make_camera


def _simple_state(cap=8):
    n = 4
    means = np.array([[0, 0, 2], [0.5, 0, 2], [-0.5, 0, 2], [0, 0.5, 2]],
                     np.float32)
    st = G.from_points(jnp.asarray(means),
                       jnp.asarray(np.full((n, 3), 0.5, np.float32)),
                       capacity=cap)
    return st


def test_densify_clone_split_prune():
    st = _simple_state()
    cap = st.capacity
    # gaussian 0: high grad, small scale -> clone
    # gaussian 1: high grad, large scale -> split (original removed, 2 new)
    # gaussian 2: low grad -> untouched
    # gaussian 3: low opacity -> pruned
    st = st.replace(
        log_scales=st.log_scales.at[0].set(jnp.log(0.001))
                               .at[1].set(jnp.log(0.5)),
        opacity_logits=st.opacity_logits.at[3, 0].set(-10.0))
    stats = DensifyStats.zeros(cap)
    stats = DensifyStats(
        grad_accum=stats.grad_accum.at[0].set(1.0).at[1].set(1.0),
        denom=jnp.ones((cap,)), max_radii=stats.max_radii)

    new, changed = densify_and_prune(st, stats, jax.random.PRNGKey(0),
                                     grad_threshold=0.5, percent_dense=0.01,
                                     extent=1.0, min_opacity=0.005)
    # counts: started 4 active; -1 prune, -1 split orig, +1 clone, +2 split
    assert int(new.num_active) == 4 - 2 + 3
    # gaussian 2 untouched and still active
    assert bool(new.active[2])
    np.testing.assert_allclose(np.asarray(new.means[2]),
                               np.asarray(st.means[2]))
    # gaussian 3 pruned: its slot was freed (and may be reused by a new
    # candidate — changed marks exactly the rewritten slots)
    assert int(changed.sum()) == 3
    assert not bool(changed[2])


def test_densify_respects_capacity():
    st = _simple_state(cap=4)  # full
    stats = DensifyStats(grad_accum=jnp.ones((4,)), denom=jnp.ones((4,)),
                         max_radii=jnp.zeros((4,)))
    new, changed = densify_and_prune(st, stats, jax.random.PRNGKey(0),
                                     grad_threshold=0.5,
                                     percent_dense=100.0,  # all clones
                                     extent=1.0)
    # no free slots -> no writes, but nothing corrupted
    assert int(new.num_active) == 4
    assert int(changed.sum()) == 0


def test_opacity_reset():
    st = _simple_state()
    new = reset_opacity(st, max_opacity=0.01)
    op = np.asarray(new.opacities[np.asarray(new.active)])
    assert (op <= 0.0101).all()


def _toy_scene(n_views=3, w=48, h=36):
    """Ground-truth gaussians rendered from a few cameras = training data."""
    rng = np.random.default_rng(0)
    n = 60
    xyz = np.concatenate([rng.uniform(-0.8, 0.8, (n, 2)),
                          rng.uniform(1.8, 2.6, (n, 1))], axis=1).astype(np.float32)
    rgb = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    gt = G.from_points(jnp.asarray(xyz), jnp.asarray(rgb), capacity=64)
    # make them chunkier + more opaque than default init
    gt = gt.replace(log_scales=gt.log_scales + 0.7,
                    opacity_logits=jnp.where(gt.active[:, None],
                                             2.0, -100.0))
    cams, imgs = [], []
    for i in range(n_views):
        eye = jnp.asarray([0.35 * (i - 1), 0.05 * i, 0.0])
        cam = camera_from_fov(0.9, 0.7, w, h,
                              look_at_w2c(eye, jnp.asarray([0., 0., 2.2])))
        out = render(gt, cam, chunk=64, group=1)
        cams.append(cam)
        imgs.append(np.asarray(out.rgb))
    return gt, cams, np.stack(imgs)


def test_training_improves_psnr():
    gt, cams, imgs = _toy_scene()
    views = make_viewset(cams, imgs)
    # init from noisy GT points
    rng = np.random.default_rng(1)
    xyz = np.asarray(gt.means[np.asarray(gt.active)]) \
        + rng.normal(0, 0.05, (int(gt.num_active), 3)).astype(np.float32)
    init = G.from_points(jnp.asarray(xyz),
                         jnp.asarray(np.full_like(xyz, 0.5)), capacity=64)
    # short budget -> crank the color/opacity lrs so convergence is visible
    cfg = TrainConfig(iterations=400, densify_from_iter=100,
                      densification_interval=100, opacity_reset_interval=10**9,
                      chunk=64, group=1, position_lr_max_steps=400,
                      feature_lr=0.02, opacity_lr=0.08, scaling_lr=0.01)
    tr = GSTrainer(views, cfg, init, model_path="/tmp/gs_test_model")

    cam0, img0 = views.view(0)
    def cur_psnr():
        out = tr.render_view(cam0)
        mse = float(jnp.mean((out["render"] - img0) ** 2))
        return -10 * np.log10(mse + 1e-12)

    before = cur_psnr()
    tr.training(log_every=0)
    after = cur_psnr()
    assert after > before + 3.0, (before, after)


def test_checkpoint_roundtrip(tmp_path):
    _, cams, imgs = _toy_scene(n_views=2)
    views = make_viewset(cams, imgs)
    st = _simple_state()
    cfg = TrainConfig(iterations=5, chunk=8, group=1)
    tr = GSTrainer(views, cfg, st, model_path=str(tmp_path))
    path = tr.save_checkpoint(5)
    means_before = np.asarray(tr.gaussians.means)
    tr.state = tr.state  # noop
    tr.load_checkpoint(path)
    np.testing.assert_allclose(np.asarray(tr.gaussians.means), means_before)
    assert tr.latest_checkpoint() is not None


def test_update_cameras_appends_pseudo():
    _, cams, imgs = _toy_scene(n_views=2)
    views = make_viewset(cams, imgs)
    tr = GSTrainer(views, TrainConfig(iterations=1, chunk=8, group=1),
                   _simple_state(), model_path="/tmp/gs_test_model2")
    poses = np.stack([np.asarray(cams[0].w2c)] * 3)
    K = np.asarray(cams[0].K)
    fake = np.zeros((3, 36, 48, 3), np.float32)
    tr.update_cameras(fake, poses, K, cam_confidences=0.05, append=True)
    assert len(tr.pseudo_views) == 3
    np.testing.assert_allclose(
        np.asarray(tr.pseudo_views.cameras.confidence), 0.05)
    tr.update_cameras(fake[:1], poses[:1], K, cam_confidences=[0.2],
                      append=True)
    assert len(tr.pseudo_views) == 4


def test_tsp_ordering_and_extent():
    cams = []
    for x in [0.0, 2.0, 1.0, 3.0]:  # scrambled along a line
        cams.append(camera_from_fov(0.9, 0.7, 8, 8,
                                    look_at_w2c(jnp.asarray([x, 0., 0.]),
                                                jnp.asarray([1.5, 0., 5.]))))
    from syn3r_tpu.utils.camera import stack_cameras
    batched = stack_cameras(cams)
    order = order_cameras_tsp(batched)
    assert order == [0, 2, 1, 3]
    assert scene_extent(batched) > 0


def test_reset_gaussians_from_pcd_append_keeps_new_points(tmp_path):
    """Regression: when the old state's capacity exceeds the merged target
    capacity, appended points (at the concat tail) must survive truncation
    (the DL3DV cycle>0 path, reference diffusionGS.py:1683-1687)."""
    _, cams, imgs = _toy_scene(n_views=2)
    views = make_viewset(cams, imgs)
    rng = np.random.default_rng(0)
    # old: huge capacity, few actives (post-prune shape)
    old_xyz = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    old = G.from_points(jnp.asarray(old_xyz),
                        jnp.asarray(np.full((100, 3), 0.25, np.float32)),
                        capacity=16384)
    tr = GSTrainer(views, TrainConfig(iterations=1, chunk=8, group=1), old,
                   model_path=str(tmp_path))
    assert int(tr.gaussians.num_active) == 100

    new_xyz = rng.uniform(-1, 1, (4000, 3)).astype(np.float32)
    new_rgb = np.full((4000, 3), 0.75, np.float32)
    tr.reset_gaussians_from_pcd(new_xyz, new_rgb,
                                append_to_old_gaussians=True)
    g = tr.gaussians
    assert int(g.num_active) == 4100, int(g.num_active)
    # every appended point is present among the active rows
    act = np.asarray(g.active)
    means = np.asarray(g.means)[act]
    dc = np.asarray(g.sh_dc)[act].reshape(means.shape[0], -1)
    # old points carry dc for rgb=0.25, new for 0.75 — count by color
    from syn3r_tpu.models.gaussians import rgb_to_sh_dc
    new_dc = np.asarray(rgb_to_sh_dc(jnp.full((1, 3), 0.75)))[0]
    is_new = np.isclose(dc[:, :3], new_dc, atol=1e-5).all(axis=1)
    assert is_new.sum() == 4000, is_new.sum()
    # and the new coordinates are exactly preserved (set equality via sort)
    got = np.sort(means[is_new], axis=0)
    np.testing.assert_allclose(got, np.sort(new_xyz, axis=0), rtol=1e-6)


def test_pearson_depth_loss_properties():
    from syn3r_tpu.gs.losses import pearson_depth_loss
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.uniform(1.0, 5.0, (16, 16)).astype(np.float32))
    # perfectly correlated (any scale/shift) -> loss 0
    assert float(pearson_depth_loss(d, 3.0 * d + 2.0)) < 1e-5
    # anti-correlated -> loss 2
    assert abs(float(pearson_depth_loss(d, -d)) - 2.0) < 1e-5
    # mask: corrupted pixels excluded
    bad = d.at[0, :].set(100.0)
    valid = jnp.ones_like(d, bool).at[0, :].set(False)
    assert float(pearson_depth_loss(d, bad, valid=valid)) < 1e-5


def test_pseudo_depth_supervision_runs(tmp_path):
    """finetune with stored pseudo depths + svd_depth_warmup>0 adds the
    depth term (reconstructed fork semantics, batch_llff_train.sh:39)."""
    _, cams, imgs = _toy_scene(n_views=2)
    views = make_viewset(cams, imgs)
    cfg = TrainConfig(iterations=6, chunk=8, group=1,
                      densify_from_iter=10**9, svd_depth_warmup=1,
                      sample_svd_pseudo_interval=1, start_sample_svd_iter=0,
                      pseudo_cam_sampling_rate=0.0)
    tr = GSTrainer(views, cfg, _simple_state(), model_path=str(tmp_path))
    poses = np.stack([np.asarray(cams[0].w2c)] * 2)
    K = np.asarray(cams[0].K)
    fake = np.full((2, 36, 48, 3), 0.4, np.float32)
    depths = np.full((2, 36, 48), 2.0, np.float32)
    tr.update_cameras(fake, poses, K, cam_confidences=0.05, append=False,
                      depths=depths)
    assert tr.pseudo_depths is not None and tr.pseudo_depths.shape == (2, 36, 48)
    loss = tr.finetune(0, 0, disable_densification=True)
    assert np.isfinite(loss) or np.isnan(loss)  # loop ran; loss logged only with log_every
    # direct step check: depth term produces a finite, different loss
    cam, img, _ = tr._pick_view(0)
    _, m1 = tr._train_step(tr.state, cam, img, None, None,
                           use_lpips=False, use_depth=False)
    _, m2 = tr._train_step(tr.state, cam, img, tr.pseudo_depths[0], None,
                           use_lpips=False, use_depth=True)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))


def test_lpips_loss_path(tmp_path):
    """LPIPS term with random VGG weights: finite and changes the loss."""
    from syn3r_tpu.models.lpips import LPIPS
    _, cams, imgs = _toy_scene(n_views=2, w=32, h=32)
    views = make_viewset(cams, imgs)
    cfg = TrainConfig(iterations=2, chunk=8, group=1,
                      densify_from_iter=10**9, lpips_weight=1.0)
    tr = GSTrainer(views, cfg, _simple_state(), model_path=str(tmp_path))
    params = LPIPS().init(jax.random.PRNGKey(0), imgs[0], imgs[1])
    tr.set_lpips(params)
    cam, img = views.view(0)
    _, m0 = tr._train_step(tr.state, cam, img, None, None,
                           use_lpips=False, use_depth=False)
    _, m1 = tr._train_step(tr.state, cam, img, None, params,
                           use_lpips=True, use_depth=False)
    assert np.isfinite(float(m1["loss"]))
    assert float(m1["loss"]) != float(m0["loss"])
    # and the orchestrator-visible toggle gates it in _run_loop
    tr.use_lpips_loss = True
    tr.finetune(0, 0, disable_densification=True)


def test_find_nearest_cam_constraints():
    from syn3r_tpu.utils.camera import stack_cameras
    cams = []
    for x in [0.0, 1.0, 5.0]:
        cams.append(camera_from_fov(0.9, 0.7, 8, 8,
                                    look_at_w2c(jnp.asarray([x, 0., 0.]),
                                                jnp.asarray([2.0, 0., 5.]))))
    batched = stack_cameras(cams)
    q = camera_from_fov(0.9, 0.7, 8, 8,
                        look_at_w2c(jnp.asarray([0.1, 0., 0.]),
                                    jnp.asarray([2.0, 0., 5.])))
    tr = object.__new__(GSTrainer)  # only the method is needed
    assert tr.find_nearest_cam(q, batched) == 0
    # min-distance excludes the nearest two
    assert tr.find_nearest_cam(q, batched, multi_view_min_dis=2.0) == 2
    # impossible window falls back to unconstrained nearest
    assert tr.find_nearest_cam(q, batched, multi_view_min_dis=100.0) == 0


def test_pseudo_sampling_rate_semantics(tmp_path):
    """pseudo_cam_sampling_rate is the per-eligible-iteration probability
    of drawing a pseudo view (LLFF: 0.02 -> ~2%), NOT scaled by the
    pseudo-view count."""
    _, cams, imgs = _toy_scene(n_views=2)
    views = make_viewset(cams, imgs)
    cfg = TrainConfig(iterations=1, chunk=8, group=1,
                      sample_svd_pseudo_interval=1, start_sample_svd_iter=0,
                      pseudo_cam_sampling_rate=0.02)
    tr = GSTrainer(views, cfg, _simple_state(), model_path=str(tmp_path))
    poses = np.stack([np.asarray(cams[0].w2c)] * 40)
    K = np.asarray(cams[0].K)
    fake = np.zeros((40, 36, 48, 3), np.float32)
    tr.update_cameras(fake, poses, K, append=False)
    picks = [tr._pick_view(i)[2] is not None for i in range(2000)]
    frac = np.mean(picks)
    assert 0.005 < frac < 0.05, frac   # ~2%, NOT ~80% (0.02 * 40)
    # rate <= 0: pure interval cadence (every eligible iteration pseudo)
    tr.cfg.pseudo_cam_sampling_rate = 0.0
    assert all(tr._pick_view(i)[2] is not None for i in range(50))


def test_segment_scan_matches_per_step(tmp_path):
    """The batched-segment scan path (one lax.scan dispatch per densify
    window) must reproduce the per-step dispatch path exactly: same RNG
    pick stream, same math, including mixed real/pseudo picks with depth
    supervision."""
    _, cams, imgs = _toy_scene(n_views=2)
    views = make_viewset(cams, imgs)
    kw = dict(iterations=24, chunk=8, group=1, densify_from_iter=8,
              densify_until_iter=20, densification_interval=8,
              opacity_reset_interval=10 ** 9,
              sample_svd_pseudo_interval=2, start_sample_svd_iter=4,
              pseudo_cam_sampling_rate=0.5, svd_depth_warmup=1, seed=3)

    def build():
        tr = GSTrainer(make_viewset(cams, imgs), TrainConfig(**kw),
                       _simple_state(), model_path=str(tmp_path))
        poses = np.stack([np.asarray(cams[0].w2c)] * 3)
        tr.update_cameras(imgs[:1].repeat(3, axis=0), poses,
                          np.asarray(cams[0].K), append=False)
        tr.pseudo_depths = jnp.ones((3, 36, 48), jnp.float32) * 2.0
        return tr

    tr_scan = build()
    tr_scan.training(log_every=0)

    tr_step = build()
    tr_step._merged_views = lambda: None   # force the per-step fallback
    tr_step.training(log_every=0)

    a = np.asarray(tr_scan.gaussians.means)
    b = np.asarray(tr_step.gaussians.means)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    assert int(tr_scan.state.step) == int(tr_step.state.step) == 24


def test_mono_depth_pseudo_regularization(tmp_path):
    """FSGS's sample_pseudo_interval path (off in every shipped reference
    config; reconstructed for trainer-surface parity): with an installed
    mono-depth estimator and a finite interval, virtual-camera depth
    regularization steps run at the configured cadence, improve depth
    agreement, and stay inert without an estimator."""
    gt, cams, imgs = _toy_scene(n_views=3)
    views = make_viewset(cams, imgs)
    rng = np.random.default_rng(2)
    xyz = np.asarray(gt.means[np.asarray(gt.active)]) \
        + rng.normal(0, 0.05, (int(gt.num_active), 3)).astype(np.float32)
    init = G.from_points(jnp.asarray(xyz),
                         jnp.asarray(np.full_like(xyz, 0.5)), capacity=64)
    cfg = TrainConfig(iterations=30, chunk=8, group=1,
                      densify_from_iter=10 ** 9,
                      sample_pseudo_interval=5, start_sample_pseudo=10,
                      mono_pseudo_per_pair=3, mono_depth_weight=0.1)
    tr = GSTrainer(views, cfg, init, model_path=str(tmp_path))

    calls = []

    def fake_estimator(rgb):
        # a stand-in "monocular" estimate: constant mid-scene depth
        calls.append(1)
        return jnp.full(rgb.shape[:2], 2.2, jnp.float32)

    # inert without an estimator
    tr._maybe_mono_pseudo(20)
    assert int(tr.state.step) == 0

    tr.set_mono_depth_fn(fake_estimator)
    means_before = np.asarray(tr.state.gaussians.means).copy()
    tr.training(log_every=0)
    # due iterations: 10, 15, 20, 25, 30 -> 5 estimator calls
    assert len(calls) == 5, len(calls)
    assert np.isfinite(np.asarray(tr.state.gaussians.means)).all()
    # pseudo cams synthesized between the 3 train cams (2 pairs x 3)
    assert tr._get_mono_pseudo_cams().K.shape[0] == 6
    assert not np.allclose(means_before, np.asarray(tr.state.gaussians.means))


def test_proximity_unpooling_grows_midpoints():
    # 4 sparse points, no gradient signal at all: the plain path grows
    # nothing, the proximity path grows midpoints toward the 2 nearest
    # neighbors of every under-reconstructed (sparse) Gaussian.
    st = _simple_state(cap=16)
    stats = DensifyStats.zeros(16)
    plain, _ = densify_and_prune(st, stats, jax.random.PRNGKey(0),
                                 extent=1.0, use_proximity=False)
    assert int(plain.num_active) == 4
    grown, changed = densify_and_prune(st, stats, jax.random.PRNGKey(0),
                                       extent=1.0, use_proximity=True,
                                       proximity_threshold=0.1)
    # mean 3-NN distance of every point is ~0.5-0.8 > 0.1 * extent: each
    # grows 2 midpoints -> 4 + 8 active
    assert int(grown.num_active) == 12
    # every new mean is the midpoint of two original points
    means = np.asarray(st.means[:4])
    mids = {tuple(np.round(0.5 * (means[i] + means[j]), 5))
            for i in range(4) for j in range(4) if i != j}
    new_means = np.asarray(grown.means)[np.asarray(changed)]
    for m in new_means:
        assert tuple(np.round(m, 5)) in mids
    # raising the threshold above the scene scale disables growth
    none, _ = densify_and_prune(st, stats, jax.random.PRNGKey(0),
                                extent=1.0, use_proximity=True,
                                proximity_threshold=10.0)
    assert int(none.num_active) == 4


def test_proximity_unpooling_averages_attributes():
    st = _simple_state(cap=16)
    # distinct colors so the midpoint average is checkable
    dc = jnp.arange(4, dtype=jnp.float32)[:, None, None] * jnp.ones(
        st.sh_dc[:4].shape[1:])
    st = st.replace(sh_dc=st.sh_dc.at[:4].set(dc))
    stats = DensifyStats.zeros(16)
    grown, changed = densify_and_prune(st, stats, jax.random.PRNGKey(0),
                                       extent=1.0, use_proximity=True,
                                       proximity_threshold=0.1)
    means = np.asarray(st.means[:4])
    dcs = np.asarray(st.sh_dc[:4])
    new_means = np.asarray(grown.means)[np.asarray(changed)]
    new_dc = np.asarray(grown.sh_dc)[np.asarray(changed)]
    for m, c in zip(new_means, new_dc):
        pair = [(i, j) for i in range(4) for j in range(4) if i != j
                if np.allclose(0.5 * (means[i] + means[j]), m, atol=1e-5)]
        assert pair, f"midpoint {m} not from an original pair"
        i, j = pair[0]
        np.testing.assert_allclose(c, 0.5 * (dcs[i] + dcs[j]), atol=1e-5)


def test_trainer_densify_with_proximity_compiles(tmp_path):
    # the jitted _densify_step with use_proximity_densify=True (the fork's
    # DTU-default path) must compile and grow actives on a sparse scene
    gt, cams, imgs = _toy_scene()
    views = make_viewset(cams, imgs)
    init = G.from_points(gt.means[np.asarray(gt.active)][:8],
                         jnp.full((8, 3), 0.5), capacity=64)
    cfg = TrainConfig(iterations=120, densify_from_iter=50,
                      densification_interval=50,
                      opacity_reset_interval=10 ** 9, chunk=64, group=1,
                      use_proximity_densify=True, proximity_threshold=1e-4)
    tr = GSTrainer(views, cfg, init, model_path=str(tmp_path))
    before = int(tr.state.gaussians.num_active)
    tr.training(log_every=0)
    after = int(tr.state.gaussians.num_active)
    assert after > before, (before, after)


def test_big_point_prune_gated_on_opacity_reset():
    # 3DGS semantics: screen-size (max_radii2D > 20) and world-scale
    # (> 0.1 * extent) prunes engage ONLY after the first opacity reset
    # (the trainer's size_threshold gate).
    st = _simple_state(cap=8)
    st = st.replace(log_scales=st.log_scales.at[0].set(jnp.log(5.0)))
    stats = DensifyStats(grad_accum=jnp.zeros((8,)), denom=jnp.ones((8,)),
                         max_radii=jnp.zeros((8,)).at[1].set(50.0))
    # gate closed (early training): nothing pruned despite huge scale/radius
    early, _ = densify_and_prune(st, stats, jax.random.PRNGKey(0),
                                 extent=10.0, max_world_scale=0.1,
                                 max_screen_size=20.0, big_point_gate=False)
    assert int(early.num_active) == 4
    # gate open: gaussian 0 (world-huge) and 1 (screen-huge) pruned
    late, _ = densify_and_prune(st, stats, jax.random.PRNGKey(0),
                                extent=10.0, max_world_scale=0.1,
                                max_screen_size=20.0, big_point_gate=True)
    assert int(late.num_active) == 2
    assert not bool(late.active[0]) and not bool(late.active[1])
    assert bool(late.active[2]) and bool(late.active[3])
