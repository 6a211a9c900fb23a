"""Parity of the Pallas composite kernels vs the XLA tiled path.

Runs in interpret mode on the CPU test mesh; the same code compiles to
Mosaic on TPU (exercised by bench.py and the verify driver)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syn3r_tpu.models import gaussians as G
from syn3r_tpu.ops import rasterize as rz
from syn3r_tpu.utils.camera import camera_from_fov, look_at_w2c


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    n = 500
    xyz = np.concatenate([rng.uniform(-1.0, 1.0, (n, 2)),
                          rng.uniform(1.5, 3.5, (n, 1))], 1).astype(np.float32)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    st = G.from_points(jnp.asarray(xyz), jnp.asarray(rgb), capacity=512)
    st = st.replace(log_scales=st.log_scales + 0.5,
                    opacity_logits=jnp.where(st.active[:, None], 1.0, -100.0))
    cam = camera_from_fov(0.9, 0.7, 128, 64,
                          look_at_w2c(jnp.asarray([0.1, 0.0, 0.0]),
                                      jnp.asarray([0.0, 0.0, 2.5])))
    sg = rz.project_gaussians(st, cam, sh_degree=3)
    return st, cam, sg


def test_pallas_forward_matches_xla(scene):
    _, cam, sg = scene
    a = rz.rasterize_tiled(sg, cam.height, cam.width, cap=256, chunk=128,
                           composite="xla")
    b = rz.rasterize_tiled(sg, cam.height, cam.width, cap=256, chunk=128,
                           composite="pallas")
    np.testing.assert_allclose(np.asarray(b.rgb), np.asarray(a.rgb),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b.depth), np.asarray(a.depth),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b.alpha), np.asarray(a.alpha),
                               atol=2e-5, rtol=1e-4)


def test_pallas_forward_uneven_chunk(scene):
    """cap not divisible by chunk: the per-tile lists are zero-padded up to
    a K multiple (padding composites to nothing since opacity = 0)."""
    _, cam, sg = scene
    a = rz.rasterize_tiled(sg, cam.height, cam.width, cap=384, chunk=256,
                           composite="xla")
    b = rz.rasterize_tiled(sg, cam.height, cam.width, cap=384, chunk=256,
                           composite="pallas")
    np.testing.assert_allclose(np.asarray(b.rgb), np.asarray(a.rgb),
                               atol=2e-5, rtol=1e-4)


def test_pallas_forward_odd_cap(scene):
    """Odd cap (e.g. a prime gaussian capacity below tile_cap): must NOT
    degrade K to 1 — pad instead. Guards the ADVICE r2 finding."""
    _, cam, sg = scene
    # cap=min(499, n=512)=499, K=min(128, 499, 128)=128 -> pad to 512
    a = rz.rasterize_tiled(sg, cam.height, cam.width, cap=499, chunk=128,
                           composite="xla")
    b = rz.rasterize_tiled(sg, cam.height, cam.width, cap=499, chunk=128,
                           composite="pallas")
    np.testing.assert_allclose(np.asarray(b.rgb), np.asarray(a.rgb),
                               atol=2e-5, rtol=1e-4)


def test_pallas_zero_gaussians():
    """n=0 must not divide by zero; renders empty."""
    st = G.from_points(jnp.zeros((0, 3)), jnp.zeros((0, 3)), capacity=0)
    cam = camera_from_fov(0.9, 0.7, 64, 32,
                          look_at_w2c(jnp.asarray([0.0, 0.0, 0.0]),
                                      jnp.asarray([0.0, 0.0, 2.5])))
    sg = rz.project_gaussians(st, cam, sh_degree=3)
    out = rz.rasterize_tiled(sg, cam.height, cam.width, cap=256, chunk=128,
                             composite="pallas")
    assert np.asarray(out.alpha).max() == 0.0


@pytest.mark.parametrize("field", ["means", "log_scales", "opacity_logits",
                                   "sh_dc"])
def test_pallas_gradients_match_xla(scene, field):
    st, cam, _ = scene
    target = jnp.zeros((cam.height, cam.width, 3)) + 0.3

    def loss(val, composite):
        st2 = st.replace(**{field: val})
        sg = rz.project_gaussians(st2, cam, sh_degree=3)
        out = rz.rasterize_tiled(sg, cam.height, cam.width, cap=256,
                                 chunk=128, composite=composite)
        return (jnp.abs(out.rgb - target).mean()
                + 0.1 * out.alpha.mean() + 0.05 * out.depth.mean())

    val = getattr(st, field)
    ga = jax.grad(functools.partial(loss, composite="xla"))(val)
    gb = jax.grad(functools.partial(loss, composite="pallas"))(val)
    na = float(jnp.linalg.norm(ga))
    assert na > 0
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               atol=1e-6 + 1e-3 * float(jnp.abs(ga).max()),
                               rtol=2e-3)


def test_pallas_trainer_step_runs(tmp_path, scene):
    from syn3r_tpu.gs.trainer import GSTrainer, TrainConfig, make_viewset
    st, cam, _ = scene
    img = np.asarray(rz.render(st, cam, chunk=128, group=1).rgb)
    views = make_viewset([cam], img[None])
    cfg = TrainConfig(iterations=3, rasterizer="pallas", tile_cap=256,
                      chunk=128, densify_from_iter=10**9)
    tr = GSTrainer(views, cfg, st, model_path=str(tmp_path))
    cam0, img0 = views.view(0)
    ts, m = tr._train_step(tr.state, cam0, img0, None, None,
                           use_lpips=False, use_depth=False)
    assert np.isfinite(float(m["loss"]))
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         ts.gaussians.means, tr.state.gaussians.means)
    assert moved > 0
