import jax.numpy as jnp
import numpy as np

from syn3r_tpu.ops import warp
from syn3r_tpu.utils.camera import make_camera


def _cam(tx=0.0, w=32, h=24, f=30.0, ty=0.0):
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[0, 3] = -tx  # camera at world x=tx
    w2c[1, 3] = -ty
    return make_camera(K, w2c, w, h)


def test_forward_warp_identity():
    rng = np.random.default_rng(0)
    cam = _cam()
    frame = rng.uniform(size=(24, 32, 3)).astype(np.float32)
    depth = np.full((24, 32), 2.0, np.float32)
    warped, valid, flow = warp.forward_warp(jnp.asarray(frame),
                                            jnp.asarray(depth),
                                            cam.w2c, cam.w2c, cam.K)
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-4)
    assert np.asarray(valid).all()
    np.testing.assert_allclose(np.asarray(warped), frame, atol=1e-3)


def test_forward_warp_translation_shift():
    """Fronto-parallel plane at z=2, camera shifted by tx: expected pixel
    shift is -fx*tx/z."""
    rng = np.random.default_rng(1)
    z, f, tx = 2.0, 30.0, 0.5
    cam1, cam2 = _cam(0.0, f=f), _cam(tx, f=f)
    frame = rng.uniform(size=(24, 32, 3)).astype(np.float32)
    depth = np.full((24, 32), z, np.float32)
    warped, valid, flow = warp.forward_warp(jnp.asarray(frame),
                                            jnp.asarray(depth),
                                            cam1.w2c, cam2.w2c, cam1.K)
    shift = f * tx / z  # 7.5 px
    np.testing.assert_allclose(np.asarray(flow[..., 0]), -shift, atol=1e-3)
    np.testing.assert_allclose(np.asarray(flow[..., 1]), 0.0, atol=1e-3)
    # integer-ish columns: warped[:, i] should equal frame[:, i+round(shift)]
    # at the splat accumulation level; just verify interior correlation
    w_np, v_np = np.asarray(warped), np.asarray(valid)
    sh = int(round(shift))
    inner = w_np[:, : 32 - sh - 1]
    src = frame[:, sh:sh + inner.shape[1]]
    valid_in = v_np[:, : 32 - sh - 1]
    # subpixel 0.5 shift -> compare within tolerance to the bilinear average
    blend = 0.5 * frame[:, sh:sh + inner.shape[1]] + \
        0.5 * frame[:, sh - 1:sh - 1 + inner.shape[1]] if shift % 1 else src
    err = np.abs(inner - blend)[valid_in]
    assert np.median(err) < 0.2


def test_consistency_zero_for_true_depth():
    """A tilted plane seen from two poses: cycle reprojection error ~0."""
    h, w, f = 24, 32, 30.0
    cam1, cam2 = _cam(0.0), _cam(0.3)
    # plane z = 2 + 0.01*x_world; build depth maps by ray casting per camera
    # For simplicity use a fronto-parallel plane z=2 (exact closed form).
    d1 = np.full((h, w), 2.0, np.float32)
    d2 = np.full((h, w), 2.0, np.float32)
    err = warp.consistency_check_with_depth(jnp.asarray(d1), cam1.w2c, cam1.K,
                                            jnp.asarray(d2), cam2.w2c, cam2.K)
    # interior pixels (in-bounds cycle) should be ~0 error (half-pixel quirk
    # of the reference sampling allows a small bias)
    e = np.asarray(err)[4:-4, 8:-8]
    assert np.median(e) < 0.6


def test_inverse_warp_near_identity():
    """Sub-pixel camera shift of +0.3 px: the reference's sampling quirk
    (effective coordinate x - 0.5, nearest) resolves to the SAME source
    pixel, robustly off the rounding knife edge. (A true identity warp puts
    every sample exactly on the knife edge — inherently f32-ambiguous, in
    the torch reference too.)"""
    rng = np.random.default_rng(2)
    z, f = 2.0, 30.0
    s = 0.3  # sampling shift: u_src = x + s, v_src = y + s — both axes
    # shifted so neither coordinate sits on the nearest-rounding knife edge
    cam1, cam2 = _cam(0.0, f=f), _cam(s * z / f, f=f, ty=s * z / f)
    img = rng.uniform(size=(24, 32, 3)).astype(np.float32)
    depth = np.full((24, 32), z, np.float32)
    res = warp.inverse_warp(jnp.asarray(img), jnp.asarray(depth),
                            jnp.asarray(depth), cam1.w2c, cam2.w2c, cam1.K)
    np.testing.assert_allclose(np.asarray(res.warped_img)[:-1, :-1],
                               img[:-1, :-1], atol=1e-4)
    assert np.asarray(res.mask_warp)[:-1, :-1].all()
    assert np.asarray(res.mask_depth)[:-1, :-1].all()
    assert np.asarray(res.soft_mask_reproj)[:-1, :-1].min() > 0.9


def test_inverse_warp_translation():
    """Target view shifted: gathered image equals source sampled at the
    projected location; out-of-frustum region masked out."""
    rng = np.random.default_rng(3)
    z, f = 2.0, 30.0
    s = 15.3  # fractional shift keeps sampling off rounding boundaries
    tx = s * z / f  # dst camera at +tx -> u_src = x + s
    cam1, cam2 = _cam(0.0, f=f), _cam(tx, f=f, ty=0.3 * z / f)
    img = rng.uniform(size=(24, 32, 3)).astype(np.float32)
    depth = np.full((24, 32), z, np.float32)
    res = warp.inverse_warp(jnp.asarray(img), jnp.asarray(depth),
                            jnp.asarray(depth), cam1.w2c, cam2.w2c, cam1.K)
    # u_src = x + 15.3 -> reference sampling (floor of x + 15.3) picks x+15
    m = np.asarray(res.mask_warp)
    valid_cols = 32 - 16  # x + 15.3 < 32
    assert m[1:, :valid_cols].all()
    assert not m[:, valid_cols + 1:].any()
    out = np.asarray(res.warped_img)
    np.testing.assert_allclose(out[:-1, :valid_cols], img[:-1, 15:31],
                               atol=1e-4)


def test_dilate_mask():
    m = jnp.zeros((9, 9)).at[4, 4].set(1.0) > 0
    d = np.asarray(warp.dilate_mask(m, 5))
    assert d[2:7, 2:7].all()
    assert d.sum() == 25


def test_downsample_mask_to_latent():
    m = jnp.ones((16, 16)).at[:8].set(0.0)
    lat = np.asarray(warp.downsample_mask_to_latent(m, 2, 2))
    np.testing.assert_allclose(lat, [[0.0, 0.0], [1.0, 1.0]])
