import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from syn3r_tpu.utils import image


def test_bicubic_matches_torch_align_corners():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(17, 23, 3)).astype(np.float32)
    ours = np.asarray(image.resize_bicubic(jnp.asarray(img), 9, 12))
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    theirs = F.interpolate(t, size=(9, 12), mode="bicubic",
                           align_corners=True)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_bicubic_upsample_matches_torch():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(8, 8, 1)).astype(np.float32)
    ours = np.asarray(image.resize_bicubic(jnp.asarray(img), 20, 14))
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    theirs = F.interpolate(t, size=(20, 14), mode="bicubic",
                           align_corners=True)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_gaussian_blur_preserves_mean_and_smooths():
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(32, 32, 1)).astype(np.float32)
    out = np.asarray(image.gaussian_blur(jnp.asarray(img), (5, 5), (1.0, 1.0)))
    assert abs(out.mean() - img.mean()) < 0.01
    assert out.var() < img.var()


def test_resize_antialiased_shape_and_range():
    rng = np.random.default_rng(3)
    img = rng.uniform(size=(576, 1024, 3)).astype(np.float32)
    out = np.asarray(image.resize_antialiased(jnp.asarray(img), 224, 224))
    assert out.shape == (224, 224, 3)
    assert -0.3 < out.min() and out.max() < 1.3


def test_psnr_ssim_identity():
    rng = np.random.default_rng(4)
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    x = jnp.asarray(img)
    assert float(image.psnr(x, x)) > 100
    np.testing.assert_allclose(float(image.ssim(x, x)), 1.0, atol=1e-5)
    noisy = x + 0.1
    np.testing.assert_allclose(float(image.psnr(x, noisy)), 20.0, atol=1e-3)
    assert float(image.ssim(x, noisy)) < 1.0


def test_ssim_matches_known_degradation_ordering():
    rng = np.random.default_rng(5)
    img = rng.uniform(size=(48, 48, 3)).astype(np.float32)
    x = jnp.asarray(img)
    small = float(image.ssim(x, x + 0.01 * jnp.asarray(rng.normal(size=img.shape), jnp.float32)))
    big = float(image.ssim(x, x + 0.1 * jnp.asarray(rng.normal(size=img.shape), jnp.float32)))
    assert big < small < 1.0
