"""Parity of syn3r_tpu.ops.grid_sample against torch.nn.functional.grid_sample
(the reference's sampling primitive, solver_utils/forward_warp.py:227-231)."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from syn3r_tpu.ops.grid_sample import grid_sample, sample_pixels


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_matches_torch(mode, align_corners):
    rng = np.random.default_rng(0)
    h, w, c = 13, 17, 3
    img = rng.normal(size=(h, w, c)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(9, 11, 2)).astype(np.float32)

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                  mode=mode, align_corners=align_corners))

    timg = torch.from_numpy(img).permute(2, 0, 1)[None]
    tgrid = torch.from_numpy(grid)[None]
    theirs = F.grid_sample(timg, tgrid, mode=mode, padding_mode="zeros",
                           align_corners=align_corners)
    theirs = theirs[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_sample_pixels_identity():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(8, 8, 2)).astype(np.float32)
    x = jnp.arange(8, dtype=jnp.float32)[None, :].repeat(8, axis=0)
    y = jnp.arange(8, dtype=jnp.float32)[:, None].repeat(8, axis=1)
    out = np.asarray(sample_pixels(jnp.asarray(img), x, y, mode="bilinear"))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_zeros_padding():
    img = jnp.ones((4, 4, 1))
    out = sample_pixels(img, jnp.asarray([-2.0, 10.0]), jnp.asarray([0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(out), 0.0)
