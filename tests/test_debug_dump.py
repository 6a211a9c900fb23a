"""The reference's QC artifact surface (diffusionGS.py:871-884 per-pair
uncertainty/cond PNG dumps, :1201-1202 lambda heatmap, :1106-1109
generated frames + video) — here behind DiffusionGSConfig.save_debug /
cli.train --save_debug, written by utils/debug_dump.dump_pair_debug."""

import numpy as np
import pytest

from syn3r_tpu.pipeline.completion import PairConditioning
from syn3r_tpu.utils.debug_dump import (dump_pair_debug, save_gif,
                                        save_heatmap_png, save_png)


def _cond(f=4, h=12, w=16, lh=3, lw=4, steps=5):
    r = np.random.default_rng(0)
    return PairConditioning(
        image_start=r.uniform(size=(h, w, 3)).astype(np.float32),
        image_end=r.uniform(size=(h, w, 3)).astype(np.float32),
        cond_images=r.uniform(size=(f - 2, h, w, 3)).astype(np.float32),
        masks=r.uniform(size=(f - 2, lh, lw)).astype(np.float32),
        lambda_ts=(r.uniform(size=(steps, f)) > 0.5).astype(np.float32))


def test_dump_pair_debug_artifact_set(tmp_path):
    from PIL import Image
    f = 4
    cond = _cond(f=f)
    frames = np.random.default_rng(1).uniform(size=(f, 12, 16, 3)) \
        .astype(np.float32)
    out = tmp_path / "debug" / "cyc0_pair0"
    written = dump_pair_debug(str(out), cond, frames)

    names = {p.split("/")[-1] for p in written}
    expect = {"endpoint_start.png", "endpoint_end.png", "lambda_ts.png",
              "completion.gif"}
    expect |= {f"cond_{i:02d}.png" for i in range(f - 2)}
    expect |= {f"uncertainty_{i:02d}.png" for i in range(f - 2)}
    expect |= {f"generated_{i:02d}.png" for i in range(f)}
    assert names == expect
    for p in written:
        im = Image.open(p)
        im.load()
        assert im.size[0] > 0
    # endpoint PNG round-trips the pixel values (uint8 quantization only)
    got = np.asarray(Image.open(str(out / "endpoint_start.png")),
                     dtype=np.float32) / 255.0
    np.testing.assert_allclose(got, cond.image_start, atol=1 / 255.0 + 1e-6)
    # the gif animates all F frames
    gif = Image.open(str(out / "completion.gif"))
    assert getattr(gif, "n_frames", 1) == f


def test_heatmap_constant_matrix_no_nan(tmp_path):
    # degenerate all-equal matrix (e.g. all-certain mask) must not divide
    # by zero
    p = str(tmp_path / "h.png")
    save_heatmap_png(p, np.ones((4, 6), np.float32))
    from PIL import Image
    assert Image.open(p).size == (24, 16)  # 4x nearest upscale


def test_png_accepts_2d_gray(tmp_path):
    p = str(tmp_path / "g.png")
    save_png(p, np.linspace(0, 1, 12, dtype=np.float32).reshape(3, 4))
    from PIL import Image
    assert Image.open(p).size == (4, 3)


def test_gif_rejects_nothing_out_of_range(tmp_path):
    # values outside [0,1] are clipped, not wrapped
    p = str(tmp_path / "c.gif")
    save_gif(p, np.stack([np.full((2, 2, 3), -1.0, np.float32),
                          np.full((2, 2, 3), 2.0, np.float32)]))
    from PIL import Image
    im = Image.open(p)
    assert np.asarray(im.convert("RGB")).max() in (0, 255)


def test_orchestrator_save_debug_flag(tmp_path):
    """DiffusionGS.densify_views writes the artifact dir when save_debug
    is on — same tiny synthetic setup as test_orchestrator's refine-cycle
    test, warp-only completion."""
    pytest.importorskip("PIL")
    import os

    import jax.numpy as jnp

    from syn3r_tpu.gs.trainer import GSTrainer, TrainConfig, make_viewset
    from syn3r_tpu.models import gaussians as G
    from syn3r_tpu.pipeline.orchestrator import DiffusionGS, DiffusionGSConfig
    from tests.test_orchestrator import _scene

    cams, imgs, xyz = _scene()
    views = make_viewset(cams, imgs)
    init = G.from_points(jnp.asarray(xyz),
                         jnp.asarray(np.full_like(xyz, 0.5)), capacity=128)
    cfg = TrainConfig(iterations=10, densify_from_iter=10 ** 9, chunk=64,
                      group=1)
    tr = GSTrainer(views, cfg, init, model_path=str(tmp_path))
    tr.training(log_every=0)

    dcfg = DiffusionGSConfig(diffusion_width=64, diffusion_height=48,
                             num_frames=5, num_inference_steps=10,
                             perturb_interp_poses=False, save_debug=True)
    runner = DiffusionGS(tr, dcfg, save_dir=str(tmp_path / "dense"))
    runner.densify_views(0)

    dbg = tmp_path / "dense" / "debug"
    assert dbg.is_dir()
    pair_dirs = sorted(os.listdir(dbg))
    assert pair_dirs and all(d.startswith("cyc0_pair") for d in pair_dirs)
    first = dbg / pair_dirs[0]
    assert (first / "completion.gif").exists()
    assert (first / "lambda_ts.png").exists()
    assert (first / "uncertainty_00.png").exists()
    assert (first / "generated_04.png").exists()   # all num_frames dumped
