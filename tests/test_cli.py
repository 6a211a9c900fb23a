"""CLI-layer tests: synthetic on-disk COLMAP scene -> train -> render ->
metrics -> summarize, exercising the reference's bash-matrix flow."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from syn3r_tpu.models import gaussians as G
from syn3r_tpu.ops.rasterize import render
from syn3r_tpu.utils import colmap
from syn3r_tpu.utils.camera import camera_from_fov, look_at_w2c

W, H = 64, 48


def _write_scene(root):
    """Render a GT gaussian scene from 10 poses and write a COLMAP dir."""
    from PIL import Image
    rng = np.random.default_rng(0)
    n = 150
    xyz = np.concatenate([rng.uniform(-0.8, 0.8, (n, 2)),
                          rng.uniform(1.8, 2.6, (n, 1))], 1).astype(np.float32)
    rgb = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    gt = G.from_points(jnp.asarray(xyz), jnp.asarray(rgb), capacity=256)
    gt = gt.replace(log_scales=gt.log_scales + 0.7,
                    opacity_logits=jnp.where(gt.active[:, None], 2.0, -100.0))

    os.makedirs(os.path.join(root, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    f = 40.0
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", W, H,
                                   np.array([f, f, W / 2, H / 2]))}
    images = {}
    for i in range(10):
        eye = jnp.asarray([0.1 * (i - 4.5), 0.01 * i, 0.0])
        w2c = np.asarray(look_at_w2c(eye, jnp.asarray([0., 0., 2.2])))
        cam = camera_from_fov(2 * np.arctan(W / (2 * f)),
                              2 * np.arctan(H / (2 * f)), W, H, w2c)
        img = np.asarray(render(gt, cam, chunk=64, group=1).rgb)
        name = f"{i:03d}.png"
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(root, "images", name))
        images[i + 1] = colmap.ColmapImage(
            i + 1, colmap.rotmat_to_qvec(w2c[:3, :3]), w2c[:3, 3], 1, name,
            np.zeros((0, 2)), np.zeros(0, np.int64))
    colmap.write_cameras_binary(cams, os.path.join(root, "sparse/0/cameras.bin"))
    colmap.write_images_binary(images, os.path.join(root, "sparse/0/images.bin"))
    pts = colmap.ColmapPoints3D(xyz.astype(np.float64),
                                (rgb * 255).astype(np.uint8), np.zeros(n))
    colmap.write_points3d_binary(pts, os.path.join(root, "sparse/0/points3D.bin"))


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    _write_scene(str(root))
    return str(root)


def test_load_colmap_scene(scene_dir):
    from syn3r_tpu.gs.scene import load_colmap_scene
    sc = load_colmap_scene(scene_dir, n_views=3, llffhold=8)
    # 10 images, llffhold 8 -> tests at sorted idx 0, 8; 8 train -> 3 picked
    assert len(sc.test_cameras) == 2
    assert len(sc.train_cameras) == 3
    assert sc.train_images.shape == (3, H, W, 3)
    assert sc.points_xyz.shape[1] == 3
    assert sc.train_cameras[0].K[0, 0] == pytest.approx(40.0)


def test_train_render_metrics_summarize(scene_dir, tmp_path):
    from syn3r_tpu.cli import metrics as metrics_cli
    from syn3r_tpu.cli import render as render_cli
    from syn3r_tpu.cli import summarize as summarize_cli
    from syn3r_tpu.cli import train as train_cli

    model = str(tmp_path / "scenes" / "toy")
    train_cli.main([
        "-s", scene_dir, "-m", model, "--n_views", "3",
        "--iterations", "30", "--refine_cycle_num", "1",
        "--num_frames", "5", "--num_inference_steps", "10",
        "--diffusion_width", "64", "--diffusion_height", "48",
        "--start_sample_svd_frame", "10", "--log_every", "0",
        "--disable_densification",
    ])
    assert os.path.exists(os.path.join(model, "chkpnt_latest.npz"))

    render_cli.main(["-s", scene_dir, "-m", model])
    test_dirs = os.listdir(os.path.join(model, "test"))
    assert len(test_dirs) == 1
    rdir = os.path.join(model, "test", test_dirs[0], "renders")
    assert len(os.listdir(rdir)) == 2

    metrics_cli.main(["-m", model])
    res = open(os.path.join(model, "eval_res.txt")).read()
    assert "PSNR" in res and "SSIM" in res

    table = summarize_cli.summarize(str(tmp_path / "scenes"),
                                    checkpoints=[res.splitlines()[0]])
    assert "toy" in table and "AVG(1 scenes)" in table


def test_generate_pcd_roundtrip(scene_dir, tmp_path):
    from syn3r_tpu.cli.generate_pcd import (depth_to_pointcloud, merge_views,
                                            remove_statistical_outliers,
                                            write_colmap_points)
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(H, W, 3)).astype(np.float32)
    depth = np.full((H, W), 2.0, np.float32)
    K = np.array([[40, 0, W / 2], [0, 40, H / 2], [0, 0, 1]], np.float32)
    xyz, rgb = depth_to_pointcloud(img, depth, K, np.eye(4, dtype=np.float32))
    assert xyz.shape[1] == 3 and len(xyz) > 100
    np.testing.assert_allclose(xyz[:, 2], 2.0, atol=1e-5)
    xyz2, rgb2 = merge_views([(xyz, rgb)], voxel=0.1)
    assert len(xyz2) <= len(xyz)
    xyz3, rgb3 = remove_statistical_outliers(xyz2, rgb2)
    assert len(xyz3) <= len(xyz2)
    out = str(tmp_path / "points3D.bin")
    write_colmap_points(xyz3, rgb3, out)
    back = colmap.read_points3d_binary(out)
    assert len(back.xyz) == len(xyz3)


def test_lpips_module_runs():
    from syn3r_tpu.models.lpips import LPIPS
    m = LPIPS()
    a = jnp.ones((32, 32, 3)) * 0.5
    b = jnp.zeros((32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), a, b)
    d_same = float(m.apply(params, a, a))
    d_diff = float(m.apply(params, a, b))
    assert d_same == pytest.approx(0.0, abs=1e-6)
    assert np.isfinite(d_diff)


def test_runbook_convert_baseline_report(scene_dir, tmp_path):
    """The one-command weights runbook (cli.runbook): convert a tiny
    random-weight HF-layout snapshot, run the GS-only baseline stage on a
    synthetic scene, and produce the report. The 'full' stage needs the
    real full-config weights (environment-blocked) and is exercised up to
    its CLI wiring elsewhere."""
    import torch
    from syn3r_tpu.cli import runbook as runbook_cli

    # tiny HF-layout snapshot with real key names
    snap = tmp_path / "snapshot"
    from tests.test_pipeline_golden import _torch_models
    tu, tv, tc, _ = _torch_models()
    for sub, mod in (("unet", tu), ("vae", tv), ("image_encoder", tc)):
        d = snap / sub
        d.mkdir(parents=True)
        torch.save(mod.state_dict(),
                   str(d / "diffusion_pytorch_model.bin"))

    out = str(tmp_path / "run")
    runbook_cli.main([
        "--hf_snapshot", str(snap), "--scene", scene_dir, "--out", out,
        "--n_views", "3", "--iterations", "25",
        "--stages", "convert,baseline,report",
        "--extra", "--log_every", "0", "--disable_densification",
    ])
    for f in ("unet.npz", "vae.npz", "clip.npz"):
        assert os.path.exists(os.path.join(out, "weights", f))
    assert os.path.exists(os.path.join(out, "gs_only", "eval_res.txt"))
    import json
    report = json.load(open(os.path.join(out, "runbook_report.json")))
    assert "PSNR" in report["gs_only"]


@pytest.mark.slow
def test_batch_fleet_parallel(tmp_path):
    """Scene-parallel fleet runner: 2 synthetic scenes, 2 subprocess
    workers on the CPU backend (SURVEY.md §7 layer 8)."""
    from syn3r_tpu.cli import batch as batch_cli

    data_root = tmp_path / "data"
    out_root = tmp_path / "out"
    for name in ("scene_a", "scene_b"):
        _write_scene(str(data_root / name))

    batch_cli.main([
        "--dataset", "llff", "--data_root", str(data_root),
        "--out_root", str(out_root), "--scenes", "scene_a", "scene_b",
        "--parallel", "2",
        "--extra", "--iterations", "20", "--refine_cycle_num", "1",
        "--num_frames", "3", "--num_inference_steps", "5",
        "--diffusion_width", "64", "--diffusion_height", "48",
        "--start_sample_svd_frame", "5", "--log_every", "0",
        "--disable_densification", "--svd_depth_warmup", "0",
    ])
    for name in ("scene_a", "scene_b"):
        assert os.path.exists(
            os.path.join(out_root, name, "chkpnt_latest.npz")), name
        assert os.path.exists(os.path.join(out_root, name, "log.txt"))


def test_batch_eval_renders_every_checkpoint(tmp_path, monkeypatch):
    """The eval loop must render EVERY checkpoint (init + each refine
    epoch, not chkpnt_latest) like the reference's
    ``for chkpt in $(ls | grep chkpnt)`` (batch_llff_eval.sh:25-28)."""
    from syn3r_tpu.cli import batch as batch_cli

    data_root = tmp_path / "data"
    out_root = tmp_path / "out"
    os.makedirs(data_root / "toy")
    out = out_root / "toy"
    os.makedirs(out)
    for n in ("chkpnt10000.npz", "refine_0_chkpnt10000.npz",
              "refine_1_chkpnt10000.npz", "chkpnt_latest.npz"):
        (out / n).touch()

    render_calls, metrics_calls = [], []
    monkeypatch.setattr("syn3r_tpu.cli.render.main",
                        lambda argv: render_calls.append(argv))
    monkeypatch.setattr("syn3r_tpu.cli.metrics.main",
                        lambda argv: metrics_calls.append(argv))
    monkeypatch.setattr("syn3r_tpu.cli.summarize.summarize",
                        lambda root: "stub")

    batch_cli.main(["--dataset", "llff", "--data_root", str(data_root),
                    "--out_root", str(out_root), "--scenes", "toy",
                    "--eval"])

    ckpts = [a[a.index("--checkpoint") + 1] for a in render_calls]
    names = sorted(os.path.basename(c) for c in ckpts)
    assert names == ["chkpnt10000.npz", "refine_0_chkpnt10000.npz",
                     "refine_1_chkpnt10000.npz"]
    assert len(metrics_calls) == 1


def test_metrics_masked_dtu_protocol(tmp_path):
    """DTU masked evaluation: metrics must be computed over mask>0.5
    pixels only (reference metrics_dtu.py protocol via copy_mask_dtu.sh
    masks)."""
    import numpy as np
    from PIL import Image

    from syn3r_tpu.cli.metrics import evaluate_dirs

    rdir, gdir, mdir = (tmp_path / d for d in ("renders", "gt", "mask"))
    for d in (rdir, gdir, mdir):
        os.makedirs(d)
    rng = np.random.default_rng(0)
    g = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    r = g.copy()
    r[:16] = rng.uniform(0, 1, (16, 32, 3))   # corrupt the TOP half
    mask = np.zeros((32, 32), np.uint8)
    mask[16:] = 255                            # mask keeps the BOTTOM half
    Image.fromarray((r * 255).astype(np.uint8)).save(rdir / "00000.png")
    Image.fromarray((g * 255).astype(np.uint8)).save(gdir / "00000.png")
    Image.fromarray(mask).save(mdir / "00000.png")

    unmasked = evaluate_dirs(str(rdir), str(gdir))
    masked = evaluate_dirs(str(rdir), str(gdir), masks_dir=str(mdir))
    # inside the mask render == gt (up to 8-bit quantization): near-perfect
    assert masked["PSNR"] > 45.0
    assert unmasked["PSNR"] < 25.0
    assert masked["SSIM"] > unmasked["SSIM"]
