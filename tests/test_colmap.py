import numpy as np

from syn3r_tpu.utils import colmap


def _make_model():
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 640, 480,
                                   np.array([500.0, 510.0, 320.0, 240.0]))}
    rng = np.random.default_rng(0)
    imgs = {}
    for i in range(1, 4):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        imgs[i] = colmap.ColmapImage(
            i, q, rng.normal(size=3), 1, f"img_{i}.png",
            rng.uniform(0, 640, size=(5, 2)), np.arange(5, dtype=np.int64))
    pts = colmap.ColmapPoints3D(rng.normal(size=(7, 3)),
                                rng.integers(0, 255, size=(7, 3)).astype(np.uint8),
                                rng.uniform(size=7))
    return cams, imgs, pts


def test_binary_roundtrip(tmp_path):
    cams, imgs, pts = _make_model()
    colmap.write_cameras_binary(cams, str(tmp_path / "cameras.bin"))
    colmap.write_images_binary(imgs, str(tmp_path / "images.bin"))
    colmap.write_points3d_binary(pts, str(tmp_path / "points3D.bin"))

    cams2, imgs2, pts2 = colmap.read_model(str(tmp_path))
    assert cams2[1].model == "PINHOLE"
    np.testing.assert_allclose(cams2[1].params, cams[1].params)
    for i in imgs:
        np.testing.assert_allclose(imgs2[i].qvec, imgs[i].qvec)
        np.testing.assert_allclose(imgs2[i].tvec, imgs[i].tvec)
        assert imgs2[i].name == imgs[i].name
        np.testing.assert_allclose(imgs2[i].xys, imgs[i].xys)
    np.testing.assert_allclose(pts2.xyz, pts.xyz)
    np.testing.assert_array_equal(pts2.rgb, pts.rgb)


def test_text_roundtrip(tmp_path):
    cams, imgs, pts = _make_model()
    colmap.write_cameras_text(cams, str(tmp_path / "cameras.txt"))
    cams2 = colmap.read_cameras_text(str(tmp_path / "cameras.txt"))
    np.testing.assert_allclose(cams2[1].params, cams[1].params)
    assert cams2[1].width == 640


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(1)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    m = colmap.qvec_to_rotmat(q)
    np.testing.assert_allclose(np.eye(3), m @ m.T, atol=1e-12)
    q2 = colmap.rotmat_to_qvec(m)
    np.testing.assert_allclose(q2, q, atol=1e-12)


def test_w2c_and_K():
    cams, imgs, _ = _make_model()
    w2c = imgs[1].w2c()
    np.testing.assert_allclose(w2c[3], [0, 0, 0, 1])
    K = cams[1].K()
    assert K[0, 0] == 500.0 and K[1, 2] == 240.0
