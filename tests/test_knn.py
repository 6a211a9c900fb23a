import jax.numpy as jnp
import numpy as np

from syn3r_tpu.ops.knn import knn_mean_sq_dist, knn_sq_dists


def brute_force_knn(pts, k):
    d = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    return np.sort(d, axis=1)[:, :k]


def test_matches_numpy_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    ours = np.asarray(knn_sq_dists(jnp.asarray(pts), k=3,
                                   query_block=128, db_chunk=256))
    ref = brute_force_knn(pts, 3)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_valid_mask_excludes_points():
    pts = np.array([[0, 0, 0], [1, 0, 0], [0.1, 0, 0], [5, 5, 5]], np.float32)
    valid = jnp.asarray([True, True, False, True])
    d = np.asarray(knn_sq_dists(jnp.asarray(pts), k=1, query_block=8,
                                db_chunk=8, valid=valid))
    # point 0's nearest valid neighbor is point 1 (dist^2=1), not point 2
    np.testing.assert_allclose(d[0, 0], 1.0, atol=1e-5)
    # invalid point gets zeros
    np.testing.assert_allclose(d[2], 0.0)


def test_mean_sq_dist():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    ours = np.asarray(knn_mean_sq_dist(jnp.asarray(pts), k=3))
    ref = brute_force_knn(pts, 3).mean(axis=1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_knn_with_indices_matches_numpy():
    from syn3r_tpu.ops.knn import knn_with_indices
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    d, idx, ok = knn_with_indices(jnp.asarray(pts), k=3,
                                  query_block=64, db_chunk=128)
    d, idx, ok = np.asarray(d), np.asarray(idx), np.asarray(ok)
    full = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(full, np.inf)
    ref_idx = np.argsort(full, axis=1)[:, :3]
    ref_d = np.take_along_axis(full, ref_idx, axis=1)
    assert ok.all()
    np.testing.assert_allclose(d, ref_d, rtol=1e-4, atol=1e-5)
    # indices must point at the same neighbors (ties aside: compare the
    # gathered coordinates, not the raw index values)
    np.testing.assert_allclose(pts[idx], pts[ref_idx], atol=1e-6)


def test_knn_with_indices_degenerate():
    from syn3r_tpu.ops.knn import knn_with_indices
    # only 2 valid points but k=3: missing neighbors flagged, idx = self
    pts = np.array([[0, 0, 0], [1, 0, 0], [9, 9, 9]], np.float32)
    valid = jnp.asarray([True, True, False])
    d, idx, ok = knn_with_indices(jnp.asarray(pts), k=3, query_block=8,
                                  db_chunk=8, valid=valid)
    d, idx, ok = np.asarray(d), np.asarray(idx), np.asarray(ok)
    assert list(ok[0]) == [True, False, False]
    assert idx[0, 0] == 1 and idx[0, 1] == 0 and idx[0, 2] == 0
    np.testing.assert_allclose(d[0], [1.0, 0.0, 0.0], atol=1e-5)
    assert not ok[2].any() and (idx[2] == 2).all()
