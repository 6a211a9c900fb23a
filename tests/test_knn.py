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
