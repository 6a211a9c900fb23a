"""Blockwise brute-force k-nearest-neighbors on TPU.

Replaces the reference's CUDA ``simple-knn`` extension (install cmd
``README.md:51``), whose single job is computing the mean distance to the 3
nearest neighbors of every point for Gaussian scale initialization.

TPU-first design: the N x N distance matrix is never materialized. Queries
are processed in blocks against database chunks; the cross term of
||q - p||^2 = |q|^2 + |p|^2 - 2 q.p is a (B, 3) x (3, C) matmul on the MXU,
and the running top-k is merged chunk-by-chunk inside a lax.scan. Exact
brute force — at 3DGS point counts (1e5-1e6, k=3) this is MXU-bound and
fast; no spatial hashing needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pad_to(x: jnp.ndarray, n: int, value: float) -> jnp.ndarray:
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], value, x.dtype)], axis=0)


def knn_sq_dists(points: jnp.ndarray, k: int = 3, query_block: int = 1024,
                 db_chunk: int = 4096,
                 valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Squared distances to the k nearest neighbors (self excluded).

    points: (N, 3) float32. valid: optional (N,) bool — invalid points are
    excluded as neighbors and get zero outputs (slots beyond the number of
    real neighbors are zero too — use :func:`knn_with_indices` when you
    need to tell the two apart). Returns (N, k) float32.
    """
    return knn_with_indices(points, k=k, query_block=query_block,
                            db_chunk=db_chunk, valid=valid)[0]


def knn_mean_sq_dist(points: jnp.ndarray, k: int = 3,
                     valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean squared distance to the (up to) k nearest neighbors — the
    simple-knn quantity 3DGS uses for log-scale init
    (scale = log(sqrt(mean))). The mean divides by the number of REAL
    neighbors, so clouds smaller than k+1 points don't get their scales
    silently deflated by zero-filled missing-neighbor slots."""
    d, _, ok = knn_with_indices(points, k=k, valid=valid)
    return d.sum(axis=-1) / jnp.maximum(ok.sum(axis=-1), 1)


@functools.partial(jax.jit, static_argnames=("k", "query_block", "db_chunk"))
def knn_with_indices(points: jnp.ndarray, k: int = 3,
                     query_block: int = 1024, db_chunk: int = 4096,
                     valid: jnp.ndarray | None = None):
    """k nearest neighbors with indices (self excluded).

    Same blockwise MXU scan as :func:`knn_sq_dists`, carrying the column
    index alongside the distance through the chunk merge (a two-operand
    ``lax.sort`` keyed on distance). Needed by the FSGS-style proximity
    unpooling (gs/densify.py), which grows new Gaussians toward its
    neighbors, not just from their distances.

    points: (N, 3) float32. valid: optional (N,) bool.
    Returns (sq_dists (N, k) f32, idx (N, k) int32, nbr_ok (N, k) bool);
    where nbr_ok is False (fewer than k valid neighbors, or the query
    itself invalid) sq_dists is 0 and idx is the query's own index.
    """
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    nq = -(-n // query_block) * query_block
    nd = -(-n // db_chunk) * db_chunk
    big = 3.0e37
    db = _pad_to(points, nd, 0.0)
    db_valid = _pad_to(valid, nd, False)
    q = _pad_to(points, nq, 0.0)
    q_idx = jnp.arange(nq)
    db_sq = jnp.sum(db * db, axis=-1)

    db_c = db.reshape(-1, db_chunk, 3)
    db_sq_c = db_sq.reshape(-1, db_chunk)
    db_valid_c = db_valid.reshape(-1, db_chunk)

    def per_query_block(qb, qb_idx):
        q_sq = jnp.sum(qb * qb, axis=-1, keepdims=True)

        def scan_chunk(best, chunk):
            best_d, best_i = best
            pts, sq, vld, base = chunk
            cross = jnp.dot(qb, pts.T, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            d = q_sq + sq[None, :] - 2.0 * cross
            col_idx = base + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
            is_self = col_idx == qb_idx[:, None]
            d = jnp.where(is_self | ~vld[None, :], big, jnp.maximum(d, 0.0))
            neg_top, top_pos = jax.lax.top_k(-d, k)            # (B, k)
            top_i = jnp.take_along_axis(col_idx, top_pos, axis=1)
            cat_d = jnp.concatenate([best_d, -neg_top], axis=-1)
            cat_i = jnp.concatenate([best_i, top_i], axis=-1)
            sd, si = jax.lax.sort((cat_d, cat_i), num_keys=1, dimension=-1)
            return (sd[:, :k], si[:, :k]), None

        n_chunks = db_c.shape[0]
        bases = jnp.arange(n_chunks, dtype=jnp.int32) * db_chunk
        init = (jnp.full((qb.shape[0], k), big, jnp.float32),
                jnp.zeros((qb.shape[0], k), jnp.int32))
        (best_d, best_i), _ = jax.lax.scan(
            scan_chunk, init, (db_c, db_sq_c, db_valid_c, bases))
        return best_d, best_i

    q_blocks = q.reshape(-1, query_block, 3)
    qi_blocks = q_idx.reshape(-1, query_block)
    d_out, i_out = jax.lax.map(lambda ab: per_query_block(*ab),
                               (q_blocks, qi_blocks))
    d_out = d_out.reshape(nq, k)[:n]
    i_out = i_out.reshape(nq, k)[:n]
    nbr_ok = (d_out < big * 0.5) & valid[:, None]
    self_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                                (n, k))
    return (jnp.where(nbr_ok, d_out, 0.0),
            jnp.where(nbr_ok, i_out, self_idx), nbr_ok)
