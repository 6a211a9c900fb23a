"""Tiled (culled) rasterizer vs the dense reference path."""
import jax
import jax.numpy as jnp
import numpy as np

from syn3r_tpu.models.gaussians import from_points
from syn3r_tpu.ops import rasterize as rz
from syn3r_tpu.utils.camera import make_camera


def _scene(n=300, seed=0, cap=512):
    rng = np.random.default_rng(seed)
    xyz = np.concatenate([rng.uniform(-1.2, 1.2, (n, 2)),
                          rng.uniform(1.5, 4.0, (n, 1))], 1).astype(np.float32)
    st = from_points(jnp.asarray(xyz),
                     jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
                     capacity=cap)
    st = st.replace(opacity_logits=jnp.where(st.active[:, None], 1.0, -100.0))
    return st


def _cam(w=96, h=72, f=60.0):
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    return make_camera(K, np.eye(4, dtype=np.float32), w, h)


def test_tiled_matches_dense():
    st = _scene()
    cam = _cam()
    sg = rz.project_gaussians(st, cam)
    dense = rz.rasterize(sg, cam.height, cam.width, chunk=128, group=2)
    tiled = rz.rasterize_tiled(sg, cam.height, cam.width, tile_h=32,
                               tile_w=32, cap=512, chunk=128, group=2)
    # tolerance: the tiled path culls at the 3-sigma radius like the CUDA
    # reference; the dense path includes the sub-1% tail beyond it
    np.testing.assert_allclose(np.asarray(tiled.rgb), np.asarray(dense.rgb),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(tiled.alpha),
                               np.asarray(dense.alpha), atol=5e-3)
    np.testing.assert_allclose(np.asarray(tiled.depth),
                               np.asarray(dense.depth), atol=2e-2)


def test_tiled_nonmultiple_resolution():
    st = _scene()
    K = np.array([[50, 0, 45.5], [0, 50, 33.5], [0, 0, 1]], np.float32)
    cam = make_camera(K, np.eye(4, dtype=np.float32), 91, 67)
    sg = rz.project_gaussians(st, cam)
    dense = rz.rasterize(sg, 67, 91, chunk=128, group=2)
    tiled = rz.rasterize_tiled(sg, 67, 91, tile_h=32, tile_w=64, cap=512,
                               chunk=128, group=2)
    np.testing.assert_allclose(np.asarray(tiled.rgb), np.asarray(dense.rgb),
                               atol=5e-3)


def test_tiled_gradients_match_dense():
    st = _scene(n=60, cap=64)
    cam = _cam(w=64, h=32)
    target = jnp.zeros((32, 64, 3))

    def loss(params, method):
        from syn3r_tpu.models.gaussians import with_params
        s = with_params(st, params)
        out = rz.render(s, cam, method=method, chunk=64, group=1,
                        tile_cap=64)
        return jnp.mean((out.rgb - target) ** 2)

    from syn3r_tpu.models.gaussians import get_params
    p = get_params(st)
    gd = jax.grad(lambda p: loss(p, "dense"))(p)
    gt = jax.grad(lambda p: loss(p, "tiled"))(p)
    for k in p:
        np.testing.assert_allclose(np.asarray(gt[k]), np.asarray(gd[k]),
                                   rtol=0.05, atol=1e-5, err_msg=k)


def test_tiled_overflow_drops_back():
    """With a tiny cap the FRONT (nearest) gaussians must survive."""
    # two gaussians on the same pixel, front red, back green
    from tests.test_rasterize import _state
    st = _state([[0, 0, 1.0], [0, 0, 3.0]], [[0.05] * 3] * 2, [0.9, 0.9],
                [[1, 0, 0], [0, 1, 0]], cap=2)
    cam = _cam(w=64, h=64, f=100.0)
    sg = rz.project_gaussians(st, cam)
    out = rz.rasterize_tiled(sg, 64, 64, tile_h=32, tile_w=64, cap=1,
                             chunk=1, group=1)
    c = np.asarray(out.rgb[32, 32])
    assert c[0] > 0.8 and c[1] < 1e-3  # only the front one rendered


def test_slots_from_cumsum_matches_searchsorted():
    """The blocked compare-and-count slot search is bit-exact vs a batched
    searchsorted over the hit cumsum, including tiles with fewer hits than
    cap (missing slots must return N like searchsorted) and N not a
    multiple of the block size."""
    rng = np.random.default_rng(3)
    for n, t, cap, block in [(4096, 24, 256, 512), (1000, 7, 64, 512),
                             (513, 3, 700, 128)]:
        hit = jnp.asarray(rng.random((t, n)) < 0.1)
        cs = jnp.cumsum(hit.astype(jnp.int32), axis=1)
        slots = jnp.arange(1, cap + 1, dtype=jnp.int32)
        ref = jax.vmap(lambda row: jnp.searchsorted(row, slots,
                                                    side="left"))(cs)
        new = rz._slots_from_cumsum(cs, cap, block=block)
        np.testing.assert_array_equal(np.asarray(new), np.asarray(ref))
