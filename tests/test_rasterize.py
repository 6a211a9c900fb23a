import jax
import jax.numpy as jnp
import numpy as np

from syn3r_tpu.models.gaussians import GaussianState, from_points
from syn3r_tpu.ops import rasterize as rz
from syn3r_tpu.utils.camera import make_camera


def _front_cam(w=64, h=64, f=100.0):
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    return make_camera(K, np.eye(4, dtype=np.float32), w, h)


def _state(means, scales, opacities, rgbs, cap=None):
    """Build a GaussianState with explicit params (DC-only color)."""
    from syn3r_tpu.models.gaussians import rgb_to_sh_dc
    n = len(means)
    cap = cap or n
    pad = cap - n

    def p(x, fill=0.0):
        x = jnp.asarray(x, jnp.float32)
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    op = np.log(np.asarray(opacities) / (1 - np.asarray(opacities)))
    return GaussianState(
        means=p(means),
        quats=p(np.tile([1.0, 0, 0, 0], (n, 1))),
        log_scales=p(np.log(np.asarray(scales, np.float32))),
        opacity_logits=p(op[:, None], fill=-100.0),
        sh_dc=p(np.asarray(rgb_to_sh_dc(jnp.asarray(rgbs)))[:, None]),
        sh_rest=p(np.zeros((n, 15, 3), np.float32)),
        active=jnp.arange(cap) < n,
    )


def test_single_gaussian_analytic():
    """Isotropic Gaussian at the optical axis: alpha map must equal
    o * exp(-0.5 d^2 / var_px) with var_px = (f*s/z)^2 + 0.3."""
    f, z, s, o = 100.0, 2.0, 0.04, 0.8
    cam = _front_cam(f=f)
    st = _state([[0, 0, z]], [[s, s, s]], [o], [[1.0, 0.2, 0.1]])
    out = rz.render(st, cam, chunk=8, group=1)
    var = (f * s / z) ** 2 + 0.3
    ys, xs = np.mgrid[0:64, 0:64].astype(np.float32)
    d2 = (xs - 32.0) ** 2 + (ys - 32.0) ** 2
    alpha_ref = o * np.exp(-0.5 * d2 / var)
    alpha_ref[alpha_ref < 1 / 255] = 0.0
    np.testing.assert_allclose(np.asarray(out.alpha), alpha_ref, atol=2e-3)
    # color = rgb * alpha (black bg), depth = alpha * z
    np.testing.assert_allclose(np.asarray(out.rgb[:, :, 0]),
                               1.0 * alpha_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.depth), z * alpha_ref,
                               atol=2e-2)


def test_two_gaussians_compositing_order():
    """Front Gaussian (red) occludes rear (green): center pixel is
    c1*a1 + c2*a2*(1-a1) regardless of storage order."""
    f = 100.0
    o1, o2 = 0.9, 0.9
    for order in [0, 1]:
        means = [[0, 0, 1.0], [0, 0, 3.0]]
        rgbs = [[1, 0, 0], [0, 1, 0]]
        if order:
            means, rgbs = means[::-1], rgbs[::-1]
        st = _state(means, [[0.05, 0.05, 0.05]] * 2, [o1, o2], rgbs)
        out = rz.render(st, _front_cam(f=f), chunk=8, group=1)
        center = np.asarray(out.rgb[32, 32])
        exp_r = o1
        exp_g = o2 * (1 - o1)
        np.testing.assert_allclose(center[0], exp_r, atol=5e-3)
        np.testing.assert_allclose(center[1], exp_g, atol=5e-3)


def test_chunk_boundaries_consistent():
    """Result must be identical regardless of chunk/group decomposition."""
    rng = np.random.default_rng(0)
    n = 40
    means = np.concatenate([rng.normal(0, 0.3, (n, 2)),
                            rng.uniform(1.5, 4.0, (n, 1))], axis=1)
    st = _state(means, np.full((n, 3), 0.05), np.full(n, 0.5),
                rng.uniform(size=(n, 3)), cap=64)
    cam = _front_cam(w=32, h=32)
    a = rz.render(st, cam, chunk=8, group=2)
    b = rz.render(st, cam, chunk=64, group=1)
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb),
                               atol=5e-5)  # f32: chunking changes acc order
    np.testing.assert_allclose(np.asarray(a.alpha), np.asarray(b.alpha),
                               atol=5e-5)


def test_gradients_match_finite_difference():
    """Two checks: (a) reverse-mode (vjp) agrees with forward-mode (jvp) on
    random directions — catches scan/remat transpose bugs exactly; (b) plain
    finite differences on the well-conditioned coordinates (color/opacity).
    (The means-gradient is real but too curved near the alpha-cutoff ring
    for FD at f32 — verified by jvp instead.)"""
    rng = np.random.default_rng(1)
    means = np.array([[0.1, 0.0, 2.0], [-0.1, 0.05, 2.5]], np.float32)
    st = _state(means, np.full((2, 3), 0.06), [0.6, 0.7],
                [[0.8, 0.3, 0.2], [0.1, 0.9, 0.4]])
    cam = _front_cam(w=24, h=24, f=60.0)
    target = jnp.asarray(rng.uniform(size=(24, 24, 3)).astype(np.float32))

    from syn3r_tpu.models.gaussians import get_params, with_params

    @jax.jit
    def loss_fn(s):
        out = rz.render(s, cam, chunk=8, group=1)
        return jnp.mean((out.rgb - target) ** 2)

    def loss_p(p):
        return loss_fn(with_params(st, p))

    params = get_params(st)
    g = jax.jit(jax.grad(loss_p))(params)

    # (a) vjp vs jvp on 3 random directions
    for seed in range(3):
        key = jax.random.PRNGKey(seed)
        keys = jax.random.split(key, len(params))
        d = {k: 0.01 * jax.random.normal(kk, v.shape)
             for kk, (k, v) in zip(keys, params.items())}
        _, jvp_val = jax.jvp(loss_p, (params,), (d,))
        vjp_dot = sum(jnp.vdot(g[k], d[k]) for k in params)
        # f32: fwd and rev mode accumulate in different orders
        np.testing.assert_allclose(float(jvp_val), float(vjp_dot),
                                   rtol=3e-3, atol=1e-7)

    # (b) finite differences on near-linear coordinates
    for getter, setter, eps in [
        (lambda s: s.opacity_logits[1, 0],
         lambda s, v: s.replace(opacity_logits=s.opacity_logits.at[1, 0].set(v)), 1e-2),
        (lambda s: s.sh_dc[1, 0, 1],
         lambda s, v: s.replace(sh_dc=s.sh_dc.at[1, 0, 1].set(v)), 1e-2),
    ]:
        v0 = float(getter(st))
        fd = (float(loss_fn(setter(st, v0 + eps)))
              - float(loss_fn(setter(st, v0 - eps)))) / (2 * eps)
        ad = float(getter(with_params(st, g)))
        np.testing.assert_allclose(ad, fd, rtol=0.05, atol=2e-5)


def test_screen_gradient_via_center_offset():
    """The densification statistic: d loss / d screen-center is exposed by
    differentiating w.r.t. center_offset."""
    st = _state([[0.0, 0.0, 2.0]], [[0.05, 0.05, 0.05]], [0.8], [[1, 0, 0]])
    cam = _front_cam(w=24, h=24, f=60.0)

    def loss_fn(off):
        out = rz.render(st, cam, chunk=8, group=1, center_offset=off)
        return jnp.mean(out.rgb[:, :12])  # asymmetric loss -> nonzero grad

    g = jax.grad(loss_fn)(jnp.zeros((1, 2)))
    assert abs(float(g[0, 0])) > 1e-6  # moving in x changes left-half mass


def test_from_points_and_render_runs():
    rng = np.random.default_rng(2)
    xyz = np.concatenate([rng.normal(0, 0.4, (100, 2)),
                          rng.uniform(1.5, 3.5, (100, 1))], axis=1)
    st = from_points(jnp.asarray(xyz, jnp.float32),
                     jnp.asarray(rng.uniform(size=(100, 3)), jnp.float32),
                     capacity=128)
    out = rz.render(st, _front_cam(w=32, h=32), chunk=32, group=2,
                    bg=jnp.asarray([1.0, 1.0, 1.0]))
    assert np.asarray(out.alpha).max() > 0.05
    assert np.isfinite(np.asarray(out.rgb)).all()


def test_inactive_gaussians_ignored():
    st = _state([[0, 0, 2.0]], [[0.05] * 3], [0.9], [[1, 0, 0]], cap=8)
    # plant garbage in padding slots; active mask must hide it
    st = st.replace(means=st.means.at[5].set(jnp.asarray([0.0, 0.0, 1.0])))
    out = rz.render(st, _front_cam(), chunk=8, group=1)
    center = np.asarray(out.rgb[32, 32])
    np.testing.assert_allclose(center[0], 0.9, atol=5e-3)
