import numpy as np
import jax.numpy as jnp

from syn3r_tpu.models.gaussians import from_points
from syn3r_tpu.utils import ply
from syn3r_tpu.utils.profiling import PhaseTimer


def test_ply_points_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    rgb = rng.uniform(size=(50, 3)).astype(np.float32)
    path = str(tmp_path / "pc.ply")
    ply.write_ply_points(path, xyz, rgb)
    x2, r2 = ply.read_ply_points(path)
    np.testing.assert_allclose(x2, xyz, rtol=1e-6)
    np.testing.assert_allclose(r2, rgb, atol=1 / 255.0)


def test_gaussians_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    st = from_points(jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32)),
                     jnp.asarray(rng.uniform(size=(20, 3)).astype(np.float32)),
                     capacity=32)
    st = st.replace(sh_rest=st.sh_rest
                    + 0.1 * jnp.asarray(rng.normal(size=st.sh_rest.shape),
                                        jnp.float32))
    path = str(tmp_path / "point_cloud.ply")
    ply.save_gaussians_ply(path, st)
    st2 = ply.load_gaussians_ply(path, capacity=32)
    act = np.asarray(st.active)
    for field in ("means", "quats", "log_scales", "opacity_logits",
                  "sh_dc", "sh_rest"):
        np.testing.assert_allclose(np.asarray(getattr(st2, field))[act],
                                   np.asarray(getattr(st, field))[act],
                                   rtol=1e-5, err_msg=field)
    assert int(st2.num_active) == 20


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        sum(range(1000))
    with t.phase("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] >= 0
    assert "a" in t.report()
