"""Public-architecture GMFlow: full-config converter tree-match + unit
tests of the swin/upsampling machinery (the gmflow submodule is empty in
the reference checkout, so the public layout is reconstructed and pinned
structurally; see vision/gmflow_public.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from syn3r_tpu.models.convert import assert_tree_match
from syn3r_tpu.vision import gmflow_public as GP


def _public_state_dict(rng, d=128, layers=6):
    sd = {}

    def t(name, *shape):
        sd[name] = rng.normal(0, 0.05, shape).astype(np.float32)

    t("backbone.conv1.weight", 64, 3, 7, 7)
    dims = {1: (64, 64), 2: (64, 96), 3: (96, 128)}
    for stage, (cin, cout) in dims.items():
        for blk in (0, 1):
            pre = f"backbone.layer{stage}.{blk}"
            ci = cin if blk == 0 else cout
            t(pre + ".conv1.weight", cout, ci, 3, 3)
            t(pre + ".conv2.weight", cout, cout, 3, 3)
            if blk == 0 and (stage != 1):
                t(pre + ".downsample.0.weight", cout, ci, 1, 1)
    t("backbone.conv2.weight", d, 128, 1, 1)
    t("backbone.conv2.bias", d)
    for i in range(layers):
        for sub, ffn in (("self_attn", False), ("cross_attn_ffn", True)):
            pre = f"transformer.layers.{i}.{sub}"
            for p in ("q_proj", "k_proj", "v_proj", "merge"):
                t(pre + f".{p}.weight", d, d)
                t(pre + f".{p}.bias", d)
            t(pre + ".norm1.weight", d)
            t(pre + ".norm1.bias", d)
            if ffn:
                t(pre + ".norm2.weight", d)
                t(pre + ".norm2.bias", d)
                t(pre + ".mlp.0.weight", 2 * d * 4, 2 * d)
                t(pre + ".mlp.2.weight", d, 2 * d * 4)
    t("feature_flow_attn.q_proj.weight", d, d)
    t("feature_flow_attn.q_proj.bias", d)
    t("feature_flow_attn.k_proj.weight", d, d)
    t("feature_flow_attn.k_proj.bias", d)
    t("upsampler.0.weight", 256, 2 + d, 3, 3)
    t("upsampler.0.bias", 256)
    t("upsampler.2.weight", 9 * 64, 256, 1, 1)
    t("upsampler.2.bias", 9 * 64)
    return sd


@pytest.mark.slow
def test_convert_full_config_tree_match_and_forward():
    """Converted public-layout weights match GMFlowPublic's own init tree
    at the real config (d=128, 6 layers), and the converted model runs."""
    rng = np.random.default_rng(0)
    sd = _public_state_dict(rng)
    params = GP.convert_gmflow_torch(sd)

    model = GP.GMFlowPublic()
    a = jnp.asarray(rng.uniform(size=(1, 64, 96, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(1, 64, 96, 3)).astype(np.float32))
    init = model.init(jax.random.PRNGKey(0), a, b)
    assert_tree_match(params, init["params"])

    fwd, bwd = model.apply({"params": params}, a, b, bidir=True)
    assert fwd.shape == (1, 64, 96, 2) and bwd.shape == (1, 64, 96, 2)
    assert np.isfinite(np.asarray(fwd)).all()
    # bidir backward flow equals running the model with swapped inputs
    bwd2 = model.apply({"params": params}, b, a)
    np.testing.assert_allclose(np.asarray(bwd), np.asarray(bwd2),
                               rtol=1e-4, atol=1e-4)


def test_split_merge_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    y = GP.merge_splits(GP.split_feature(x, 2), 2)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # window ordering: first window is the top-left block
    s = GP.split_feature(x, 2)
    np.testing.assert_array_equal(np.asarray(s[0]), np.asarray(x[0, :4, :6]))


def test_swin_attention_unshifted_equals_dense_within_window():
    """With K splits and no shift, each window attends only to itself —
    equivalent to dense attention run per window."""
    rng = np.random.default_rng(2)
    h, w, c = 4, 8, 16
    q = jnp.asarray(rng.normal(size=(1, h * w, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, h * w, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, h * w, c)).astype(np.float32))
    out = GP.swin_attention(q, k, v, 2, False, h, w)

    qs = GP.split_feature(q.reshape(1, h, w, c), 2).reshape(4, -1, c)
    ks = GP.split_feature(k.reshape(1, h, w, c), 2).reshape(4, -1, c)
    vs = GP.split_feature(v.reshape(1, h, w, c), 2).reshape(4, -1, c)
    att = jax.nn.softmax(
        jnp.einsum("bnc,bmc->bnm", qs, ks) / (c ** 0.5), -1)
    ref = GP.merge_splits((att @ vs).reshape(4, h // 2, w // 2, c), 2)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref.reshape(1, h * w, c)),
                               rtol=1e-5, atol=1e-6)


def test_shift_window_mask_blocks_cross_region():
    m = np.asarray(GP.shift_window_attn_mask(8, 8, 2))
    assert m.shape == (4, 16, 16)
    # top-left window is un-shifted content only -> fully visible
    np.testing.assert_array_equal(m[0], 0.0)
    # bottom-right window mixes 4 rolled regions -> some pairs blocked
    assert (m[3] == -100.0).any()


def test_convex_upsample_constant_flow():
    """A spatially constant flow field upsamples to the same constant
    (scaled by the factor) regardless of the mask logits."""
    rng = np.random.default_rng(3)
    flow = jnp.ones((1, 3, 4, 2)) * jnp.asarray([1.5, -0.5])
    logits = jnp.asarray(rng.normal(size=(1, 3, 4, 9 * 16)).astype(np.float32))
    up = GP.convex_upsample(flow, logits, factor=4)
    assert up.shape == (1, 12, 16, 2)
    inner = np.asarray(up)[:, 4:-4, 4:-4]
    np.testing.assert_allclose(inner,
                               np.broadcast_to([6.0, -2.0], inner.shape),
                               rtol=1e-5, atol=1e-5)


def test_global_correlation_identical_features_zero_flow():
    """When f0 == f1 and features are strongly distinctive, the argmax
    match is the same pixel -> near-zero flow."""
    rng = np.random.default_rng(4)
    f = jnp.asarray(rng.normal(size=(1, 6, 8, 64)).astype(np.float32)) * 10
    flow = GP.global_correlation_softmax(f, f)
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-3)


def test_correspondence_gate_with_public_arch_interface():
    """make_flow_fn plugs into the consistency gate."""
    from syn3r_tpu.vision.gmflow import correspondence_mask

    model = GP.GMFlowPublic(feature_channels=64, num_transformer_layers=1)
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.uniform(size=(32, 48, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), a[None], a[None])
    fn = GP.make_flow_fn(model, params)
    mask, flows, mean = correspondence_mask(fn, a, a)
    assert mask.shape == (32, 48)
    assert 0.0 <= float(mean) <= 1.0
