"""Golden parity of the JAX guided Euler scheduler against the reference's
modified diffusers scheduler (used as a black-box oracle; reference code is
never imported into the package)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from syn3r_tpu.diffusion import scheduler as S


def _oracle():
    import sys
    import huggingface_hub
    if not hasattr(huggingface_hub, "cached_download"):
        huggingface_hub.cached_download = huggingface_hub.hf_hub_download
    if "/root/reference/thirdparty/diffusers/src" not in sys.path:
        sys.path.insert(0, "/root/reference/thirdparty/diffusers/src")
    from diffusers.schedulers.scheduling_euler_discrete import (
        EulerDiscreteScheduler)
    sch = EulerDiscreteScheduler(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="scaled_linear", prediction_type="v_prediction",
        timestep_type="continuous", use_karras_sigmas=True, sigma_min=0.002,
        sigma_max=700.0, interpolation_type="linear",
        timestep_spacing="leading", steps_offset=1)
    return sch


try:
    _oracle()
    HAVE_ORACLE = True
except Exception:
    HAVE_ORACLE = False

needs_oracle = pytest.mark.skipif(not HAVE_ORACLE,
                                  reason="reference diffusers unavailable")

T, C, H, W = 25, 4, 8, 16
NSTEPS = 10


def _data(seed=0):
    rng = np.random.default_rng(seed)
    sample = rng.normal(size=(T, C, H, W)).astype(np.float32) * 3
    model_output = rng.normal(size=(T, C, H, W)).astype(np.float32)
    cond = rng.normal(size=(T, C, H, W)).astype(np.float32)
    mask = rng.uniform(size=(T - 2, H, W)).astype(np.float32)
    lambda_ts = rng.uniform(0.0, 1.0, size=(NSTEPS, T)).astype(np.float32)
    lambda_ts = (lambda_ts > 0.4).astype(np.float32)  # reference uses {0,1}
    return sample, model_output, cond, mask, lambda_ts


@needs_oracle
def test_schedule_matches_reference():
    import torch
    sch = _oracle()
    sch.set_timesteps(NSTEPS)
    ours = S.svd_schedule(NSTEPS)
    np.testing.assert_allclose(np.asarray(ours.sigmas),
                               sch.sigmas.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.timesteps),
                               sch.timesteps.numpy(), rtol=1e-4)  # f32 log
    np.testing.assert_allclose(float(ours.init_noise_sigma),
                               float(sch.init_noise_sigma), rtol=1e-5)


@needs_oracle
@pytest.mark.parametrize("step_i", [0, 4, 8])
def test_step_interp_parity(step_i):
    import torch
    sch = _oracle()
    sch.set_timesteps(NSTEPS)
    sample, model_output, cond, mask, lambda_ts = _data()
    sch.is_scale_input_called = True
    out = sch.step_interp(
        torch.from_numpy(model_output)[None],
        sch.timesteps[step_i], torch.from_numpy(sample)[None],
        temp_cond_latents=torch.from_numpy(np.stack([cond, cond])),
        mask=torch.from_numpy(mask)[None, :, None],
        lambda_ts=torch.from_numpy(lambda_ts),
        step_i=step_i, lr=0.02, compute_grad=False)

    ours = S.svd_schedule(NSTEPS)
    prev, x0 = S.step_interp(ours, jnp.asarray(model_output),
                             jnp.asarray(sample), step_i)
    np.testing.assert_allclose(np.asarray(prev), out.prev_sample[0].numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(x0),
                               out.pred_original_sample[0].numpy(),
                               rtol=2e-4, atol=2e-5)


@needs_oracle
@pytest.mark.parametrize("step_i", [0, 5, 9])
def test_step_interp_prob_uncertain_parity(step_i):
    import torch
    sch = _oracle()
    sch.set_timesteps(NSTEPS)
    sample, model_output, cond, mask, lambda_ts = _data(1)
    sch.is_scale_input_called = True
    out = sch.step_interp_prob_uncertain(
        torch.from_numpy(model_output)[None],
        sch.timesteps[step_i], torch.from_numpy(sample)[None],
        temp_cond_latents=torch.from_numpy(np.stack([cond, cond])),
        mask=torch.from_numpy(mask)[None, :, None],
        lambda_ts=torch.from_numpy(lambda_ts),
        step_i=step_i, weight_clamp=0.4)

    ours = S.svd_schedule(NSTEPS)
    prev, x0 = S.step_interp_prob_uncertain(
        ours, jnp.asarray(model_output), jnp.asarray(sample), step_i,
        jnp.asarray(cond), jnp.asarray(mask), jnp.asarray(lambda_ts))
    np.testing.assert_allclose(np.asarray(x0),
                               out.pred_original_sample[0].numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(prev), out.prev_sample[0].numpy(),
                               rtol=2e-4, atol=2e-5)


@needs_oracle
def test_guidance_grad_parity():
    """d(masked top-k MSE)/d(sample) with the UNet output held constant —
    matches the torch backward through pred_x0's sample-dependence."""
    import torch
    step_i = 3
    sch = _oracle()
    sch.set_timesteps(NSTEPS)
    sample, model_output, cond, mask, lambda_ts = _data(2)
    sch.is_scale_input_called = True
    t_sample = torch.from_numpy(sample)[None].requires_grad_(True)
    out = sch.step_interp(
        torch.from_numpy(model_output)[None],
        sch.timesteps[step_i], t_sample,
        temp_cond_latents=torch.from_numpy(np.stack([cond, cond])),
        mask=torch.from_numpy(mask)[None, :, None],
        lambda_ts=torch.from_numpy(lambda_ts),
        step_i=step_i, lr=0.02, compute_grad=True)
    ref_grad = out.grad[0].numpy()

    ours = S.svd_schedule(NSTEPS)
    sigma = ours.sigmas[step_i]

    def loss_fn(s):
        x0 = S.pred_original_sample(jnp.asarray(model_output), s, sigma)
        tm = jax.lax.stop_gradient(
            S.top_k_masks(x0, jnp.asarray(cond), jnp.asarray(mask),
                          jnp.asarray(lambda_ts)[step_i]))
        return S.guidance_loss(x0, jnp.asarray(cond), tm)

    g = jax.grad(loss_fn)(jnp.asarray(sample))
    g = S.normalize_guidance_grad(g, sigma, lr=0.02)
    np.testing.assert_allclose(np.asarray(g), ref_grad, rtol=2e-3, atol=2e-5)


@needs_oracle
@pytest.mark.parametrize("step_i", [0, 6])
def test_guidance_grad_tiled_parity(step_i):
    """The production closed-form 4-tile gradient vs the reference's tile
    assembly: per tile, oracle step_interp(compute_grad=True) on the crop
    (detached-UNet semantics: sample requires grad, model_output constant),
    then the reference's exact torch.cat stitch
    (SVD_2pass_prob_uncertain_post.py:776-778)."""
    import torch
    from syn3r_tpu.diffusion.scheduler import guidance_tile_bounds
    sch = _oracle()
    sch.set_timesteps(NSTEPS)
    sample, model_output, cond, mask, lambda_ts = _data(3)
    (h0e, h1s, dh), (w0e, w1s, dw) = guidance_tile_bounds(H, W, "scaled")
    tiles = [(0, h0e, 0, w0e), (h1s, H, 0, w0e),
             (0, h0e, w1s, W), (h1s, H, w1s, W)]
    grads = []
    for (hs, he, ws, we) in tiles:
        sch.is_scale_input_called = True
        s_t = torch.from_numpy(
            sample[:, :, hs:he, ws:we])[None].requires_grad_(True)
        out = sch.step_interp(
            torch.from_numpy(model_output[:, :, hs:he, ws:we])[None],
            sch.timesteps[step_i], s_t,
            temp_cond_latents=torch.from_numpy(
                np.stack([cond, cond]))[:, :, :, hs:he, ws:we],
            mask=torch.from_numpy(mask)[None, :, None, hs:he, ws:we],
            lambda_ts=torch.from_numpy(lambda_ts),
            step_i=step_i, lr=0.02, compute_grad=True)
        grads.append(out.grad)
    grads1 = torch.cat((grads[0], grads[1][:, :, :, dh:, :]), -2)
    grads2 = torch.cat((grads[2], grads[3][:, :, :, dh:, :]), -2)
    ref = torch.cat((grads1, grads2[:, :, :, :, dw:]), -1)[0].numpy()

    ours = S.svd_schedule(NSTEPS)
    sigma = ours.sigmas[step_i]
    x0 = S.pred_original_sample(jnp.asarray(model_output),
                                jnp.asarray(sample), sigma)
    g = S.guidance_grad_tiled(x0, jnp.asarray(cond), jnp.asarray(mask),
                              jnp.asarray(lambda_ts)[step_i], sigma, lr=0.02,
                              tile_mode="scaled")
    np.testing.assert_allclose(np.asarray(g), ref, rtol=2e-3, atol=2e-6)


@needs_oracle
def test_guidance_grad_reference_tile_collapse():
    """At a 40x72 latent grid the reference's hard-coded absolute tile
    slices collapse to an effective single full-frame tile (the second
    tiles' post-skip-16 contributions are empty) — tile_mode='reference'
    must reproduce exactly that, validated against the oracle's
    compute_grad on the full frame."""
    import torch
    h, w = 40, 72
    rng = np.random.default_rng(5)
    sample = rng.normal(size=(T, C, h, w)).astype(np.float32) * 3
    model_output = rng.normal(size=(T, C, h, w)).astype(np.float32)
    cond = rng.normal(size=(T, C, h, w)).astype(np.float32)
    mask = rng.uniform(size=(T - 2, h, w)).astype(np.float32)
    lambda_ts = (rng.uniform(size=(NSTEPS, T)) > 0.4).astype(np.float32)
    step_i = 4
    sch = _oracle()
    sch.set_timesteps(NSTEPS)
    sch.is_scale_input_called = True
    s_t = torch.from_numpy(sample)[None].requires_grad_(True)
    out = sch.step_interp(
        torch.from_numpy(model_output)[None], sch.timesteps[step_i], s_t,
        temp_cond_latents=torch.from_numpy(np.stack([cond, cond])),
        mask=torch.from_numpy(mask)[None, :, None],
        lambda_ts=torch.from_numpy(lambda_ts),
        step_i=step_i, lr=0.02, compute_grad=True)
    ref = out.grad[0].numpy()

    ours = S.svd_schedule(NSTEPS)
    sigma = ours.sigmas[step_i]
    x0 = S.pred_original_sample(jnp.asarray(model_output),
                                jnp.asarray(sample), sigma)
    g = S.guidance_grad_tiled(x0, jnp.asarray(cond), jnp.asarray(mask),
                              jnp.asarray(lambda_ts)[step_i], sigma,
                              lr=0.02, tile_mode="reference")
    np.testing.assert_allclose(np.asarray(g), ref, rtol=2e-3, atol=2e-6)


def test_guidance_grad_closed_form_equals_autodiff():
    """guidance_grad (closed form) == jax.grad of guidance_loss w.r.t. the
    sample with the UNet output held constant — the production path and the
    oracle-tested autodiff formulation are the same function."""
    sample, model_output, cond, mask, lambda_ts = _data(4)
    ours = S.svd_schedule(NSTEPS)
    step_i = 2
    sigma = ours.sigmas[step_i]
    x0 = S.pred_original_sample(jnp.asarray(model_output),
                                jnp.asarray(sample), sigma)
    tm = S.top_k_masks(x0, jnp.asarray(cond), jnp.asarray(mask),
                       jnp.asarray(lambda_ts)[step_i])
    g_closed = S.guidance_grad(x0, jnp.asarray(cond), tm, sigma, lr=0.02)

    def loss_fn(s):
        x0s = S.pred_original_sample(jnp.asarray(model_output), s, sigma)
        return S.guidance_loss(x0s, jnp.asarray(cond),
                               jax.lax.stop_gradient(tm))

    g_auto = jax.grad(loss_fn)(jnp.asarray(sample))
    g_auto = S.normalize_guidance_grad(g_auto, sigma, lr=0.02)
    np.testing.assert_allclose(np.asarray(g_closed), np.asarray(g_auto),
                               rtol=1e-5, atol=1e-8)


def test_undo_and_add_noise_shapes():
    ours = S.svd_schedule(NSTEPS)
    x = jnp.ones((T, C, H, W))
    y = S.undo_step(ours, x, 2, jax.random.PRNGKey(0))
    assert y.shape == x.shape
    z = S.add_noise(ours, x, jnp.ones_like(x), 0)
    np.testing.assert_allclose(np.asarray(z[0, 0, 0, 0]), 1.0 + 700.0,
                               rtol=1e-5)


def test_scale_model_input():
    ours = S.svd_schedule(NSTEPS)
    x = jnp.ones((4,))
    s = S.scale_model_input(ours, x, 0)
    np.testing.assert_allclose(np.asarray(s),
                               1.0 / np.sqrt(700.0 ** 2 + 1), rtol=1e-5)
