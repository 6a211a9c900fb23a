"""Guided Euler-discrete scheduler for SVD, as pure jit-able functions.

Re-implements THE custom file of the reference — its modified
``scheduling_euler_discrete.py`` (reference
``thirdparty/diffusers/src/diffusers/schedulers/scheduling_euler_discrete.py``,
the only file changed vs upstream diffusers; see SURVEY.md §2.8):

  - ``svd_schedule``: Karras sigma schedule (rho=7, [0.002, 700]) with
    continuous timesteps t = 0.25 log(sigma) — the SVD-XT configuration.
  - ``step_interp``: plain v-prediction Euler step + the *top-k latent
    masking* machinery (reference :633-814): per frame tau, keep the
    clamp(lambda_t, 0.4, 1) fraction of "certain" latent pixels whose
    |pred_x0 - cond| is smallest; the masked MSE over those pixels is the
    guidance loss whose gradient w.r.t. the sample steers denoising.
  - ``step_interp_prob_uncertain`` (reference :1343-1515): soft latent
    replacement — pred_x0[tau] blended toward the warped cond latents with
    weight w = f(1/(1-certainty+eps)), f(x)=x/(1+x), zeroed below 0.51,
    restricted to the top-k mask; endpoint frames hard-replaced.
  - ``undo_step`` re-noising and ``add_noise``.

Idiomatic change vs the reference: gradient guidance is NOT a
``loss.backward()`` inside the scheduler — ``guidance_loss`` is a pure
function; the sampler composes it with the UNet under ``jax.grad`` (the
reference's gradient does flow through the UNet: SURVEY.md §7 hard-part 3).

All functions are shape-static and differentiable; frame count and latent
resolution are free parameters (the reference hard-codes 25 x 72 x 128).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EulerSchedule:
    sigmas: jnp.ndarray      # (N+1,) descending, last = 0
    timesteps: jnp.ndarray   # (N,) continuous: 0.25 * log(sigma)

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    @property
    def init_noise_sigma(self) -> jnp.ndarray:
        # timestep_spacing 'leading' branch: sqrt(sigma_max^2 + 1)
        return jnp.sqrt(self.sigmas[0] ** 2 + 1.0)


def karras_sigmas(num_steps: int, sigma_min: float = 0.002,
                  sigma_max: float = 700.0, rho: float = 7.0) -> jnp.ndarray:
    ramp = jnp.linspace(0.0, 1.0, num_steps)
    min_inv = sigma_min ** (1.0 / rho)
    max_inv = sigma_max ** (1.0 / rho)
    return (max_inv + ramp * (min_inv - max_inv)) ** rho


def svd_schedule(num_steps: int, sigma_min: float = 0.002,
                 sigma_max: float = 700.0) -> EulerSchedule:
    sig = karras_sigmas(num_steps, sigma_min, sigma_max)
    return EulerSchedule(
        sigmas=jnp.concatenate([sig, jnp.zeros((1,))]).astype(jnp.float32),
        timesteps=(0.25 * jnp.log(sig)).astype(jnp.float32))


def scale_model_input(schedule: EulerSchedule, sample: jnp.ndarray,
                      step_i) -> jnp.ndarray:
    sigma = schedule.sigmas[step_i]
    return sample / jnp.sqrt(sigma ** 2 + 1.0)


def pred_original_sample(model_output: jnp.ndarray, sample: jnp.ndarray,
                         sigma: jnp.ndarray,
                         prediction_type: str = "v_prediction") -> jnp.ndarray:
    if prediction_type == "v_prediction":
        return (model_output * (-sigma / jnp.sqrt(sigma ** 2 + 1.0))
                + sample / (sigma ** 2 + 1.0))
    if prediction_type == "epsilon":
        return sample - sigma * model_output
    raise ValueError(prediction_type)


def euler_step(schedule: EulerSchedule, sample: jnp.ndarray,
               pred_x0: jnp.ndarray, step_i) -> jnp.ndarray:
    sigma = schedule.sigmas[step_i]
    derivative = (sample - pred_x0) / sigma
    dt = schedule.sigmas[step_i + 1] - sigma
    return sample + derivative * dt


# ---------------------------------------------------------------------------
# Top-k latent masking (the reference's per-frame quantile machinery)
# ---------------------------------------------------------------------------

def _frame_top_mask(pred_f: jnp.ndarray, cond_f: jnp.ndarray,
                    certain: jnp.ndarray, weight: jnp.ndarray,
                    clamp_lo: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One frame. pred_f/cond_f: (C, H, W); certain: (1, H, W) bool.

    Returns (top_mask (C, H, W) bool, cutoff scalar). Mirrors reference
    :745-779: sort |masked diff| over ALL C*H*W entries (masked-out entries
    contribute exact zeros, counted via num_zero), cutoff at
    int(clamp(weight) * (len - num_zero)) + num_zero.
    """
    mask_t = certain                                       # (1, H, W) bool
    # NB: the reference counts masked-out zeros over (h, w) only — NOT
    # times C, although the sorted flat array holds C*|~mask| exact zeros
    # (scheduling_euler_discrete.py:758,772). Replicated faithfully: the
    # cutoff index is intentionally the reference's, quirk included.
    num_zero = jnp.sum(~mask_t)
    masked_diff = (pred_f - cond_f) * mask_t
    flat = jnp.abs(masked_diff.ravel())
    sorted_diff = jnp.sort(flat)
    w = jnp.clip(weight, clamp_lo, 1.0)
    n = flat.shape[0]
    cutoff_e = (w * (n - num_zero)).astype(jnp.int32) + num_zero
    cutoff = sorted_diff[jnp.clip(cutoff_e - 1, 0, n - 1)]
    top = (jnp.abs(masked_diff) <= cutoff) & mask_t
    return top, cutoff


def top_k_masks(pred_x0: jnp.ndarray, cond_latents: jnp.ndarray,
                mask: jnp.ndarray, lambda_row: jnp.ndarray,
                clamp_lo: float = 0.4) -> jnp.ndarray:
    """Per-frame top-k agreement masks (frames 1..T-2; endpoints all-ones).

    pred_x0/cond_latents: (T, C, H, W); mask: (T-2, H, W) float uncertainty
    in [0,1] for the interior frames; lambda_row: (T,) the lambda_t schedule
    row for this step. Returns bool (T, C, H, W).
    """
    t, c, h, w = pred_x0.shape
    certain = ((1.0 - mask) > 0.5)[:, None]                # (T-2, 1, H, W)
    tops, _ = jax.vmap(_frame_top_mask, in_axes=(0, 0, 0, 0, None))(
        pred_x0[1:-1], cond_latents[1:-1], certain, lambda_row[1:-1],
        clamp_lo)
    ones = jnp.ones((1, c, h, w), bool)
    return jnp.concatenate([ones, tops, ones], axis=0)


def guidance_loss(pred_x0: jnp.ndarray, cond_latents: jnp.ndarray,
                  top_masks: jnp.ndarray) -> jnp.ndarray:
    """Masked MSE over the top-k agreement region (reference :782-786).
    ``top_masks`` must be stop-gradiented by the caller (boolean anyway)."""
    sq = (pred_x0 - cond_latents) ** 2
    m = top_masks.astype(sq.dtype)
    return (sq * m).sum() / m.sum()


def normalize_guidance_grad(grad: jnp.ndarray, sigma: jnp.ndarray,
                            lr: float = 0.02) -> jnp.ndarray:
    """grad / std(grad) * sigma^0.5 * lr (reference :788-795)."""
    return grad / (jnp.std(grad) + 1e-12) * jnp.sqrt(sigma) * lr


def step_interp(schedule: EulerSchedule, model_output: jnp.ndarray,
                sample: jnp.ndarray, step_i,
                prediction_type: str = "v_prediction"):
    """The no-grad branch of the reference's ``step_interp``: a plain
    v-prediction Euler step (the top-k masks are only consumed by the
    gradient branch). Returns (prev_sample, pred_x0)."""
    sigma = schedule.sigmas[step_i]
    x0 = pred_original_sample(model_output, sample, sigma, prediction_type)
    return euler_step(schedule, sample, x0, step_i), x0


def step_interp_prob_uncertain(schedule: EulerSchedule,
                               model_output: jnp.ndarray,
                               sample: jnp.ndarray, step_i,
                               cond_latents: jnp.ndarray,
                               mask: jnp.ndarray,
                               lambda_ts: jnp.ndarray,
                               clamp_lo: float = 0.4,
                               prediction_type: str = "v_prediction"):
    """Soft latent replacement step (reference :1343-1515).

    sample/model_output: (T, C, H, W); cond_latents: (T, C, H, W) warped
    conditioning latents; mask: (T-2, H, W) uncertainty in [0,1];
    lambda_ts: (num_steps, T). Returns (prev_sample, pred_x0_blended).
    """
    t, c, h, w = sample.shape
    sigma = schedule.sigmas[step_i]
    x0 = pred_original_sample(model_output, sample, sigma, prediction_type)
    lambda_row = lambda_ts[step_i]

    certain_bool = ((1.0 - mask) > 0.5)                    # (T-2, H, W)
    certain_f = certain_bool.astype(jnp.float32)[:, None]  # channel-mean, c=1

    def blend_frame(x0_f, cond_f, cert_b, cert_f, weight):
        top, cutoff = _frame_top_mask(x0_f, cond_f, cert_b[None], weight,
                                      clamp_lo)
        # w = f(1/(1-certainty+eps)), f(x)=x/(1+x); zeroed under 0.51;
        # gated by the top-k cutoff (reference :1490-1496)
        inv = 1.0 / (1.0 - cert_f + 1e-6)
        wgt = inv / (1.0 + inv)
        wgt = jnp.where(wgt >= 0.51, wgt, 0.0)
        masked_diff = (x0_f - cond_f) * cert_b[None]
        wgt = (jnp.abs(masked_diff) <= cutoff).astype(jnp.float32) * wgt
        return (1.0 - wgt) * x0_f + wgt * cond_f

    interior = jax.vmap(blend_frame)(x0[1:-1], cond_latents[1:-1],
                                     certain_bool, certain_f,
                                     lambda_row[1:-1])
    x0 = jnp.concatenate([cond_latents[:1], interior, cond_latents[-1:]],
                         axis=0)  # endpoints hard-replaced (:1498-1502)
    return euler_step(schedule, sample, x0, step_i), x0


def undo_step(schedule: EulerSchedule, sample: jnp.ndarray, step_i,
              key: jax.Array, ratio: float = 0.49) -> jnp.ndarray:
    """Partial re-noising (reference :1519-1522)."""
    noise = jax.random.normal(key, sample.shape, sample.dtype)
    s0 = schedule.sigmas[step_i]
    s1 = schedule.sigmas[step_i + 1]
    return sample + noise * jnp.sqrt(s0 ** 2 - s1 ** 2) * ratio


def add_noise(schedule: EulerSchedule, sample: jnp.ndarray,
              noise: jnp.ndarray, step_i) -> jnp.ndarray:
    return sample + noise * schedule.sigmas[step_i]
