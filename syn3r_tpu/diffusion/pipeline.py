"""Guided SVD video-completion pipelines (the reference's L3a layer).

Re-implements ``model/SVD_2pass_prob_uncertain_post.py:418-859`` (the
LLFF/DL3DV default) and ``model/SVD_2pass_prob_uncertain.py`` (DTU) as one
jitted sampler:

  inputs: start frame, 23 warped cond frames + end frame, latent-res
  uncertainty masks, lambda_t schedule (SURVEY.md §2.3).

  per denoise step, per direction (forward / time-flipped backward):
    [post variant] DETACHED gradient guidance — the reference detaches the
    UNet input before its grad pass (:732-733), so the gradient reaches
    the sample only through pred_x0's sample/(sigma^2+1) term. One uncond
    UNet forward gives pred_x0; the grad is then CLOSED-FORM
    (scheduler.guidance_grad_tiled: per-tile top-k masks + per-tile
    std normalization + hard stitch, :726-779); latents <- latents - grad;
    then a CFG (2x batch) UNet pass and a plain Euler update
    (scheduler.step_interp).
    [prob variant] CFG UNet pass + soft latent replacement
    (scheduler.step_interp_prob_uncertain).
  directions merged w*fwd + (1-w)*flip(bwd), w = linspace(1, 0, F).

TPU-first deviations (documented, quality-neutral or better):
  - the reference runs a SEPARATE UNet forward per guidance tile crop (a
    VRAM workaround); here ONE full-frame uncond forward is sliced into
    the 4 tiles — per-tile pred_x0 differs only by the reference's
    conv-padding/attention boundary artifacts. All scheduler math (per-tile
    sort, std, stitch) is replicated exactly.
  - the two directions can run as a vmapped axis of 2 (multichip: one
    direction per device via ``direction_sharding``): numerics per
    direction are IDENTICAL to two sequential calls (the batch-dependent
    temporal-context quirk sees batch 1 / CFG-2 per direction, as the
    reference does). A single chip runs them sequentially inside the same
    jit — the batched variant's 100-frame effective UNet batch exceeds
    v5e HBM at full resolution (measured 17.8 vs 15.75 GB).
  - the whole 100-step loop runs inside one jit (lax.fori_loop).

``guidance_through_unet=True`` restores round-2's grad-through-the-UNet
variant (a stronger but ~2-3x costlier guidance signal that diverges from
the reference) behind an explicit opt-in.

The reference's CLIP/VAE preprocessing (antialiased resize to 224,
noise-augmented VAE encode, factor_s=5.6 cond-latent scaling, per-frame
CFG scale linspace(1, 3)) is replicated in ``encode_conditioning``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.clip import clip_normalize
from ..utils.image import resize_antialiased
from . import scheduler as S

FACTOR_S = 5.6  # reference SVD_2pass_prob_uncertain_post.py:609


@dataclasses.dataclass
class SVDModels:
    """Bundle of the three frozen networks (flax modules + params)."""
    unet: object
    unet_params: dict
    vae: object
    vae_params: dict
    clip: object
    clip_params: dict


@dataclasses.dataclass
class GuidedSVDConfig:
    num_inference_steps: int = 100
    num_frames: int = 25
    min_guidance_scale: float = 1.0
    max_guidance_scale: float = 3.0
    fps: int = 7
    motion_bucket_id: int = 127
    noise_aug_strength: float = 0.02
    guidance_lr: float = 0.02
    # temporal-decode chunking. The reference decodes in chunks of 8
    # (diffusionGS.py:1100) and the temporal decoder MIXES frames within a
    # chunk (temporal-mix resnets + the final (3,1,1) conv), so the chunk
    # size changes the decoded pixels, not just memory — 8 is a fidelity
    # parameter, kept. Decode runs in the compute dtype (bf16 on TPU; the
    # reference decodes in fp16) so chunk-8 at 576x1024 fits v5e HBM.
    decode_chunk_size: int = 8
    variant: str = "post"            # "post" (LLFF/DL3DV) | "prob" (DTU)
    latent_num: int = 1              # multi-latent averaging hook (:636)
    # guidance tile bounds: "reference" = the reference's absolute 40/24/
    # 72/56 slices (production); "scaled" = proportional (tiny tests);
    # "auto" = reference when the latent grid is big enough, else scaled.
    guidance_tile_mode: str = "auto"
    # round-2 legacy: compute the guidance gradient THROUGH the UNet
    # (jax.grad of the masked MSE through a remat-wrapped forward) instead
    # of the reference's detached closed-form gradient. ~2-3x the cost and
    # different numerics from the reference — opt-in only.
    guidance_through_unet: bool = False
    # fuse the post variant's guidance (batch 1) + CFG (batch 2) UNet
    # passes into ONE batch-3 forward with batch_groups=(1, 2) — same math
    # to the separate calls (the grouped time-context quirk reproduces each
    # sub-call's batch semantics; see UNetSpatioTemporalConditionModel),
    # one dispatch and better MXU occupancy instead of two.
    fused_guidance_cfg: bool = True
    # post-variant speed knob (opt-in, documented DIVERGENCE): reuse the
    # CFG pass's uncond row as the guidance pass's eps instead of running
    # the dedicated batch-1 uncond forward — one batch-2 UNet forward per
    # step/direction instead of batch-3 (~1/3 of the step FLOPs saved).
    # The two rows differ ONLY through the time-context batch quirk: in
    # the batch-2 CFG group, half of each row's pixel rows attend to the
    # COND clip embedding in temporal cross-attention (see
    # TransformerSpatioTemporalModel), while the reference's guidance pass
    # (batch 1) sees the uncond context everywhere. The per-tile std
    # normalization inside guidance_grad_tiled washes out the scale
    # difference; quality must be validated per-dataset before flipping
    # this on (with zero CLIP embeddings the two variants are bit-equal —
    # pinned by tests/test_pipeline.py::test_guidance_reuse_cfg_uncond).
    guidance_reuse_cfg_uncond: bool = False
    # run the forward/backward direction passes as a vmapped axis of 2 —
    # identical numerics, batched matmuls. Defaults OFF on a single chip:
    # the combined CFG x direction UNet batch (100 effective frames at
    # 576x1024) needs ~17.8 GB of HBM vs the v5e's 15.75 (measured, round
    # 3), so one chip runs the directions sequentially inside the same jit
    # instead. With ``direction_sharding`` (a NamedSharding whose leading
    # axis spans >= 2 devices) each chip takes one direction (batch 2 per
    # device — fits) and the vmapped axis turns on automatically.
    direction_parallel: bool = False
    direction_sharding: object = None
    compute_dtype: jnp.dtype = jnp.bfloat16

    def __post_init__(self):
        if self.direction_sharding is not None:
            self.direction_parallel = True
        elif self.guidance_through_unet:
            self.direction_parallel = False


class GuidedSVDPipeline:
    """Functional pipeline; all heavy steps are jitted once per shape."""

    def __init__(self, models: SVDModels, config: GuidedSVDConfig):
        self.m = models
        self.cfg = config
        self.schedule = S.svd_schedule(config.num_inference_steps)

    # ------------------------------------------------------------------
    # conditioning encoders
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self",))
    def _clip_embed(self, clip_params, image01: jnp.ndarray) -> jnp.ndarray:
        """image01 (H, W, 3) in [0,1] -> CFG-stacked (2, 1, 1024):
        row 0 zeros (uncond), row 1 the embedding. Matches the reference's
        _encode_image: [-1,1] -> antialiased 224 resize -> [0,1] -> CLIP.

        Params are explicit jit arguments throughout this class — baking
        them into the jaxpr as closure constants (gigabytes at the real
        config) overwhelms the remote compile service."""
        x = image01 * 2.0 - 1.0
        x = resize_antialiased(x, 224, 224)
        x = (x + 1.0) / 2.0
        x = clip_normalize(x)[None]
        emb = self.m.clip.apply(clip_params,
                                x.astype(self.cfg.compute_dtype))
        emb = emb.astype(jnp.float32)[:, None, :]          # (1, 1, 1024)
        return jnp.concatenate([jnp.zeros_like(emb), emb], axis=0)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _vae_encode_mode(self, vae_params, image01: jnp.ndarray,
                         noise: jnp.ndarray) -> jnp.ndarray:
        """(H, W, 3) [0,1] + image-space noise -> latent mode (h, w, 4)."""
        x = image01 * 2.0 - 1.0 + self.cfg.noise_aug_strength * noise
        return self.m.vae.apply(vae_params, x[None],
                                method="encode_mode")[0]

    @functools.partial(jax.jit, static_argnames=("self",))
    def _vae_encode_mode_batch(self, vae_params, images01: jnp.ndarray,
                               noise: jnp.ndarray) -> jnp.ndarray:
        """(N, H, W, 3) [0,1] + ONE shared noise (H, W, 3) -> (N, h, w, 4).

        The spatial encoder is frame-independent (no temporal mixing on the
        encode side), so chunking is value-neutral — it only bounds
        activation HBM at full resolution. One jit instead of N dispatches
        (the reference encodes frame-by-frame, :596-599; f32 like its
        force_upcast path)."""
        x = images01 * 2.0 - 1.0 + self.cfg.noise_aug_strength * noise[None]
        outs = []
        for i in range(0, x.shape[0], 8):
            outs.append(self.m.vae.apply(vae_params, x[i:i + 8],
                                         method="encode_mode"))
        return jnp.concatenate(outs, axis=0)

    def encode_conditioning(self, image_start, cond_images, image_end,
                            key: Optional[jax.Array] = None,
                            noise: Optional[jnp.ndarray] = None):
        """Returns (clip_start (2,1,1024), clip_end, cond_latents
        (F, h, w, 4) scaled by 1/factor_s, start/end latents (h, w, 4)).

        cond_latents frame 0 is the start-image latent, frames 1..F-1 the 23
        warped conds + end frame (reference :596-601). All images share ONE
        noise-augmentation draw (reference draws a single ``noise``); pass
        ``noise`` explicitly to pin it (parity tests), else it is drawn
        from ``key``."""
        if noise is None:
            noise = jax.random.normal(key, image_start.shape, jnp.float32)
        clip_start = self._clip_embed(self.m.clip_params, image_start)
        clip_end = self._clip_embed(self.m.clip_params, image_end)
        stacked = jnp.stack([image_start, *cond_images, image_end], axis=0)
        lats = self._vae_encode_mode_batch(self.m.vae_params, stacked,
                                           noise)
        lat_start, lat_end = lats[0], lats[-1]
        cond = lats / FACTOR_S                               # (F, h, w, 4)
        return clip_start, clip_end, cond, lat_start, lat_end

    # ------------------------------------------------------------------
    # the denoising loop
    # ------------------------------------------------------------------

    def _added_time_ids(self, batch: int) -> jnp.ndarray:
        row = jnp.asarray([[self.cfg.fps - 1, self.cfg.motion_bucket_id,
                            self.cfg.noise_aug_strength]], jnp.float32)
        return jnp.tile(row, (batch, 1))

    def _unet(self, params, sample, t, ehs, tids, batch_groups=None):
        dt = self.cfg.compute_dtype
        out = self.m.unet.apply(params, sample.astype(dt), t,
                                ehs.astype(dt), tids,
                                batch_groups=batch_groups)
        return out.astype(jnp.float32)

    def _tile_mode(self, latents) -> str:
        """Resolve guidance_tile_mode='auto' from the latent grid size."""
        tmode = self.cfg.guidance_tile_mode
        if tmode == "auto":
            hl, wl = latents.shape[1:3]
            tmode = "reference" if hl >= 25 and wl >= 57 else "scaled"
        return tmode

    def _unet_remat(self, params, sample, t, ehs, tids):
        """Per-block-remat variant for the gradient-guidance vjp: bounds
        live activations to one UNet block so the full-resolution
        (25 x 72x128) guided step fits HBM."""
        dt = self.cfg.compute_dtype
        unet = self.m.unet.clone(remat_blocks=True)
        out = unet.apply(params, sample.astype(dt), t,
                         ehs.astype(dt), tids)
        return out.astype(jnp.float32)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _denoise_impl(self, unet_params, noise_latents, clip_start,
                      clip_end, cond_latents, mask, lambda_ts):
        """Run the full guided loop.

        noise_latents: (latent_num, F, h, w, 4) standard normals;
        cond_latents: (F, h, w, 4) (already /factor_s); mask: (F-2, h, w)
        uncertainty; lambda_ts: (num_steps, F). Returns latents (F,h,w,4).
        """
        cfg = self.cfg
        sch = self.schedule
        f = cfg.num_frames
        guidance = jnp.linspace(cfg.min_guidance_scale,
                                cfg.max_guidance_scale, f)[:, None, None, None]
        weight_fw = jnp.linspace(1.0, 0.0, f)[:, None, None, None]
        tids1 = self._added_time_ids(1)
        tids2 = self._added_time_ids(2)

        def unet_remat(*a):
            return self._unet_remat(unet_params, *a)

        def unet_plain(*a):
            return self._unet(unet_params, *a)

        lat_start_f = jnp.repeat(cond_latents[:1] * FACTOR_S, f, axis=0)
        lat_end_f = jnp.repeat(cond_latents[-1:] * FACTOR_S, f, axis=0)

        def direction_step(latents, step_i, clip_emb, cond, msk, lam,
                           img_lat):
            t = sch.timesteps[step_i]
            sigma = sch.sigmas[step_i]
            # NOTE (reference :726-800): the CFG UNet forward is evaluated
            # at the PRE-grad latents, but the Euler update steps from the
            # POST-grad latents (next_latents = latents - grad). Keep both.
            pre_grad_latents = latents

            if cfg.variant == "post" and cfg.guidance_through_unet:
                # -- round-2 legacy: grad THROUGH the UNet (opt-in) --------
                def gloss(lat):
                    scaled = S.scale_model_input(sch, lat, step_i)
                    # uncond slice: zero CLIP embedding, zero image latents
                    inp = jnp.concatenate(
                        [scaled, jnp.zeros_like(img_lat)], axis=-1)[None]
                    eps = unet_remat(inp, t, jnp.zeros_like(clip_emb[:1]),
                                     tids1)[0]
                    x0 = S.pred_original_sample(eps, lat, sigma)
                    tm = jax.lax.stop_gradient(
                        S.top_k_masks(x0.transpose(0, 3, 1, 2),
                                      cond.transpose(0, 3, 1, 2),
                                      msk, lam[step_i]))
                    return S.guidance_loss(x0.transpose(0, 3, 1, 2),
                                           cond.transpose(0, 3, 1, 2), tm)

                grad = jax.grad(gloss)(latents)
                grad = S.normalize_guidance_grad(grad, sigma,
                                                 lr=cfg.guidance_lr)
                latents = latents - grad
            elif cfg.variant == "post" and cfg.guidance_reuse_cfg_uncond:
                # -- opt-in speed knob (documented divergence, see config):
                # ONE batch-2 CFG forward at the pre-grad latents serves
                # BOTH the guidance x0 (its uncond row) and the CFG combo —
                # drops the dedicated batch-1 guidance forward entirely.
                # The uncond row differs from the reference's batch-1 pass
                # only through the time-context batch quirk; the per-tile
                # std normalization absorbs the scale shift.
                scaled = S.scale_model_input(sch, latents, step_i)
                inp2 = jnp.stack([
                    jnp.concatenate([scaled, jnp.zeros_like(img_lat)],
                                    axis=-1),
                    jnp.concatenate([scaled, img_lat], axis=-1)], axis=0)
                eps2 = unet_plain(inp2, t, clip_emb, tids2)
                x0 = S.pred_original_sample(eps2[0], latents, sigma)
                grad = S.guidance_grad_tiled(
                    x0.transpose(0, 3, 1, 2), cond.transpose(0, 3, 1, 2),
                    msk, lam[step_i], sigma, lr=cfg.guidance_lr,
                    tile_mode=self._tile_mode(latents))
                latents = latents - grad.transpose(0, 2, 3, 1)
                eps = eps2[0] + guidance * (eps2[1] - eps2[0])
                prev, _ = S.step_interp(sch, eps, latents, step_i)
                return prev
            elif cfg.variant == "post" and cfg.fused_guidance_cfg:
                # -- reference semantics, fused: the guidance pass (batch 1
                # uncond — SVD_2pass_prob_uncertain_post.py:758-769 tile
                # rows [0:1]) and the CFG pass (batch 2) evaluate the SAME
                # pre-grad latents, so run them as ONE batch-3 forward with
                # batch_groups=(1, 2): same math as the separate calls (the
                # grouped time-context quirk), one dispatch instead of two.
                scaled = S.scale_model_input(sch, latents, step_i)
                uncond_inp = jnp.concatenate(
                    [scaled, jnp.zeros_like(img_lat)], axis=-1)
                inp3 = jnp.stack([
                    uncond_inp,
                    uncond_inp,
                    jnp.concatenate([scaled, img_lat], axis=-1)], axis=0)
                ehs3 = jnp.concatenate(
                    [jnp.zeros_like(clip_emb[:1]), clip_emb], axis=0)
                eps3 = unet_plain(inp3, t, ehs3, self._added_time_ids(3),
                                  (1, 2))
                x0 = S.pred_original_sample(eps3[0], latents, sigma)
                grad = S.guidance_grad_tiled(
                    x0.transpose(0, 3, 1, 2), cond.transpose(0, 3, 1, 2),
                    msk, lam[step_i], sigma, lr=cfg.guidance_lr,
                    tile_mode=self._tile_mode(latents))
                latents = latents - grad.transpose(0, 2, 3, 1)
                eps = eps3[1] + guidance * (eps3[2] - eps3[1])
                prev, _ = S.step_interp(sch, eps, latents, step_i)
                return prev
            elif cfg.variant == "post":
                # -- reference semantics: detached closed-form guidance ----
                # one uncond forward (zero CLIP context, zero image
                # latents — SVD_2pass_prob_uncertain_post.py:758-769 tile
                # rows [0:1]); grad via the 4-tile closed form.
                scaled = S.scale_model_input(sch, latents, step_i)
                inp = jnp.concatenate(
                    [scaled, jnp.zeros_like(img_lat)], axis=-1)[None]
                eps = unet_plain(inp, t, jnp.zeros_like(clip_emb[:1]),
                                 tids1)[0]
                x0 = S.pred_original_sample(eps, latents, sigma)
                grad = S.guidance_grad_tiled(
                    x0.transpose(0, 3, 1, 2), cond.transpose(0, 3, 1, 2),
                    msk, lam[step_i], sigma, lr=cfg.guidance_lr,
                    tile_mode=self._tile_mode(latents))
                latents = latents - grad.transpose(0, 2, 3, 1)

            # -- CFG pass (at pre-grad latents) + Euler / soft-replacement
            scaled = S.scale_model_input(sch, pre_grad_latents, step_i)
            inp = jnp.stack([
                jnp.concatenate([scaled, jnp.zeros_like(img_lat)], axis=-1),
                jnp.concatenate([scaled, img_lat], axis=-1)], axis=0)
            eps = unet_plain(inp, t, clip_emb, tids2)
            eps = eps[0] + guidance * (eps[1] - eps[0])

            if cfg.variant == "post":
                prev, _ = S.step_interp(sch, eps, latents, step_i)
            else:
                prev, _ = S.step_interp_prob_uncertain(
                    sch, eps.transpose(0, 3, 1, 2),
                    latents.transpose(0, 3, 1, 2), step_i,
                    cond.transpose(0, 3, 1, 2), msk, lam)
                prev = prev.transpose(0, 2, 3, 1)
            return prev

        cond_fw = cond_latents
        cond_bw = jnp.flip(cond_latents, axis=0)
        mask_bw = jnp.flip(mask, axis=0)
        lam_bw = jnp.flip(lambda_ts, axis=1)

        if cfg.direction_parallel:
            clip2 = jnp.stack([clip_start, clip_end])
            cond2 = jnp.stack([cond_fw, cond_bw])
            mask2 = jnp.stack([mask, mask_bw])
            lam2 = jnp.stack([lambda_ts, lam_bw])
            img2 = jnp.stack([lat_start_f, lat_end_f])

            def one_latent(latents0):
                def body(step_i, latents):
                    lat2 = jnp.stack([latents, jnp.flip(latents, 0)])
                    if cfg.direction_sharding is not None:
                        lat2 = jax.lax.with_sharding_constraint(
                            lat2, cfg.direction_sharding)
                    out2 = jax.vmap(
                        lambda l, ce, cd, m, lm, il: direction_step(
                            l, step_i, ce, cd, m, lm, il))(
                        lat2, clip2, cond2, mask2, lam2, img2)
                    return (weight_fw * out2[0]
                            + (1 - weight_fw) * jnp.flip(out2[1], 0))

                return jax.lax.fori_loop(0, cfg.num_inference_steps, body,
                                         latents0)
        else:
            def one_latent(latents0):
                def body(step_i, latents):
                    fwd = direction_step(latents, step_i, clip_start,
                                         cond_fw, mask, lambda_ts,
                                         lat_start_f)
                    bwd = direction_step(jnp.flip(latents, 0), step_i,
                                         clip_end, cond_bw, mask_bw, lam_bw,
                                         lat_end_f)
                    return (weight_fw * fwd
                            + (1 - weight_fw) * jnp.flip(bwd, 0))

                return jax.lax.fori_loop(0, cfg.num_inference_steps, body,
                                         latents0)

        init = noise_latents * sch.init_noise_sigma
        outs = jax.lax.map(one_latent, init)
        return outs.mean(axis=0)

    # ------------------------------------------------------------------
    # decode
    # ------------------------------------------------------------------

    def denoise(self, noise_latents, clip_start, clip_end, cond_latents,
                mask, lambda_ts):
        """Public entry — threads the UNet params as a jit argument."""
        return self._denoise_impl(self.m.unet_params, noise_latents,
                                  clip_start, clip_end, cond_latents, mask,
                                  lambda_ts)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _decode_impl(self, vae_params, latents: jnp.ndarray) -> jnp.ndarray:
        """(F, h, w, 4) -> (F, H, W, 3) in [0, 1], chunked temporal decode
        (reference decode_latents, chunks of decode_chunk_size=8). The
        temporal decoder mixes frames within a chunk, so the chunk size is
        a fidelity parameter, not just a memory knob. Runs in compute_dtype
        (bf16 on TPU — the reference decodes in fp16)."""
        cfg = self.cfg
        vae = self.m.vae.clone(dtype=cfg.compute_dtype)
        z = latents / self.m.vae.scaling_factor
        f = z.shape[0]
        c = cfg.decode_chunk_size
        frames = []
        for i in range(0, f, c):
            chunk = z[i:i + c]
            dec = vae.apply(vae_params, chunk.astype(cfg.compute_dtype),
                            chunk.shape[0], method="decode")
            frames.append(dec.astype(jnp.float32))
        out = jnp.concatenate(frames, axis=0)
        return jnp.clip(out * 0.5 + 0.5, 0.0, 1.0)

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        return self._decode_impl(self.m.vae_params, latents)

    # ------------------------------------------------------------------

    def __call__(self, image_start, cond_images, image_end, mask, lambda_ts,
                 key: jax.Array, latents: Optional[jnp.ndarray] = None):
        """Full pipeline. Images (H, W, 3) in [0,1] at the SVD working
        resolution; mask (F-2, h, w) latent-res uncertainty; lambda_ts
        (num_steps, F). Returns (F, H, W, 3) frames in [0, 1]."""
        cfg = self.cfg
        k_noise, k_lat = jax.random.split(key)
        clip_s, clip_e, cond, _, _ = self.encode_conditioning(
            image_start, cond_images, image_end, k_noise)
        h, w = cond.shape[1:3]
        if latents is None:
            latents = jax.random.normal(
                k_lat, (cfg.latent_num, cfg.num_frames, h, w, 4))
        out = self.denoise(latents, clip_s, clip_e, cond, mask, lambda_ts)
        return self.decode(out)
