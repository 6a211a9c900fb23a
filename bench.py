"""Round benchmark on the real chip. Prints JSON result lines; the LAST
line printed is the definitive record (earlier lines are provisional /
partial snapshots marked as such in `extra`). Each line has the shape
{"metric", "value", "unit", "vs_baseline", "extra"}.

Emission contract (round-5 restructure — a driver timeout must never yield
nothing): the bench prints the most-recent completed on-chip record
IMMEDIATELY at startup (marked `provisional_from_last_good`), then
re-emits an updated full line as each live unit completes, live numbers
replacing carried ones (`carried_fields` lists what is still carried).
The final line drops the `partial` flag and is persisted to
BENCH_LAST_GOOD.json. Probe/lock waits default to driver-budget values
(one 120 s probe, 10 min lock wait); set SYN3R_BENCH_THOROUGH=1 for the
patient battery behavior (3 probes, 45 min lock wait).

Primary metric: guided SVD denoise steps/sec — BOTH directions of the
reference's hot loop B per step, with the reference's DETACHED guidance
gradient (SVD_2pass_prob_uncertain_post.py:732-733: the UNet input is
detached, so the grad is closed-form through pred_x0's sample/(sigma^2+1)
term — no UNet backward). Per step and direction: ONE fused batch-3 UNet
forward (guidance uncond + CFG pair, batch_groups=(1,2) — same math as the
reference's separate batch-1 + batch-2 calls), the 4-tile closed-form grad,
Euler update; then the direction merge. Directions run sequentially inside
one jit — the direction-batched variant exceeds v5e HBM at full size
(measured 17.8 vs 15.75 GB).
Full SVD-XT config, 25 frames, 72x128 latents, bf16.

extra carries the other north-star metrics (BASELINE.md):
  - completion_s_per_pair: encode + 100 guided steps + chunk-8 bf16
    decode at full size — the reference's whole svd_render unit
  - guided_step_s_prob / completion_s_per_pair_prob: the DTU prob
    variant's unit (one batch-2 CFG forward + soft latent replacement per
    direction — SVD_2pass_prob_uncertain.py + scheduler :1343-1515),
    measured, not approximated by the post unit
  - unet_b3_fwd_ms: one batch-3 grouped forward alone — decomposes the
    guided step into UNet time vs epilogue (grad + Euler + merge)
  - gs_train_step_ms: full 3DGS train step (fwd+bwd+adam+densify stats,
    Pallas composite) at 504x378 / 65k gaussians
  - unet_fwd_mfu_pct: counted FLOPs of one CFG (batch 2) UNet forward
    over measured time vs the v5e 197 TFLOP/s bf16 peak;
    mfu_flop_basis records whether the count came from the compiled
    (post-optimization) or the lowered (pre-optimization) HLO of the
    PALLAS-DISABLED graph (XLA cannot count inside Pallas custom calls)
  - v5e8_*: the multi-chip per-scene projection from these measured
    single-chip units (pair_parallel x direction_sharding — derivation
    in PARITY.md "3x target"); the >=3x BASELINE target is defined on
    v5e-8 hardware
All timings chain each iteration's input to the previous output so the
remote-runtime dispatch queue cannot fake the numbers.
"""

import json
import os
import resource
import subprocess
import sys
import time

# XLA's compile passes recurse deeply on the fused 100-step graphs below;
# the default 8 MB main-thread stack SIGSEGVs. A runtime setrlimit is not
# sufficient — the kernel reserves the stack-growth gap from the soft
# limit at EXECVE time (see tests/conftest.py) — so raise and re-exec once.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY and _soft < 512 * 1024 * 1024:
    _new = (512 * 1024 * 1024 if _hard == resource.RLIM_INFINITY
            else min(512 * 1024 * 1024, _hard))
    resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))
    if os.environ.get("SYN3R_STACK_REEXEC") != "1":
        os.environ["SYN3R_STACK_REEXEC"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)

# XLA:CPU JIT code pages can exhaust vm.max_map_count on big fused graphs
# (see tests/conftest.py); raise it when permitted, ignore otherwise.
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 1_048_576:
            _f.seek(0)
            _f.write("1048576")
except OSError:
    pass


_LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_LAST_GOOD.json")
_THOROUGH = os.environ.get("SYN3R_BENCH_THOROUGH") == "1"


def _emit(result):
    print(json.dumps(result), flush=True)


def _load_last_good():
    try:
        with open(_LAST_GOOD) as f:
            rec = json.load(f)
        rec["result"]["value"]          # shape check
        return rec
    except (OSError, KeyError, ValueError):
        return None


def _record_last_good(result):
    """Persist a successful on-chip run so a tunnel outage at the driver's
    end-of-round bench doesn't erase the round's measured numbers."""
    try:
        with open(_LAST_GOOD, "w") as f:
            json.dump({"measured_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()), "result": result}, f,
                indent=1)
    except OSError:
        pass


class _Record:
    """The incrementally-published result line. Seeded from the last
    completed on-chip run (every seeded field listed in carried_fields);
    live measurements replace carried ones and re-emit."""

    def __init__(self):
        self.result = {
            "metric": "guided_denoise_steps_per_sec",
            "value": 0.0,
            "unit": "steps/s (both directions)",
            "vs_baseline": None,
            "extra": {},
        }
        self.carried = set()

    def seed_from_last_good(self):
        rec = _load_last_good()
        if rec is None:
            return False
        res = rec["result"]
        extra = dict(res.get("extra") or {})
        for k in ("stale", "stale_reason", "partial", "carried_fields",
                  "provisional_from_last_good", "measured_at", "error"):
            extra.pop(k, None)
        self.result["value"] = res.get("value", 0.0)
        self.result["extra"] = extra
        self.carried = set(extra) | {"value"}
        extra["provisional_from_last_good"] = rec["measured_at"]
        return True

    def set_value(self, v):
        self.result["value"] = v
        self.carried.discard("value")

    def set(self, **kv):
        self.result["extra"].update(kv)
        self.carried -= set(kv)

    def emit(self, final=False):
        extra = self.result["extra"]
        if final:
            # never promote still-carried (unmeasured) fields into a
            # freshly-dated record: drop them, so a code/record skew can't
            # present an old value as part of this run's measurements
            for k in self.carried - {"value"}:
                extra.pop(k, None)
            for k in ("partial", "carried_fields",
                      "provisional_from_last_good"):
                extra.pop(k, None)
            if "value" in self.carried:       # primary never measured —
                self.result["value"] = 0.0    # a final record would lie
                extra["error"] = "primary metric was never measured live"
            _emit(self.result)
            _record_last_good(self.result)
        else:
            extra["partial"] = True
            if self.carried:
                extra["carried_fields"] = sorted(self.carried)
            else:
                extra.pop("carried_fields", None)
            _emit(self.result)


def _emit_stale_or_error(detail):
    """TPU unreachable: emit the most recent REAL on-chip measurement,
    clearly marked stale with the outage reason — never fake CPU numbers,
    and never zeros when a dated chip measurement exists."""
    rec = _load_last_good()
    if rec is not None:
        result = rec["result"]
        extra = dict(result.get("extra") or {})
        extra.update({
            "stale": True,
            "measured_at": rec["measured_at"],
            "stale_reason": f"TPU backend unavailable now ({detail}); "
                            "values are the last completed on-chip run",
        })
        result["extra"] = extra
        _emit(result)
        return
    _emit({
        "metric": "guided_denoise_steps_per_sec",
        "value": 0.0,
        "unit": "steps/s (both directions)",
        "vs_baseline": None,
        "extra": {"error": f"TPU backend unavailable: {detail}; "
                           "bench not run (no fake CPU numbers)"},
    })


def _probe_backend(timeout_s):
    """Check that the default JAX backend actually initializes, in a
    SUBPROCESS with a hard timeout. When the axon TPU tunnel is down,
    `jax.devices()` blocks forever inside backend init — probing in-process
    would wedge the whole bench (and the driver's end-of-round run with it).
    Returns (ok, detail)."""
    code = "import jax; d = jax.devices(); print(d[0].platform, len(d))"
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, f"backend init exceeded {timeout_s}s (tunnel down?)"
    if r.returncode != 0:
        lines = (r.stderr or "").strip().splitlines()
        return False, lines[-1] if lines else "init failed"
    detail = r.stdout.strip()
    # A live backend that is plain CPU is NOT the chip (e.g. axon
    # registration skipped): these numbers must never be recorded as
    # on-chip results. Opt out only for explicit local smoke tests.
    if (detail.split() or ["?"])[0] == "cpu" and \
            os.environ.get("SYN3R_BENCH_ALLOW_CPU") != "1":
        return False, f"backend is CPU ({detail}), not the chip"
    return True, detail


def _drain(x):
    """Force completion. block_until_ready is NOT sufficient under the
    axon remote runtime when a jit output aliases a pallas custom-call
    buffer (measured: it returns immediately); a scalar readback of one
    element drains the queue for real."""
    import jax
    import jax.numpy as jnp
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))


def _chain_time(step, x0, iters):
    """Two-point slope timing: run chains of n1 and n2 iterations and take
    (T2 - T1) / (n2 - n1) — cancels the fixed dispatch/readback overhead
    and is immune to async-queue fakery (each iteration's input is the
    previous output; the final readback forces completion)."""
    def run(n):
        t0 = time.time()
        x = x0
        for _ in range(n):
            x = step(x)
        _drain(x)
        return time.time() - t0

    run(1)                                   # warmup / compile
    n1, n2 = 1, 1 + iters
    t1 = run(n1)
    t2 = run(n2)
    return max(t2 - t1, 1e-9) / (n2 - n1)


def setup_guided():
    """Build the full-config UNet + scheduler context and every jitted
    step variant. Returns a dict of closures; nothing is compiled yet."""
    import jax
    import jax.numpy as jnp

    from syn3r_tpu.diffusion import scheduler as S
    from syn3r_tpu.models.svd_unet import UNetSpatioTemporalConditionModel

    f, hl, wl = 25, 72, 128
    dtype = jnp.bfloat16
    unet = UNetSpatioTemporalConditionModel(dtype=dtype)
    rng = jax.random.PRNGKey(0)
    sample8 = jnp.zeros((1, f, hl, wl, 8), dtype)
    ehs1 = jnp.zeros((1, 1, 1024), dtype)
    tids1 = jnp.asarray([[6.0, 127.0, 0.02]])
    params = jax.jit(lambda k: unet.init(k, sample8, 1.0, ehs1, tids1))(rng)
    # bf16 weights — the reference loads the fp16 checkpoint
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    sch = S.svd_schedule(100)
    guidance = jnp.linspace(1.0, 3.0, f)[:, None, None, None]
    weight_fw = jnp.linspace(1.0, 0.0, f)[:, None, None, None]
    cond = jax.random.normal(rng, (f, hl, wl, 4), jnp.float32)
    cond2 = jnp.stack([cond, jnp.flip(cond, 0)])
    mask = jnp.ones((f - 2, hl, wl), jnp.float32) * 0.5
    mask2 = jnp.stack([mask, jnp.flip(mask, 0)])
    lam = jnp.ones((100, f), jnp.float32)
    lam2 = jnp.stack([lam, jnp.flip(lam, 1)])
    img_lat = jax.random.normal(rng, (f, hl, wl, 4), jnp.float32)
    clip_emb = jax.random.normal(rng, (2, 1, 1024), jnp.float32)
    tids2 = jnp.tile(tids1, (2, 1))
    tids3 = jnp.tile(tids1, (3, 1))

    def unet_fp32(p, x, t, e, ti, groups=None):
        return unet.apply(p, x.astype(dtype), t, e.astype(dtype),
                          ti, batch_groups=groups).astype(jnp.float32)

    def direction_step(params, latents, cond_d, mask_d, step_i):
        """One direction of the guided step, FUSED: the batch-1 uncond
        guidance pass and the batch-2 CFG pass evaluate the same pre-grad
        latents, so they run as ONE batch-3 forward with batch_groups=(1,2)
        (same math as the separate calls — the grouped time-context quirk).
        Closed-form tiled grad from row 0's pred_x0; Euler update from the
        POST-grad latents with the CFG eps (reference :781-800)."""
        t = sch.timesteps[step_i]
        sigma = sch.sigmas[step_i]
        scaled = S.scale_model_input(sch, latents, step_i)
        uncond = jnp.concatenate([scaled, jnp.zeros_like(img_lat)], axis=-1)
        inp3 = jnp.stack([
            uncond, uncond,
            jnp.concatenate([scaled, img_lat], axis=-1)], axis=0)
        ehs3 = jnp.concatenate([jnp.zeros_like(clip_emb[:1]), clip_emb],
                               axis=0)
        eps3 = unet_fp32(params, inp3, t, ehs3, tids3, (1, 2))
        x0 = S.pred_original_sample(eps3[0], latents, sigma)
        grad = S.guidance_grad_tiled(
            x0.transpose(0, 3, 1, 2), cond_d.transpose(0, 3, 1, 2),
            mask_d, lam[step_i], sigma, lr=0.02)
        next_lat = latents - grad.transpose(0, 2, 3, 1)
        eps = eps3[1] + guidance * (eps3[2] - eps3[1])
        prev, _ = S.step_interp(sch, eps, next_lat, step_i)
        return prev

    def guided_dual_step(params, latents, step_i=0):
        """Production single-chip semantics: both directions sequentially
        inside ONE jit (the vmapped direction axis is reserved for the
        multichip direction-sharded path — batched it needs 17.8 GB of HBM
        at full size, measured, vs the v5e's 15.75)."""
        fwd = direction_step(params, latents, cond2[0], mask2[0], step_i)
        bwd = direction_step(params, jnp.flip(latents, 0), cond2[1],
                             mask2[1], step_i)
        return weight_fw * fwd + (1 - weight_fw) * jnp.flip(bwd, 0)

    # opt-in reuse mode (GuidedSVDConfig.guidance_reuse_cfg_uncond): the
    # CFG pass's uncond row doubles as the guidance x0 — ONE batch-2
    # forward per direction instead of batch-3 (documented divergence via
    # the time-context quirk; per-tile std normalization absorbs the
    # scale shift). Timed as an extra so the speed/fidelity trade is on
    # the record next to the reference-semantics primary number.
    def direction_step_reuse(params, latents, cond_d, mask_d, step_i):
        t = sch.timesteps[step_i]
        sigma = sch.sigmas[step_i]
        scaled = S.scale_model_input(sch, latents, step_i)
        inp2 = jnp.stack([
            jnp.concatenate([scaled, jnp.zeros_like(img_lat)], axis=-1),
            jnp.concatenate([scaled, img_lat], axis=-1)], axis=0)
        eps2 = unet_fp32(params, inp2, t, clip_emb, tids2)
        x0 = S.pred_original_sample(eps2[0], latents, sigma)
        grad = S.guidance_grad_tiled(
            x0.transpose(0, 3, 1, 2), cond_d.transpose(0, 3, 1, 2),
            mask_d, lam[step_i], sigma, lr=0.02)
        next_lat = latents - grad.transpose(0, 2, 3, 1)
        eps = eps2[0] + guidance * (eps2[1] - eps2[0])
        prev, _ = S.step_interp(sch, eps, next_lat, step_i)
        return prev

    def guided_dual_step_reuse(params, latents, step_i=0):
        fwd = direction_step_reuse(params, latents, cond2[0], mask2[0],
                                   step_i)
        bwd = direction_step_reuse(params, jnp.flip(latents, 0), cond2[1],
                                   mask2[1], step_i)
        return weight_fw * fwd + (1 - weight_fw) * jnp.flip(bwd, 0)

    # the DTU prob variant's step (SVD_2pass_prob_uncertain.py + the
    # vendored scheduler's step_interp_prob_uncertain, :1343-1515): per
    # direction ONE batch-2 CFG forward + the soft latent-replacement
    # epilogue — NO guidance pass, NO tile grad. 2/3 of the post
    # variant's UNet FLOPs per step.
    def direction_step_prob(params, latents, cond_d, mask_d, lam_d, step_i):
        t = sch.timesteps[step_i]
        scaled = S.scale_model_input(sch, latents, step_i)
        inp2 = jnp.stack([
            jnp.concatenate([scaled, jnp.zeros_like(img_lat)], axis=-1),
            jnp.concatenate([scaled, img_lat], axis=-1)], axis=0)
        eps2 = unet_fp32(params, inp2, t, clip_emb, tids2)
        eps = eps2[0] + guidance * (eps2[1] - eps2[0])
        prev, _ = S.step_interp_prob_uncertain(
            sch, eps.transpose(0, 3, 1, 2),
            latents.transpose(0, 3, 1, 2), step_i,
            cond_d.transpose(0, 3, 1, 2), mask_d, lam_d)
        return prev.transpose(0, 2, 3, 1)

    def guided_dual_step_prob(params, latents, step_i=0):
        fwd = direction_step_prob(params, latents, cond2[0], mask2[0],
                                  lam2[0], step_i)
        bwd = direction_step_prob(params, jnp.flip(latents, 0), cond2[1],
                                  mask2[1], lam2[1], step_i)
        return weight_fw * fwd + (1 - weight_fw) * jnp.flip(bwd, 0)

    # CFG (batch 2) UNet forward — plain body, NOT pre-decorated: the
    # FLOP-count lowering below must go through a DISTINCT jit wrapper so
    # the timing callable's trace-cache entry is never created under
    # pallas_disabled() (ADVICE r4: the old shared-jit version silently
    # timed the reference-FFN graph).
    def cfg_body(params, x):
        inp = jnp.stack([
            jnp.concatenate([x, jnp.zeros_like(img_lat)], axis=-1),
            jnp.concatenate([x, img_lat], axis=-1)], axis=0)
        eps = unet_fp32(params, inp, 1.0, clip_emb, tids2)
        return eps[0]

    # one grouped batch-3 forward alone — the guided step's UNet part,
    # for the step-time decomposition (epilogue = step - 2 x this)
    def b3_body(params, x):
        uncond = jnp.concatenate([x, jnp.zeros_like(img_lat)], axis=-1)
        inp3 = jnp.stack([
            uncond, uncond,
            jnp.concatenate([x, img_lat], axis=-1)], axis=0)
        ehs3 = jnp.concatenate([jnp.zeros_like(clip_emb[:1]), clip_emb],
                               axis=0)
        eps3 = unet_fp32(params, inp3, 1.0, ehs3, tids3, (1, 2))
        return eps3[0]

    lat0 = jax.random.normal(rng, (f, hl, wl, 4), jnp.float32) * sch.sigmas[0]
    # params must be a runtime ARGUMENT of the jitted step: closing over
    # them via partial embeds 3 GB of weights as compile-time constants,
    # which breaks the axon remote-compile transport (and bloats the
    # executable).
    return {
        "params": params, "lat0": lat0,
        "step_jit": jax.jit(guided_dual_step),
        "reuse_jit": jax.jit(guided_dual_step_reuse),
        "prob_jit": jax.jit(guided_dual_step_prob),
        "cfg_body": cfg_body,
        "cfg_jit": jax.jit(cfg_body),
        "b3_jit": jax.jit(b3_body),
    }


def count_cfg_flops(ctx):
    """FLOPs of one CFG (batch 2) forward from the PALLAS-DISABLED graph:
    XLA's cost analysis cannot see inside a Pallas custom call, so with
    the fused GEGLU FFN default-on the Pallas-on graph undercounts real
    work (measured r4: 29.9% "MFU" at a FASTER wall time than r3's
    37.6%). Same math either way — count the reference-FFN graph's
    matmuls, time the real (Pallas-on) path.

    Basis: prefer the COMPILED (post-fusion/CSE) HLO count — the
    pre-optimization lowering can overcount work the compiler
    eliminates (ADVICE r4 low). Falls back to the lowered count (one
    extra full-config compile is driver-budget-relevant only on a cold
    cache; this call runs after the primary metric is already out).
    Returns (flops, basis)."""
    import jax
    from syn3r_tpu.ops.pallas_ffn import pallas_disabled

    body = ctx["cfg_body"]
    with pallas_disabled():
        # distinct jit wrapper — never pollutes cfg_jit's trace cache
        lowered = jax.jit(lambda p, x: body(p, x)).lower(
            ctx["params"], ctx["lat0"])
    if os.environ.get("SYN3R_BENCH_MFU_LOWERED") != "1":
        try:
            return lowered.compile().cost_analysis()["flops"], "compiled_hlo"
        except Exception:
            pass
    return lowered.cost_analysis()["flops"], "lowered_hlo_prefusion"


def bench_completion_pair():
    """VAE halves of the completion unit: encode (27 frames) + chunk-8
    bf16 temporal decode at 576x1024, measured directly. The denoise part
    is extrapolated from the measured per-step time (identical jit).
    Returns (t_encode, t_decode)."""
    import jax
    import jax.numpy as jnp

    from syn3r_tpu.models.vae import AutoencoderKLTemporalDecoder

    f, H, W = 25, 576, 1024
    dtype = jnp.bfloat16
    vae = AutoencoderKLTemporalDecoder(dtype=dtype)
    rng = jax.random.PRNGKey(1)
    vp = jax.jit(lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3)), 1))(rng)
    vp = jax.tree.map(lambda x: x.astype(dtype), vp)

    imgs = jax.random.uniform(rng, (27, H, W, 3), jnp.float32)

    @jax.jit
    def encode27(p, x):
        # chunks of 8 inside ONE jit — mirrors the production
        # GuidedSVDPipeline._vae_encode_mode_batch (the spatial encoder is
        # frame-independent; chunking only bounds activation HBM)
        outs = []
        for i in range(0, x.shape[0], 8):
            outs.append(vae.apply(p, (x[i:i + 8] * 2 - 1).astype(dtype),
                                  method="encode_mode"))
        return jnp.concatenate(outs, axis=0)

    z27 = encode27(vp, imgs)
    _drain(z27)
    t0 = time.time()
    z27 = encode27(vp, imgs + z27.astype(jnp.float32).mean() * 0.0)
    _drain(z27)
    t_encode = time.time() - t0

    z25 = z27[:25]

    @jax.jit
    def decode(p, z):
        frames = []
        for i in range(0, f, 8):
            chunk = z[i:i + 8]
            frames.append(vae.apply(p, chunk.astype(dtype), chunk.shape[0],
                                    method="decode").astype(jnp.float32))
        return jnp.concatenate(frames, axis=0)

    # keep the chained input's dtype IDENTICAL to the first call's — an f32
    # promotion here silently recompiles the whole 4-chunk decode graph and
    # the "decode time" becomes compile time (measured 130 s vs the real
    # 2.4 s before this cast was added)
    z25 = z25.astype(jnp.float32)
    out = decode(vp, z25)
    _drain(out)
    t0 = time.time()
    out = decode(vp, z25 + out.mean() * 0.0)
    _drain(out)
    t_decode = time.time() - t0

    return t_encode, t_decode


def bench_gs_step():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from syn3r_tpu.gs.trainer import GSTrainer, TrainConfig, make_viewset
    from syn3r_tpu.models import gaussians as G
    from syn3r_tpu.utils.camera import camera_from_fov, look_at_w2c

    w, h, n = 504, 378, 65_536
    rng = np.random.default_rng(0)
    xyz = np.concatenate([rng.uniform(-1.5, 1.5, (n, 2)),
                          rng.uniform(1.5, 4.0, (n, 1))], 1).astype(np.float32)
    state = G.from_points(
        jnp.asarray(xyz),
        jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        capacity=n)
    cam = camera_from_fov(0.9, 0.7, w, h,
                          look_at_w2c(jnp.asarray([0.0, 0.0, 0.0]),
                                      jnp.asarray([0.0, 0.0, 2.5])))
    img = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    views = make_viewset([cam], img)
    cfg = TrainConfig(rasterizer="pallas", tile_cap=512,
                      densify_from_iter=10 ** 9)
    tr = GSTrainer(views, cfg, state, model_path="/tmp/bench_gs_model")
    cam0, img0 = views.view(0)

    def step(ts):
        new_ts, _ = tr._train_step(ts, cam0, img0, None, None,
                                   use_lpips=False, use_depth=False)
        return new_ts

    train_dt = _chain_time(step, tr.state, iters=10)

    # pure render throughput (BASELINE.md north star "3DGS rendered
    # frames/sec"): forward-only render_view at the same scene scale,
    # chained through the gaussian means so the queue can't pipeline it
    # into a lie
    def render_once(g):
        out = tr._render_jit(g, cam0)
        return g.replace(means=g.means + 0.0 * out.rgb.mean())

    render_dt = _chain_time(render_once, tr.state.gaussians, iters=20)
    return train_dt, render_dt


def main():
    rec = _Record()
    # Emit the most-recent completed on-chip record IMMEDIATELY — before
    # the probe, before the lock, before importing jax. A driver timeout
    # anywhere downstream now leaves a real dated number on stdout instead
    # of rc=124 with nothing (the round-4 failure mode).
    if rec.seed_from_last_good():
        rec.emit()
    # Refuse to run against a dead backend: probe in a SUBPROCESS (the
    # axon tunnel blocks forever inside backend init when down). Driver
    # budget by default: one 120 s attempt; the battery opts into patient
    # retries with SYN3R_BENCH_THOROUGH=1.
    if os.environ.get("SYN3R_BENCH_SKIP_PROBE") != "1":
        attempts, probe_t = (3, 180) if _THOROUGH else (1, 120)
        ok, detail = False, ""
        for attempt in range(attempts):
            ok, detail = _probe_backend(probe_t)
            if ok:
                break
            if attempt < attempts - 1:
                time.sleep(60)
        if not ok:
            _emit_stale_or_error(detail)
            return
    # Serialize against other chip clients (the tunnel-return battery can
    # hold the chip for hours): two concurrent clients of the single-chip
    # remote runtime deadlock in the compile queue (observed). Hold the
    # lock for the whole run; if it can't be had in time, the provisional
    # line already out (plus the stale line here) is the answer.
    lock_path = "/tmp/syn3r_tpu.lock"
    if os.environ.get("SYN3R_BENCH_LOCK_SKIP") != "1":   # battery holds it
        wait_s = int(os.environ.get(
            "SYN3R_BENCH_LOCK_WAIT_S", "2700" if _THOROUGH else "600"))
        lock_f = open(lock_path, "w")                    # kept open = held
        import fcntl
        t0 = time.time()
        while True:
            try:
                fcntl.flock(lock_f, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError:
                if time.time() - t0 > wait_s:
                    _emit_stale_or_error(
                        f"chip busy (another client holds {lock_path} "
                        f"for > {wait_s}s)")
                    return
                time.sleep(30)
    import jax
    # persistent compile cache (first full-config compile is minutes on
    # this single-core host, milliseconds after)
    from syn3r_tpu.utils.compile_cache import configure as _cc
    _cc(jax)  # host-feature-keyed dir: foreign AOT cache entries SIGILL
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    ctx = setup_guided()
    params, lat0 = ctx["params"], ctx["lat0"]

    # -- primary metric first, published the moment it exists ----------
    dt_guided = _chain_time(lambda x: ctx["step_jit"](params, x), lat0,
                            iters=5)
    rec.set_value(round(1.0 / dt_guided, 3))
    rec.set(denoise_frames_per_sec=round(25.0 / dt_guided, 2),
            guided_step_s=round(dt_guided, 2))
    rec.emit()

    # -- UNet-family extras --------------------------------------------
    dt_b3 = _chain_time(lambda x: ctx["b3_jit"](params, x), lat0, iters=5)
    rec.set(unet_b3_fwd_ms=round(dt_b3 * 1e3, 1),
            guided_step_epilogue_ms=round((dt_guided - 2 * dt_b3) * 1e3, 1))
    rec.emit()

    dt_reuse = _chain_time(lambda x: ctx["reuse_jit"](params, x), lat0,
                           iters=3)
    dt_prob = _chain_time(lambda x: ctx["prob_jit"](params, x), lat0,
                          iters=3)
    rec.set(guided_step_s_reuse_uncond=round(dt_reuse, 2),
            guided_step_s_prob=round(dt_prob, 2))
    rec.emit()

    dt_fwd = _chain_time(lambda x: ctx["cfg_jit"](params, x), lat0, iters=5)
    flops, basis = count_cfg_flops(ctx)
    mfu = flops / dt_fwd / 197e12 * 100.0
    rec.set(unet_cfg_fwd_ms=round(dt_fwd * 1e3, 1),
            unet_fwd_mfu_pct=round(mfu, 1),
            mfu_flop_basis=basis)
    rec.emit()

    # -- completion units ----------------------------------------------
    enc_s, dec_s = bench_completion_pair()
    pair_s = enc_s + 100.0 * dt_guided + dec_s
    pair_prob_s = enc_s + 100.0 * dt_prob + dec_s
    rec.set(vae_encode27_s=round(enc_s, 2),
            vae_decode25_s=round(dec_s, 2),
            completion_s_per_pair=round(pair_s, 1),
            completion_s_per_pair_reuse=round(
                enc_s + 100.0 * dt_reuse + dec_s, 1),
            completion_s_per_pair_prob=round(pair_prob_s, 1))
    rec.emit()

    # -- 3DGS units -----------------------------------------------------
    gs_dt, gs_render_dt = bench_gs_step()
    rec.set(gs_train_step_ms=round(gs_dt * 1e3, 1),
            gs_render_fps=round(1.0 / gs_render_dt, 1))

    # -- per-scene envelopes (single chip) ------------------------------
    # LLFF (the number BASELINE.md's >=3x target is judged against).
    # Ours: 2 cycles x 3 wrap-around pairs x measured completion unit +
    # 3 x 10k GS iters (init + 2 refines, diffusionGS.py:1668-1697,
    # batch_llff_train.sh:39). Reference at MATCHED per-UNet-pass cost on
    # this chip: per step and direction it runs 4 tile passes (40x72
    # latents = 0.3125 full-frame each, batch-1) + 1 full CFG pass
    # (batch-2 = 2.0) = 3.25 full-frame batch-1 fwd-equivalents
    # (SVD_2pass_prob_uncertain_post.py:726-800) — CONSERVATIVE: the
    # reference also backprops each tile through the UNet
    # (loss.backward() to the input, :729-733), which this count treats
    # as free; our fused batch-3 step is 3.0 fwd-equivalents with the
    # closed-form grad instead. GS phases are charged identically on both
    # sides (the reference's CUDA rasterizer is not measurable here).
    fwd1 = dt_fwd / 2.0                      # batch-1 full-frame forward
    pairs = 2 * 3
    ref_pair_s = enc_s + 100 * 2 * 3.25 * fwd1 + dec_s
    gs_total_s = 3 * 10_000 * gs_dt
    scene_s = pairs * pair_s + gs_total_s
    ref_scene_s = pairs * ref_pair_s + gs_total_s
    # DTU / DL3DV envelopes from the same measured units. Pair topology
    # (orchestrator.py:200-203): DTU 'interpolate_loop0_gs' runs N-1=2
    # pairs (3 views) on the PROB variant (now measured directly, not
    # approximated); DL3DV 'interpolate_gs_v2' runs N=9 wrap-around pairs
    # (9 views); both presets run 2 cycles + 3x10k GS iters.
    dtu_scene_s = 2 * 2 * pair_prob_s + gs_total_s
    dl3dv_scene_s = 2 * 9 * pair_s + gs_total_s

    # -- v5e-8 projection (the hardware BASELINE.md defines the >=3x
    # target on). pair_parallel x direction_sharding: every (pair,
    # direction) completion unit runs concurrently — LLFF 3x2=6 of 8
    # chips, DTU 2x2=4, DL3DV 9x2=18 -> 3 waves of <=8. Per chip and
    # step: HALF the dual step (one direction: batch-3 fwd + epilogue)
    # plus a ~3.7 MB latent exchange over ICI per step for the direction
    # merge (negligible vs ~3 s of compute; see PARITY.md "3x target"
    # for the derivation + residual risks). Cycles are sequential (cycle
    # 2 consumes cycle 1's GS); GS phases kept single-chip (conservative).
    dir_unit_s = enc_s + 100.0 * dt_guided / 2.0 + dec_s
    dir_unit_prob_s = enc_s + 100.0 * dt_prob / 2.0 + dec_s
    v5e8_llff_s = 2 * dir_unit_s + gs_total_s
    v5e8_dtu_s = 2 * dir_unit_prob_s + gs_total_s
    v5e8_dl3dv_s = 2 * 3 * dir_unit_s + gs_total_s

    rec.set(llff_scene_est_s=round(scene_s, 1),
            llff_scene_est_min=round(scene_s / 60.0, 1),
            llff_ref_envelope_matched_s=round(ref_scene_s, 1),
            algorithmic_speedup_vs_ref_envelope=round(
                ref_scene_s / scene_s, 2),
            dtu_scene_est_min=round(dtu_scene_s / 60.0, 1),
            dl3dv_scene_est_min=round(dl3dv_scene_s / 60.0, 1),
            v5e8_llff_scene_est_min=round(v5e8_llff_s / 60.0, 1),
            v5e8_dtu_scene_est_min=round(v5e8_dtu_s / 60.0, 1),
            v5e8_dl3dv_scene_est_min=round(v5e8_dl3dv_s / 60.0, 1),
            v5e8_speedup_vs_ref_envelope=round(ref_scene_s / v5e8_llff_s, 2))
    rec.emit(final=True)


if __name__ == "__main__":
    main()
