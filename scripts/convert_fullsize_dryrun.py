"""Full-size conversion dry-run: the weights-day de-risking rehearsal.

Generates a RANDOM ~1.5B-param SVD-XT snapshot in the exact HF hub layout
(unet/ sharded fp16 .safetensors + index.json, vae/ and image_encoder/
single fp16 files — the same layout `stabilityai/stable-video-diffusion-
img2vid-xt` ships, reference model/diffusionGS.py:1089), then runs the
real conversion path end-to-end on THIS host (`cli.runbook --stages
convert` -> `cli.convert_weights`), recording wall time and peak RSS per
stage. The single-core / finite-RAM host is exactly where a naive
full-tree conversion would OOM or crawl — this rehearsal means the first
real download converts on the first try.

Also structurally validates the converted trees against the flax models'
expected param shapes (jax.eval_shape — no 1.5B materialization) and
times `load_params` on the converted npz files.

Run:  python scripts/convert_fullsize_dryrun.py [--workdir /tmp/convert_dryrun]
"""
import argparse
import json
import os
import resource
import shutil
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def build_snapshot(snap):
    """Random full-config torch models -> fp16 hub-layout snapshot."""
    import torch
    sys.path.insert(0, "/root/reference/thirdparty/diffusers/src")
    import huggingface_hub
    if not hasattr(huggingface_hub, "cached_download"):
        huggingface_hub.cached_download = huggingface_hub.hf_hub_download
    from diffusers import AutoencoderKLTemporalDecoder as TorchVAE
    from diffusers import UNetSpatioTemporalConditionModel as TorchUNet
    from safetensors.numpy import save_file
    from transformers import CLIPVisionConfig
    from transformers import CLIPVisionModelWithProjection as TorchCLIP

    t0 = time.time()
    torch.manual_seed(0)
    # full SVD-XT configs (tests/test_full_config_parity.py)
    tu = TorchUNet(
        in_channels=8, out_channels=4,
        block_out_channels=(320, 640, 1280, 1280),
        down_block_types=("CrossAttnDownBlockSpatioTemporal",) * 3
        + ("DownBlockSpatioTemporal",),
        up_block_types=("UpBlockSpatioTemporal",)
        + ("CrossAttnUpBlockSpatioTemporal",) * 3,
        layers_per_block=2, cross_attention_dim=1024,
        num_attention_heads=(5, 10, 20, 20), addition_time_embed_dim=256,
        projection_class_embeddings_input_dim=768, num_frames=25).eval()
    tv = TorchVAE(in_channels=3, out_channels=3,
                  down_block_types=("DownEncoderBlock2D",) * 4,
                  block_out_channels=(128, 256, 512, 512),
                  layers_per_block=2, latent_channels=4).eval()
    tc = TorchCLIP(CLIPVisionConfig(
        hidden_size=1280, intermediate_size=5120, num_hidden_layers=32,
        num_attention_heads=16, image_size=224, patch_size=14,
        projection_dim=1024, hidden_act="gelu")).eval()
    n_params = {m: sum(p.numel() for p in mod.parameters())
                for m, mod in (("unet", tu), ("vae", tv), ("clip", tc))}
    print(f"[gen] models built in {time.time() - t0:.0f}s, params "
          f"{json.dumps(n_params)} (total {sum(n_params.values()) / 1e9:.2f}B)",
          flush=True)

    def fp16_sd(model):
        return {k: v.detach().numpy().astype(np.float16)
                for k, v in model.state_dict().items()}

    t0 = time.time()
    unet_dir = os.path.join(snap, "unet")
    os.makedirs(unet_dir, exist_ok=True)
    sd = fp16_sd(tu)
    # two shards + index.json — the hub's sharded large-model layout
    keys = sorted(sd)
    half = len(keys) // 2
    shards = {
        "diffusion_pytorch_model.fp16-00001-of-00002.safetensors":
            {k: sd[k] for k in keys[:half]},
        "diffusion_pytorch_model.fp16-00002-of-00002.safetensors":
            {k: sd[k] for k in keys[half:]},
    }
    weight_map = {}
    for fname, part in shards.items():
        save_file(part, os.path.join(unet_dir, fname))
        weight_map.update({k: fname for k in part})
    with open(os.path.join(
            unet_dir, "diffusion_pytorch_model.safetensors.index.json"),
            "w") as f:
        json.dump({"metadata": {"total_size": sum(
            v.nbytes for v in sd.values())}, "weight_map": weight_map}, f)
    del sd, shards

    vae_dir = os.path.join(snap, "vae")
    os.makedirs(vae_dir, exist_ok=True)
    save_file(fp16_sd(tv), os.path.join(
        vae_dir, "diffusion_pytorch_model.fp16.safetensors"))
    clip_dir = os.path.join(snap, "image_encoder")
    os.makedirs(clip_dir, exist_ok=True)
    save_file(fp16_sd(tc), os.path.join(clip_dir, "model.fp16.safetensors"))
    sizes = {}
    for d in ("unet", "vae", "image_encoder"):
        sizes[d] = sum(os.path.getsize(os.path.join(snap, d, f))
                       for f in os.listdir(os.path.join(snap, d)))
    print(f"[gen] snapshot written in {time.time() - t0:.0f}s: "
          + ", ".join(f"{d} {s / 1e9:.2f} GB" for d, s in sizes.items())
          + f"; generator peak RSS {_rss_gb():.1f} GB", flush=True)


def validate_trees(weights_dir):
    """Converted npz trees vs the flax models' expected shapes
    (eval_shape — nothing full-size materializes)."""
    import jax
    # authoritative CPU pin (the JAX_PLATFORMS env var is ignored when the
    # axon TPU plugin is registered): this validation must NEVER grab the
    # single-chip tunnel — a second client deadlocks the remote runtime
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from syn3r_tpu.models.clip import CLIPVisionModelWithProjection
    from syn3r_tpu.models.convert import assert_tree_match
    from syn3r_tpu.models.svd_unet import UNetSpatioTemporalConditionModel
    from syn3r_tpu.models.vae import AutoencoderKLTemporalDecoder
    from syn3r_tpu.utils.params import load_params

    t0 = time.time()
    loads = {}
    for name in ("unet", "vae", "clip"):
        t1 = time.time()
        loads[name] = load_params(os.path.join(weights_dir, f"{name}.npz"))
        print(f"[load] {name}.npz in {time.time() - t1:.0f}s", flush=True)
    load_s = time.time() - t0

    fu = UNetSpatioTemporalConditionModel()
    u_shapes = jax.eval_shape(
        lambda k: fu.init(k, jnp.zeros((1, 2, 8, 8, 8)), 1.0,
                          jnp.zeros((1, 1, 1024)), jnp.zeros((1, 3))),
        jax.random.PRNGKey(0))
    assert_tree_match(loads["unet"]["params"], u_shapes["params"])
    fv = AutoencoderKLTemporalDecoder()
    v_shapes = jax.eval_shape(
        lambda k: fv.init(k, jnp.zeros((1, 16, 16, 3)), 1),
        jax.random.PRNGKey(0))
    assert_tree_match(loads["vae"]["params"], v_shapes["params"])
    fc = CLIPVisionModelWithProjection()
    c_shapes = jax.eval_shape(
        lambda k: fc.init(k, jnp.zeros((1, 224, 224, 3))),
        jax.random.PRNGKey(0))
    assert_tree_match(loads["clip"]["params"], c_shapes["params"])
    print(f"[validate] all three trees match the flax models' expected "
          f"shapes; load_params total {load_s:.0f}s", flush=True)
    return load_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/convert_dryrun")
    ap.add_argument("--keep", action="store_true",
                    help="keep the snapshot + converted files")
    args = ap.parse_args()
    snap = os.path.join(args.workdir, "snapshot")
    out = os.path.join(args.workdir, "runbook_out")
    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(snap, exist_ok=True)

    build_snapshot(snap)

    # the real weights-day command, in a fresh interpreter so its peak RSS
    # is the conversion's own (RUSAGE_CHILDREN maxrss = that child's peak)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "syn3r_tpu.cli.runbook",
         "--hf_snapshot", snap, "--scene", "/nonexistent",
         "--out", out, "--stages", "convert"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    convert_s = time.time() - t0
    convert_rss = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1e6
    assert r.returncode == 0, "conversion failed"
    weights_dir = os.path.join(out, "weights")
    out_sizes = {f: os.path.getsize(os.path.join(weights_dir, f)) / 1e9
                 for f in sorted(os.listdir(weights_dir))}
    print(f"[convert] runbook --stages convert: {convert_s:.0f}s, peak RSS "
          f"{convert_rss:.1f} GB; outputs "
          + ", ".join(f"{f} {s:.2f} GB" for f, s in out_sizes.items()),
          flush=True)

    load_s = validate_trees(weights_dir)
    print(json.dumps({"convert_s": round(convert_s, 1),
                      "convert_peak_rss_gb": round(convert_rss, 2),
                      "load_params_s": round(load_s, 1)}), flush=True)
    if not args.keep:
        shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
