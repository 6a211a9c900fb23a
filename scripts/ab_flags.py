"""A/B the flag-gated Pallas kernels on the real chip.

Two optional kernels exist for the UNet hot path, both off by default
because they have never been measured on the chip (the tunnel was down
when they landed):
  - SYN3R_PALLAS_FFN=1  : fused GEGLU feed-forward (ops/pallas_ffn.py)
  - SYN3R_PALLAS_NORMS=1: fused GroupNorm(+silu) (ops/pallas_norm.py)

This script times the production fused batch-3 guided forward (guidance
uncond + CFG pair at full SVD-XT config, 25f x 72x128, bf16) under each
flag combination, each in a fresh subprocess (the flags are read at import
time), and prints one JSON line per combo plus a winner summary. Run by
the battery (scripts/when_tpu_returns.sh); flip the defaults in
ops/pallas_{ffn,norm}.py if a combo wins by >3%.
"""
import json
import os
import pathlib
import subprocess
import sys

REPO = str(pathlib.Path(__file__).resolve().parents[1])

CHILD = r"""
import time, json, os, sys
sys.path.insert(0, %r)
import jax, jax.numpy as jnp
from syn3r_tpu.utils.compile_cache import configure as _cc
_cc(jax)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
from syn3r_tpu.models.svd_unet import UNetSpatioTemporalConditionModel

f, hl, wl = 25, 72, 128
dtype = jnp.bfloat16
unet = UNetSpatioTemporalConditionModel(dtype=dtype)
rng = jax.random.PRNGKey(0)
sample8 = jnp.zeros((1, f, hl, wl, 8), dtype)
ehs1 = jnp.zeros((1, 1, 1024), dtype)
tids1 = jnp.asarray([[6.0, 127.0, 0.02]])
params = jax.jit(lambda k: unet.init(k, sample8, 1.0, ehs1, tids1))(rng)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
x3 = jax.random.normal(rng, (3, f, hl, wl, 8), jnp.float32)
ehs3 = jax.random.normal(rng, (3, 1, 1024), jnp.float32)
tids3 = jnp.tile(tids1, (3, 1))

@jax.jit
def fwd(p, x):
    return unet.apply(p, x.astype(dtype), 1.0, ehs3.astype(dtype), tids3,
                      batch_groups=(1, 2)).astype(jnp.float32)

def drain(y):
    return float(jnp.sum(y.ravel()[:1]))

def run(n):
    t0 = time.time(); x = x3
    for _ in range(n):
        x = jnp.concatenate([fwd(params, x), x[..., 4:]], axis=-1)
    drain(x); return time.time() - t0

run(1)
t1, t2 = run(1), run(6)
dt = (t2 - t1) / 5
print(json.dumps({"combo": {k: os.environ.get(k, "0") for k in
                            ("SYN3R_PALLAS_FFN", "SYN3R_PALLAS_NORMS")},
                  "batch3_fwd_s": round(dt, 3)}))
""" % (REPO,)


def main():
    results = []
    for ffn in ("0", "1"):
        for norms in ("0", "1"):
            env = dict(os.environ,
                       SYN3R_PALLAS_FFN=ffn, SYN3R_PALLAS_NORMS=norms)
            r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                               capture_output=True, text=True, timeout=3600)
            line = (r.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                rec = json.loads(line)
            except ValueError:
                rec = {"combo": {"SYN3R_PALLAS_FFN": ffn,
                                 "SYN3R_PALLAS_NORMS": norms},
                       "error": (r.stderr or "no output").strip()[-400:]}
            print(json.dumps(rec), flush=True)
            results.append(rec)
    timed = [r for r in results if "batch3_fwd_s" in r]
    if timed:
        best = min(timed, key=lambda r: r["batch3_fwd_s"])
        base = next((r for r in timed
                     if set(r["combo"].values()) == {"0"}), None)
        print(json.dumps({
            "winner": best["combo"], "batch3_fwd_s": best["batch3_fwd_s"],
            "baseline_s": base and base["batch3_fwd_s"],
            "speedup_pct": base and round(
                100 * (1 - best["batch3_fwd_s"] / base["batch3_fwd_s"]), 1),
        }))


if __name__ == "__main__":
    main()
