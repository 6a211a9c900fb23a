"""Profile one full 3DGS train step on the real chip and print the
per-op device-time breakdown (VERDICT r2 weak #6 / next #7: find what
keeps the step at ~25 ms when the CUDA class is ~10 ms at this scale).

Usage: python scripts/profile_gs_step.py [--steps 20] [--cap 512]
Prints the top HLO ops by total device time from the xprof trace.
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(cap: int):
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
    cfg = TrainConfig(rasterizer="pallas", tile_cap=cap,
                      densify_from_iter=10 ** 9)
    tr = GSTrainer(views, cfg, state, model_path="/tmp/bench_gs_model")
    cam0, img0 = views.view(0)

    def step(ts):
        new_ts, _ = tr._train_step(ts, cam0, img0, None, None,
                                   use_lpips=False, use_depth=False)
        return new_ts

    return step, tr.state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cap", type=int, default=512)
    ap.add_argument("--trace_dir", default="/tmp/gs_trace")
    args = ap.parse_args()

    import jax
    from syn3r_tpu.utils.compile_cache import configure as _cc
    _cc(jax)  # host-feature-keyed: foreign AOT cache entries SIGILL

    step, ts = build_step(args.cap)
    # warmup / compile
    ts = step(ts)
    jax.block_until_ready(jax.tree.leaves(ts)[0])

    os.system(f"rm -rf {args.trace_dir}")
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            ts = step(ts)
        jax.block_until_ready(jax.tree.leaves(ts)[0])

    t0 = time.time()
    x = ts
    for _ in range(10):
        x = step(x)
    jax.block_until_ready(jax.tree.leaves(x)[0])
    print(f"wall per step (10-iter chain): {(time.time() - t0) / 10 * 1e3:.1f} ms")

    # ---- parse the trace: aggregate device-track events from the
    # Chrome trace JSON jax writes alongside the xplane ----
    traces = glob.glob(os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        print("no trace.json.gz found", file=sys.stderr)
        return
    with gzip.open(traces[0], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # find device process ids (TPU core tracks)
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "/device" in nm.lower():
                dev_pids.add(e["pid"])
    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e3          # us -> ms
            a, n = agg.get(name, (0.0, 0))
            agg[name] = (a + dur, n + 1)
            total += dur
    print(f"\ndevice total {total:.1f} ms over {args.steps} steps "
          f"({total / args.steps:.2f} ms/step)\n")
    print(f"{'op':70s} {'total_ms':>9s} {'per_step':>9s} {'occ':>6s}")
    for name, (ms, occ) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]:
        print(f"{name[:70]:70s} {ms:9.2f} {ms / args.steps:9.3f} {occ:6d}")


if __name__ == "__main__":
    main()
