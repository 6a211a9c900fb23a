"""Pipeline parallelism: a GPipe microbatch schedule over a mesh axis.

The reference has no distributed code (SURVEY.md §2.7), and the SVD-XT
UNet's ~1.5B params fit a single chip's HBM comfortably — so pipeline
parallelism is NOT on this framework's production path (DP over
scenes/pairs, the 2-way direction split, TP and frame-axis SP are, see
the sibling modules). It is provided as a framework capability for
models that outgrow one chip: a classic GPipe schedule written the TPU
way — ``shard_map`` over a "stage" mesh axis, activations handed to the
next stage with ``lax.ppermute`` over ICI, the fill/drain bubble handled
by masking, no host round-trips inside the schedule.

Uniform-stage restriction: every device runs the same traced program, so
``stage_fn(stage_params, x) -> y`` must have ``y.shape == x.shape`` and
one shared structure for all stages (per-stage weights differ; shapes do
not). Transformer/resnet towers — including this repo's
``BasicTransformerBlock`` stacks — have exactly this shape; a UNet's
changing resolutions would need per-stage padding to a common activation
shape.

There is deliberately no expert parallelism here: nothing in the
reference (or in SVD/DUSt3R/GMFlow/CLIP) is a mixture-of-experts, so an
"ep" axis has no load to carry — documented absence, not an omission.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def make_gpipe(mesh: Mesh, stage_fn, n_stages: int, axis: str = "stage"):
    """Build a GPipe runner for ``n_stages`` stages over ``mesh[axis]``.

    ``stage_fn(params_i, x)`` is one stage; the returned
    ``run(stacked_params, x, n_microbatch)`` applies stage 0..S-1 in
    sequence, pipelined over microbatches. ``stacked_params`` is a pytree
    whose leaves have a leading stage axis of length ``n_stages`` (stack
    per-stage params with ``jax.tree.map(lambda *a: jnp.stack(a), *ps)``);
    it is sharded one-stage-per-device. ``x`` is (B, ...) with B divisible
    by ``n_microbatch``. Output is replicated.

    Schedule: S + M - 1 ticks; at tick t device s computes microbatch
    t - s (masked outside [0, M)), then ppermutes its activation to s+1.
    The bubble is the standard GPipe (S-1)/(S-1+M) — amortize with more
    microbatches.
    """
    if mesh.shape[axis] != n_stages:
        raise ValueError(f"mesh axis {axis!r} has size {mesh.shape[axis]}, "
                         f"want {n_stages}")
    fwd = [(i, i + 1) for i in range(n_stages - 1)]

    def local(params, xs):                       # runs per-device
        p = jax.tree.map(lambda a: a[0], params)    # this device's stage
        s = jax.lax.axis_index(axis)
        m = xs.shape[0]
        last = n_stages - 1

        def tick(carry, t):
            acc, cur = carry
            # stage 0 feeds microbatch t; everyone else consumes the
            # activation ppermuted in at the previous tick
            inp = jnp.where(s == 0, xs[jnp.clip(t, 0, m - 1)], cur)
            out = stage_fn(p, inp)
            # collect finished microbatch t-last at the final stage
            oi = t - last
            take = (s == last) & (oi >= 0) & (oi < m)
            ci = jnp.clip(oi, 0, m - 1)
            acc = acc.at[ci].set(jnp.where(take, out, acc[ci]))
            nxt = jax.lax.ppermute(out, axis, fwd)
            return (acc, nxt), None

        acc0 = jnp.zeros_like(xs)
        (acc, _), _ = jax.lax.scan(
            tick, (acc0, jnp.zeros_like(xs[0])),
            jnp.arange(m + n_stages - 1))
        # result lives on the last stage only; psum broadcasts it
        return jax.lax.psum(jnp.where(s == last, acc, 0.0), axis)

    shmapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P()), out_specs=P(),
        check_vma=False)

    @functools.partial(jax.jit, static_argnums=2)
    def run(stacked_params, x, n_microbatch: int):
        b = x.shape[0]
        if b % n_microbatch:
            raise ValueError(f"batch {b} not divisible by {n_microbatch}")
        xs = x.reshape((n_microbatch, b // n_microbatch) + x.shape[1:])
        out = shmapped(stacked_params, xs)
        return out.reshape(x.shape)

    return run
