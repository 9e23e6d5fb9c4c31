"""Training-step profiler with axon-safe fences — reproduces docs/PERF.md.

    PYTHONPATH=/root/.axon_site:. python tools/prof_train.py [--stages]

Measures, at the bench shapes (VGG-16 MultiPath, batch 8, 640x640, 1000
proposals, 64 ROIs/img, freeze=2): the chained steady-state step (the
headline ms/step) and optionally the per-stage fwd/fwd+bwd split.

Fence rules (learned the hard way; docs/PERF.md "Startup costs"):
- `jax.block_until_ready` does NOT drain the axon relay queue; only
  materializing a fresh output scalar (float(...)) is a real fence.
- NEVER fence on a param leaf: frozen+donated leaves alias across steps and
  the fence returns instantly (this once produced a bogus 40 ms/step).
- The FIRST EXECUTION after a compile costs ~80-130 s through the relay on
  top of the ~110 s compile; absorb it with a real fence before timing.
- Do not run while the CPU test suite runs: the 1-core host starves tunnel
  dispatch (measured 6.6 s/step for an ~100 ms step).
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_batch(rng, B=8, P=1000, G=16, size=640):
    from multipathnet_tpu.train.loop import Batch

    def bx(n):
        lim = max(size - 140, 8)
        x1 = rng.uniform(0, lim, n)
        y1 = rng.uniform(0, lim, n)
        w = rng.uniform(8, min(120, size // 2), n)
        h = rng.uniform(8, min(120, size // 2), n)
        return np.stack([x1, y1, np.minimum(x1 + w, size - 1),
                         np.minimum(y1 + h, size - 1)], -1).astype(np.float32)

    return Batch(
        images=jnp.asarray(rng.integers(0, 255, (B, size, size, 3)),
                           jnp.uint8),
        src_hws=jnp.full((B, 2), float(size), jnp.float32),
        proposals=jnp.asarray(bx(B * P).reshape(B, P, 4)),
        prop_mask=jnp.ones((B, P), bool),
        gt_boxes=jnp.asarray(bx(B * G).reshape(B, G, 4)),
        gt_classes=jnp.asarray(rng.integers(1, 80, (B, G)), jnp.int32),
        gt_mask=jnp.ones((B, G), bool),
    )


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stages", action="store_true",
                   help="also profile fwd / fwd+bwd per stage")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--rois", type=int, default=64)
    p.add_argument("--freeze", type=int, default=2)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    from multipathnet_tpu.core.config import preset
    from multipathnet_tpu.train.loop import Trainer

    cfg = preset("multipath_vgg16_batched")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, image_size=(args.size, args.size),
                                 max_proposals=1000,
                                 rois_per_image=args.rois),
        train=dataclasses.replace(cfg.train, batch_size=args.batch,
                                  freeze_backbone_stages=args.freeze),
    )
    tr = Trainer(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, B=args.batch, size=args.size)

    state = tr.init_state(0)
    dev = tr.shard_batch(batch)
    t0 = time.time()
    state, m = tr._step(state, dev)
    _ = float(m["loss"])  # absorbs compile + slow first execution
    print(f"first step (compile + first exec): {time.time() - t0:.1f}s")

    t0 = time.time()
    state, m = tr._step(state, dev)
    _ = float(m["loss"])
    print(f"fenced single step: {(time.time() - t0) * 1e3:.1f} ms")

    t0 = time.time()
    for _ in range(args.iters):
        state, m = tr._step(state, dev)
    _ = float(m["loss"])  # state-chaining forces every step before this one
    dt = (time.time() - t0) / args.iters
    print(f"chained: {dt * 1e3:.1f} ms/step = {args.batch / dt:.1f} img/s")

    if not args.stages:
        return

    from multipathnet_tpu.models.multipath import MultiPathNet
    from multipathnet_tpu.utils.profiling import timed

    model = tr.model
    params = state.params
    rngs = {"dropout": jax.random.key(1)}
    images = jnp.asarray(rng.standard_normal(
        (args.batch, args.size, args.size, 3)), jnp.float32)
    # realistic proposal boxes at the stage shapes (same generator as the
    # chained-step batch)
    rois = batch.proposals[:, : args.rois, :]

    def stage(label, f, *a):
        t, _ = timed(jax.jit(f), *a, iters=args.iters)
        print(f"{label:<34} {t * 1e3:7.1f} ms")

    def feats_of(p, im):
        return model.apply(p, im, train=True, method=MultiPathNet.features,
                           rngs=rngs)

    stage("trunk+reduce fwd", feats_of, params, images)

    def loss_feats(p, im):
        f = feats_of(p, im)
        return sum(jnp.sum(v.astype(jnp.float32) ** 2)
                   for v in f.values()) * 1e-6

    stage("trunk fwd+bwd", jax.grad(loss_feats), params, images)

    feats = jax.jit(feats_of)(params, images)

    def pool_of(f, p, r):
        return model.apply(p, f, r, (args.size, args.size), True,
                           method=MultiPathNet.pool_rois, rngs=rngs)

    stage("pool fwd", pool_of, feats, params, rois)

    def loss_pool(f, p, r):
        return jnp.sum(pool_of(f, p, r).astype(jnp.float32) ** 2) * 1e-6

    stage("pool fwd+bwd (d/dfeats)", jax.grad(loss_pool), feats, params, rois)

    pooled = jax.jit(pool_of)(feats, params, rois)

    def loss_heads(p, po):
        s, d = model.apply(p, po, train=True,
                           method=MultiPathNet.predict_rois, rngs=rngs)
        return (jnp.sum(s.astype(jnp.float32) ** 2)
                + jnp.sum(d.astype(jnp.float32) ** 2)) * 1e-6

    stage("heads fwd+bwd", jax.grad(loss_heads), params, pooled)

    def loss_full(p, im, r):
        s, d = model.apply(p, im, r, train=True, rngs=rngs)
        return (jnp.sum(s.astype(jnp.float32) ** 2)
                + jnp.sum(d.astype(jnp.float32) ** 2)) * 1e-6

    stage("full fwd+bwd", jax.grad(loss_full), params, images, rois)


if __name__ == "__main__":
    main()
