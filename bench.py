"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): images/sec/chip for MultiPath VGG-16 at 1000
proposals/img, proposals-to-detections fully on device (batched inference,
config 3). vs_baseline compares against the Fast R-CNN paper's published
test speed — ~0.3 s/image (~3.33 img/s) for VGG-16 on a K40, excluding
proposal generation (BASELINE.md; the reference repo's own table is
unrecovered, see SURVEY.md §6).

Usage: python bench.py [--batch 8] [--proposals 1000] [--iters 20]
Extra diagnostics go to stderr; stdout carries exactly one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_IMG_PER_SEC = 1.0 / 0.3  # Fast R-CNN paper, VGG-16, K40


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--proposals", type=int, default=1000)
    p.add_argument("--canvas", type=int, default=640)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--preset", default="multipath_vgg16_batched")
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from multipathnet_tpu.core.config import preset
    from multipathnet_tpu.eval.detect import detect_batch
    from multipathnet_tpu.models.multipath import build_model

    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    cfg = preset(args.preset)
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data,
                                 image_size=(args.canvas, args.canvas),
                                 max_proposals=args.proposals),
    )
    model = build_model(cfg.model)

    rng = np.random.default_rng(0)
    b, p_, s = args.batch, args.proposals, args.canvas
    images = rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8)
    src_hws = np.full((b, 2), float(s), np.float32)
    x1 = rng.uniform(0, s * 0.7, (b, p_)).astype(np.float32)
    y1 = rng.uniform(0, s * 0.7, (b, p_)).astype(np.float32)
    w = rng.uniform(16, s * 0.3, (b, p_)).astype(np.float32)
    h = rng.uniform(16, s * 0.3, (b, p_)).astype(np.float32)
    proposals = np.stack([x1, y1, x1 + w, y1 + h], -1)
    prop_mask = np.ones((b, p_), bool)

    log(f"init {cfg.model.backbone} params...")
    t0 = time.time()
    init_img = jnp.zeros((1, s, s, 3), jnp.float32)
    init_rois = jnp.asarray([[[0, 0, 64, 64]]], jnp.float32)
    # shape-only init + host-side random fill: avoids a full init compile on
    # device (measured 100-250s for VGG-16 through the tunnel)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0), init_img, init_rois))
    host_rng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda sd: jnp.asarray(
            host_rng.standard_normal(sd.shape) * 0.02, sd.dtype),
        shapes)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    log(f"params: {n_params/1e6:.1f}M ({time.time()-t0:.1f}s)")

    fn = jax.jit(lambda pa, im, hw, pr, pm: detect_batch(
        pa, model, cfg, im, hw, pr, pm))

    inputs = (jnp.asarray(images), jnp.asarray(src_hws),
              jnp.asarray(proposals), jnp.asarray(prop_mask))

    # NOTE: jax.block_until_ready can return without draining the axon relay
    # queue (observed 2026-08-16: 10 queued 25ms kernels "blocked" in 0.03ms);
    # materializing a scalar is the only reliable completion fence here.
    def fence(o):
        return float(jnp.sum(o["scores"]) + jnp.sum(o["valid"]))

    log("compile + warmup...")
    t0 = time.time()
    out = fn(params, *inputs)
    fence(out)
    log(f"first call {time.time()-t0:.1f}s; "
        f"detections img0: {int(np.asarray(out['valid'][0]).sum())}")
    fence(fn(params, *inputs))

    t0 = time.time()
    for _ in range(args.iters):
        out = fn(params, *inputs)
    fence(out)
    dt = time.time() - t0
    ips = args.batch * args.iters / dt
    log(f"{args.iters} iters x {b} imgs in {dt:.2f}s")

    print(json.dumps({
        "metric": f"images/sec/chip (MultiPath {cfg.model.backbone}, "
                  f"{p_} proposals/img, "
                  f"{s}x{s}, batch {b}, proposals->detections on device)",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
