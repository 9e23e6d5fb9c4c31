"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): images/sec/chip for MultiPath VGG-16 at 1000
proposals/img, proposals-to-detections fully on device (batched inference,
config 3). vs_baseline compares against the Fast R-CNN paper's published
test speed — ~0.3 s/image (~3.33 img/s) for VGG-16 on a K40, excluding
proposal generation (BASELINE.md; the reference repo's own table is
unrecovered, see SURVEY.md §6).

Default preset is the SERVING configuration (int8 FC heads, ops/quant.py):
same float checkpoint quantized at load, AP-preservation pinned by
tests/test_quant.py (CPU) and tests_tpu/test_flows_tpu.py (on-chip compiled
path). `--preset multipath_vgg16_batched` benches the bf16 model.

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
    p.add_argument("--preset", default="multipath_vgg16_int8")
    p.add_argument("--backbone", default="",
                   help="override cfg.model.backbone (e.g. resnet101)")
    args = p.parse_args()

    import dataclasses

    from multipathnet_tpu.utils.compile_cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from multipathnet_tpu.core.config import preset
    from multipathnet_tpu.eval.detect import detect_batch
    from multipathnet_tpu.models.multipath import build_model

    log(f"backend={jax.default_backend()} devices={jax.devices()} "
        f"compile_cache={cache_dir}")

    cfg = preset(args.preset)
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data,
                                 image_size=(args.canvas, args.canvas),
                                 max_proposals=args.proposals),
    )
    if args.backbone:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, backbone=args.backbone))
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
    # shape-only init + ON-DEVICE random fill: a full model.init compile
    # measured 100-250s through the remote compiler, and a HOST fill
    # measured 45-70s (2 GB of f64 RNG + tunnel transfer; PERF.md startup
    # table). One tiny jitted RNG graph generates the tree in-place.
    # Quantized presets follow the serving flow: generate the FLOAT tree,
    # then jit ops.quant.quantize_head_params over it (load-time transform).
    float_model = (build_model(
        dataclasses.replace(cfg.model, head_quant="none"))
        if cfg.model.head_quant != "none" else model)
    shapes = jax.eval_shape(
        lambda: float_model.init(jax.random.key(0), init_img, init_rois))
    leaves, treedef = jax.tree.flatten(shapes)

    @jax.jit
    def make_params(key):
        ks = jax.random.split(key, len(leaves))
        return [jax.random.normal(k, l.shape, l.dtype) * 0.02
                for k, l in zip(ks, leaves)]

    params = jax.tree.unflatten(treedef, make_params(jax.random.key(0)))
    if cfg.model.head_quant != "none":
        from multipathnet_tpu.ops.quant import quantize_head_params

        params = jax.jit(quantize_head_params)(params)
    jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    log(f"params: {n_params/1e6:.1f}M on device ({time.time()-t0:.1f}s)")

    fn = jax.jit(lambda pa, im, hw, pr, pm: detect_batch(
        pa, model, cfg, im, hw, pr, pm))

    inputs = (jnp.asarray(images), jnp.asarray(src_hws),
              jnp.asarray(proposals), jnp.asarray(prop_mask))

    # NOTE: jax.block_until_ready can return without draining the axon relay
    # queue (observed 2026-08-16: 10 queued 25ms kernels "blocked" in 0.03ms);
    # materializing a scalar is the only reliable completion fence here.
    def fence(o):
        return float(jnp.sum(o["scores"]) + jnp.sum(o["valid"]))

    # cold-start decomposition in the log (VERDICT r2 item 3: the 754s
    # first call was opaque): trace+compile is cacheable (persistent cache:
    # 33.5s -> 0.4s warm, measured 2026-08-17); the first-execution program
    # staging through the axon relay is not, and varies 45-310s for this
    # ~50 MB executable (the r2 754s reading was such an outlier, stacked
    # on an uncached compile).
    log("compile + warmup...")
    t0 = time.time()
    compiled = fn.lower(params, *inputs).compile()
    t1 = time.time()
    out = compiled(params, *inputs)
    fence(out)
    t2 = time.time()
    log(f"first call {t2-t0:.1f}s (trace+compile {t1-t0:.1f}s, "
        f"first-exec staging {t2-t1:.1f}s); "
        f"detections img0: {int(np.asarray(out['valid'][0]).sum())}")
    fn = compiled
    fence(fn(params, *inputs))

    t0 = time.time()
    for _ in range(args.iters):
        out = fn(params, *inputs)
    fence(out)
    dt = time.time() - t0
    ips = args.batch * args.iters / dt
    log(f"{args.iters} iters x {b} imgs in {dt:.2f}s")

    quant_tag = (f", int8 FC heads" if cfg.model.head_quant == "int8" else "")
    print(json.dumps({
        "metric": f"images/sec/chip (MultiPath {cfg.model.backbone}"
                  f"{quant_tag}, {p_} proposals/img, "
                  f"{s}x{s}, batch {b}, proposals->detections on device)",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
