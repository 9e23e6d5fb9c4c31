"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): images/sec/chip for MultiPath VGG-16 at 1000
proposals/img, proposals-to-detections fully on device (batched inference,
config 3). vs_baseline compares against the Fast R-CNN paper's published
test speed — ~0.3 s/image (~3.33 img/s) for VGG-16 on a K40, excluding
proposal generation (BASELINE.md; the reference repo's own table is
unrecovered, see SURVEY.md §6).

Headline preset is the full SERVING configuration (int8 FC heads + the Fast
R-CNN §3.1 truncated-SVD ranks fc6=1024/fc7=256 — the paper's own VGG-16
deployment compression): same float checkpoint, factorized then quantized at
load (ops/lowrank.py + ops/quant.py). Accuracy: pinned on trained checkpoints
by tests/test_quant.py, tests/test_lowrank.py (CPU) and
tests_tpu/test_flows_tpu.py + the PERF.md serving-accuracy table (on-chip).

So the longitudinal BENCH_r* series separates CONFIG changes from KERNEL
changes (r3 VERDICT weak #7), the same JSON line carries companion numbers
for the bf16 model and the plain-int8 config measured in the same process:
  {"metric": ..., "value": <headline>, ..., "companions": {"bf16": x, "int8": y}}
r1-r3 headline lineage: bf16 75.4 (r2) -> int8 105.1 (r3) -> int8+svd (r4-).

Usage: python bench.py [--batch 8] [--proposals 1000] [--iters 20]
                       [--preset NAME] [--no-companions]
Extra diagnostics go to stderr; stdout carries exactly one JSON line.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

BASELINE_IMG_PER_SEC = 1.0 / 0.3  # Fast R-CNN paper, VGG-16, K40


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_inputs(args):
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
    return images, src_hws, proposals, prop_mask


def measure(preset_name: str, args, raw_inputs) -> float:
    """Build the preset's model with random on-device params, jit the full
    proposals->detections graph, time `iters` batches. Params and executable
    are released on return so configs can run back to back in one process."""
    import jax
    import jax.numpy as jnp

    from multipathnet_tpu.core.config import preset
    from multipathnet_tpu.eval.detect import detect_batch
    from multipathnet_tpu.models.multipath import build_model

    cfg = preset(preset_name)
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data,
                                 image_size=(args.canvas, args.canvas),
                                 max_proposals=args.proposals),
    )
    if args.backbone:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, backbone=args.backbone))
    model = build_model(cfg.model)

    log(f"[{preset_name}] init {cfg.model.backbone} params...")
    t0 = time.time()
    init_img = jnp.zeros((1, args.canvas, args.canvas, 3), jnp.float32)
    init_rois = jnp.asarray([[[0, 0, 64, 64]]], jnp.float32)
    # shape-only init + ON-DEVICE random fill: a full model.init compile
    # measured 100-250s through the remote compiler, and a HOST fill
    # measured 45-70s (2 GB of f64 RNG + tunnel transfer; PERF.md startup
    # table). One tiny jitted RNG graph generates the tree in-place.
    # Quantized/factored presets follow the serving flow: the model's OWN
    # layout (factor layers included) is initialized in float, then
    # ops.quant.quantize_head_params runs as the load-time transform.
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
    log(f"[{preset_name}] params: {n_params/1e6:.1f}M on device "
        f"({time.time()-t0:.1f}s)")

    fn = jax.jit(lambda pa, im, hw, pr, pm: detect_batch(
        pa, model, cfg, im, hw, pr, pm))
    inputs = tuple(jnp.asarray(x) for x in raw_inputs)

    # NOTE: jax.block_until_ready can return without draining the axon relay
    # queue (observed 2026-08-16: 10 queued 25ms kernels "blocked" in 0.03ms);
    # materializing a scalar is the only reliable completion fence here.
    def fence(o):
        return float(jnp.sum(o["scores"]) + jnp.sum(o["valid"]))

    # cold-start decomposition in the log (PERF.md "Cold start"): the first
    # executable of a PROCESS pays 20-65s of relay staging; later
    # executables in the same process stage in <1s. The persistent compile
    # cache is off by default here — deserialized executables measured
    # 448-535s of staging vs fresh compiles' 20-65s (2026-08-19).
    log(f"[{preset_name}] compile + warmup...")
    t0 = time.time()
    compiled = fn.lower(params, *inputs).compile()
    t1 = time.time()
    out = compiled(params, *inputs)
    fence(out)
    t2 = time.time()
    log(f"[{preset_name}] first call {t2-t0:.1f}s (trace+compile {t1-t0:.1f}s,"
        f" first-exec staging {t2-t1:.1f}s); "
        f"detections img0: {int(np.asarray(out['valid'][0]).sum())}")
    fence(compiled(params, *inputs))

    t0 = time.time()
    for _ in range(args.iters):
        out = compiled(params, *inputs)
    fence(out)
    dt = time.time() - t0
    ips = args.batch * args.iters / dt
    log(f"[{preset_name}] {args.iters} iters x {args.batch} imgs in {dt:.2f}s"
        f" = {ips:.1f} img/s")
    return ips


def tag_for(cfg_model) -> str:
    parts = []
    if cfg_model.head_quant == "int8":
        parts.append("int8")
    if cfg_model.fc6_rank or cfg_model.fc7_rank:
        parts.append(f"SVD({cfg_model.fc6_rank}/{cfg_model.fc7_rank})")
    return ", " + "+".join(parts) + " FC heads" if parts else ""


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--proposals", type=int, default=1000)
    p.add_argument("--canvas", type=int, default=640)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--preset", default="multipath_vgg16_int8_svd")
    p.add_argument("--backbone", default="",
                   help="override cfg.model.backbone (e.g. resnet101)")
    p.add_argument("--no-companions", action="store_true",
                   help="headline preset only (skip the bf16/int8 companion "
                        "measurements)")
    p.add_argument("--compile-cache", action="store_true",
                   help="enable the persistent XLA compilation cache. OFF "
                        "by default for bench: executables DESERIALIZED "
                        "from the cache measured 448-535s of first-exec "
                        "relay staging vs 20-65s for freshly compiled ones "
                        "(5 back-to-back runs, 2026-08-19; PERF.md 'Cold "
                        "start') — the ~30s compile saving is not worth a "
                        "~7x staging regression on this relay")
    args = p.parse_args()

    cache_dir = None
    if args.compile_cache:
        from multipathnet_tpu.utils.compile_cache import (
            enable_compilation_cache)

        cache_dir = enable_compilation_cache()

    import jax

    from multipathnet_tpu.core.config import preset

    log(f"backend={jax.default_backend()} devices={jax.devices()} "
        f"compile_cache={cache_dir}")

    raw_inputs = make_inputs(args)
    ips = measure(args.preset, args, raw_inputs)

    companions = {}
    if not args.no_companions:
        # same kernels, serving transforms off/partial — keeps the BENCH_r*
        # trend interpretable across config changes (r3 VERDICT weak #7)
        for key, name in (("bf16", "multipath_vgg16_batched"),
                          ("int8", "multipath_vgg16_int8")):
            if name == args.preset:
                companions[key] = round(ips, 3)
                continue
            companions[key] = round(measure(name, args, raw_inputs), 3)

    cfg = preset(args.preset)
    if args.backbone:
        # keep the emitted metric label consistent with what measure() built
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, backbone=args.backbone))
    b, p_, s = args.batch, args.proposals, args.canvas
    record = {
        "metric": f"images/sec/chip (MultiPath {cfg.model.backbone}"
                  f"{tag_for(cfg.model)}, {p_} proposals/img, "
                  f"{s}x{s}, batch {b}, proposals->detections on device)",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_IMG_PER_SEC, 3),
    }
    if companions:
        record["companions"] = companions
    print(json.dumps(record))


if __name__ == "__main__":
    main()
