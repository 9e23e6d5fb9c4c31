"""Inference-stage profiler with axon-safe fences — reproduces the PERF.md
eval stage tables (resize / trunk / pool / heads / NMS / full graph).

    PYTHONPATH=/root/.axon_site:. python tools/prof_eval.py \
        [--preset multipath_vgg16_int8] [--backbone resnet101] [--batch 8]

Fence rules are prof_train.py's (materialize a fresh output scalar; never
run while the CPU suite runs — the 1-core host starves tunnel dispatch).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def timed(fn, fence, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn()
    fence(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    fence(out)
    return (time.time() - t0) / iters * 1e3, out


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="multipath_vgg16_int8")
    p.add_argument("--backbone", default="")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--proposals", type=int, default=1000)
    p.add_argument("--canvas", type=int, default=640)
    p.add_argument("--compile-cache", action="store_true",
                   help="enable the persistent XLA compilation cache. OFF "
                        "by default, matching bench.py: cache-deserialized "
                        "executables measured 448-535s of first-exec relay "
                        "staging vs 20-65s fresh (PERF.md 'Cold start')")
    args = p.parse_args()

    if args.compile_cache:
        from multipathnet_tpu.utils.compile_cache import (
            enable_compilation_cache)

        enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multipathnet_tpu.core.config import preset
    from multipathnet_tpu.data import transforms
    from multipathnet_tpu.eval.detect import detect_batch, score_batch
    from multipathnet_tpu.models.multipath import MultiPathNet, build_model
    from multipathnet_tpu.ops import nms as nms_ops
    from multipathnet_tpu.ops.quant import quantize_head_params

    cfg = preset(args.preset)
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, image_size=(args.canvas, args.canvas),
        max_proposals=args.proposals))
    if args.backbone:
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, backbone=args.backbone))
    model = build_model(cfg.model)
    log(f"backend={jax.default_backend()} preset={args.preset} "
        f"backbone={cfg.model.backbone} quant={cfg.model.head_quant}")

    b, pn, s = args.batch, args.proposals, args.canvas
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (b, s, s, 3)), jnp.uint8)
    hws = jnp.full((b, 2), float(s), jnp.float32)
    x1 = rng.uniform(0, s * 0.7, (b, pn)).astype(np.float32)
    y1 = rng.uniform(0, s * 0.7, (b, pn)).astype(np.float32)
    w = rng.uniform(16, s * 0.3, (b, pn)).astype(np.float32)
    h = rng.uniform(16, s * 0.3, (b, pn)).astype(np.float32)
    props = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], -1))
    pmask = jnp.ones((b, pn), bool)

    # on-device param fill (bench.py trick), float tree -> quantize if serving
    float_model = (build_model(dataclasses.replace(
        cfg.model, head_quant="none"))
        if cfg.model.head_quant != "none" else model)
    shapes = jax.eval_shape(lambda: float_model.init(
        jax.random.key(0), jnp.zeros((1, s, s, 3)), jnp.zeros((1, 1, 4))))
    leaves, td = jax.tree.flatten(shapes)

    @jax.jit
    def mk(key):
        ks = jax.random.split(key, len(leaves))
        return [jax.random.normal(k, l.shape, l.dtype) * 0.02
                for k, l in zip(ks, leaves)]

    params = jax.tree.unflatten(td, mk(jax.random.key(0)))
    if cfg.model.head_quant != "none":
        params = jax.jit(quantize_head_params)(params)
    jax.block_until_ready(params)

    fsc = lambda o: float(sum(jnp.sum(x.astype(jnp.float32))
                              for x in jax.tree.leaves(o)))

    # stage graphs (each jitted in isolation; inputs precomputed on device)
    resize = jax.jit(lambda im, hw: transforms.batch_resize_to_canvas(
        im, (s, s), hw, preprocess=cfg.model.preprocess))
    ms, (canvases, scales) = timed(lambda: resize(images, hws), fsc)
    log(f"resize/normalize: {ms:.1f} ms")

    feats_fn = jax.jit(lambda pa, c: model.apply(
        pa, c, method=MultiPathNet.features))
    ms, feats = timed(lambda: feats_fn(params, canvases), fsc)
    log(f"trunk + reduce:   {ms:.1f} ms")

    rois = props * scales[:, None, None]
    pool_fn = jax.jit(lambda pa, f, r: model.apply(
        pa, f, r, (s, s), method=MultiPathNet.pool_rois))
    ms, pooled = timed(lambda: pool_fn(params, feats, rois), fsc)
    log(f"pool_rois:        {ms:.1f} ms")

    heads_fn = jax.jit(lambda pa, po: model.apply(
        pa, po, method=MultiPathNet.predict_rois))
    ms, (scores, deltas) = timed(lambda: heads_fn(params, pooled), fsc)
    log(f"heads:            {ms:.1f} ms")

    score_fn = jax.jit(lambda pa: score_batch(pa, model, cfg, images, hws,
                                              props))
    ms, (boxes, probs) = timed(lambda: score_fn(params), fsc)
    log(f"score_batch:      {ms:.1f} ms (resize+trunk+pool+heads+decode)")

    nms_fn = jax.jit(lambda bx, pr, m: jax.vmap(
        lambda b_, p_, m_: nms_ops.multiclass_nms(
            b_[:, 1:, :], p_[:, 1:], m_,
            score_threshold=cfg.eval.score_threshold,
            iou_threshold=cfg.eval.nms_iou_threshold,
            pre_nms_per_class=cfg.eval.pre_nms_per_class,
            max_detections=cfg.eval.max_detections))(bx, pr, m))
    ms, _ = timed(lambda: nms_fn(boxes, probs, pmask), fsc)
    log(f"multiclass NMS:   {ms:.1f} ms")

    full = jax.jit(lambda pa: detect_batch(pa, model, cfg, images, hws,
                                           props, pmask))
    ms, _ = timed(lambda: full(params), fsc)
    log(f"full detect_batch: {ms:.1f} ms  "
        f"({args.batch / ms * 1e3:.1f} img/s)")

    # fused PREFIX ablation: each row jits resize->...->stage as ONE graph,
    # so boundary materialization matches the real detect_batch (the
    # isolated rows above overstate pool/heads — they materialize the
    # 1.6 GB pooled tensor at a jit boundary the fused graph doesn't have).
    # Differences between consecutive rows are honest fused stage costs.
    log("-- fused prefix ablation (deltas are honest stage costs) --")

    def upto_trunk(pa):
        canv, sc = transforms.batch_resize_to_canvas(
            images, (s, s), hws, preprocess=cfg.model.preprocess)
        return model.apply(pa, canv, method=MultiPathNet.features), sc

    ms_t, _ = timed(lambda: jax.jit(upto_trunk)(params), fsc)
    log(f"fused resize+trunk:        {ms_t:.1f} ms")

    def upto_pool(pa):
        fts, sc = upto_trunk(pa)
        r_ = props * sc[:, None, None]
        return model.apply(pa, fts, r_, (s, s), method=MultiPathNet.pool_rois)

    ms_p, _ = timed(lambda: jax.jit(upto_pool)(params), fsc)
    log(f"fused ..+pool:             {ms_p:.1f} ms  (pool Δ {ms_p - ms_t:.1f})")

    if cfg.model.head_quant == "int8":
        from multipathnet_tpu.ops import quant as quant_ops

        def upto_quant(pa):
            pooled_ = upto_pool(pa)
            b_, f_, r_, g_, _, c_ = pooled_.shape
            bias = pa["params"]["head"]["skip_bias"]
            x = jax.nn.relu(pooled_.astype(jnp.bfloat16)
                            + bias.astype(jnp.bfloat16))
            return quant_ops.quantize_rows(
                x.reshape(b_, f_, r_, g_ * g_ * c_))

        ms_q, _ = timed(lambda: jax.jit(upto_quant)(params), fsc)
        log(f"fused ..+bias/relu/quant:  {ms_q:.1f} ms  "
            f"(quant Δ {ms_q - ms_p:.1f})")

    log("(score_batch = fused ..+heads+decode; detect_batch = ..+NMS)")


if __name__ == "__main__":
    main()
