"""VERDICT r4 #3: proposal quality AT BENCH SCALE (640², top-400).

Every r4 quality number (med IoU / frac@.5 / oracle / recall@.5) was
measured on the 64px fixture at top-32; the 640²/top-400 row of PERF.md
config-5 had speed only. This trains the proposal net at the production
canvas on a multi-object, aspect-diverse synthetic set and measures the
same four quality numbers at the DeepMask operating point (top-400 —
BASELINE/papers' ~400-proposal sweet spot), stage-1 vs cascade.

    PYTHONPATH=/root/.axon_site:. python tools/prop_quality_scale.py \
        [--epochs 60] [--size 640] [--images 16] [--top-k 400]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import tempfile
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--images", type=int, default=16)
    p.add_argument("--max-objects", type=int, default=8)
    p.add_argument("--top-k", type=int, default=400)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--quality-every", type=int, default=20)
    args = p.parse_args()

    from multipathnet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multipathnet_tpu.core.config import preset
    from multipathnet_tpu.data import synthetic
    from multipathnet_tpu.data.coco import CocoLoader
    from multipathnet_tpu.data.pipeline import DetectionPipeline
    from multipathnet_tpu.data.proposals import ProposalStore
    from multipathnet_tpu.data.transforms import normalize
    from multipathnet_tpu.models.sharpmask import generate_proposals
    from multipathnet_tpu.ops.boxes import iou_matrix
    from multipathnet_tpu.train.proposal import ProposalTrainer

    s = args.size
    cfg = preset("sharpmask_multipath_e2e")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, image_size=(s, s)),
        train=dataclasses.replace(cfg.train, lr=args.lr, warmup_steps=0,
                                  batch_size=4),
    )
    log(f"backend={jax.default_backend()} size={s} top_k={args.top_k} "
        f"epochs={args.epochs}")

    root = tempfile.mkdtemp(prefix="mpnet_pq_")
    fx = synthetic.generate(root, num_images=args.images, image_size=s,
                            num_classes=8, max_objects=args.max_objects,
                            proposals_per_image=32, seed=13)
    loader = CocoLoader(fx["annotations"], fx["images"])
    props = ProposalStore.load(fx["proposals"])
    pipe = DetectionPipeline(loader, props, cfg.data,
                             batch_size=cfg.train.batch_size, seed=0,
                             with_masks=True, mask_size=28)
    trainer = ProposalTrainer(cfg, mesh=None)
    state = trainer.init_state()
    log("state initialized")

    # jit once with top_k static; params are args (no per-eval retrace)
    gen = {
        r: jax.jit(lambda pa, x, r_=r: generate_proposals(
            trainer.model, pa, x, top_k=args.top_k, with_masks=False,
            refine=r_))
        for r in (False, True)
    }
    imgs = [jnp.asarray(normalize(jnp.asarray(
        loader.load_image(i).astype(np.float32))))[None]
        for i in range(len(loader))]
    anns = [loader.annotations(i) for i in range(len(loader))]

    def quality(params, refine):
        ious, gt_best = [], []
        for x, ann in zip(imgs, anns):
            out = gen[refine](params, x)
            iou = np.asarray(iou_matrix(jnp.asarray(out["boxes"][0]),
                                        jnp.asarray(ann["boxes"])))
            ious.append(iou.max(1))
            gt_best.append(iou.max(0))
        ious = np.concatenate(ious)
        gt_best = np.concatenate(gt_best)
        return (float(np.median(ious)), float((ious >= 0.5).mean()),
                float(gt_best.mean()), float((gt_best >= 0.5).mean()))

    n_gt = sum(len(a["boxes"]) for a in anns)
    log(f"dataset: {len(loader)} images, {n_gt} GT objects")

    t0 = time.time()
    step = 0
    for ep in range(args.epochs):
        for batch in pipe.epoch(ep):
            state, m = trainer.step(state, batch)
            step += 1
        if (ep + 1) % args.quality_every == 0 or ep + 1 == args.epochs:
            loss = float(m["loss"])
            med1, f1, o1, r1 = quality(state.params, False)
            med2, f2, o2, r2 = quality(state.params, True)
            log(f"[ep {ep+1} step {step} loss {loss:.3f} "
                f"{(time.time()-t0):.0f}s] stage1 med={med1:.3f} "
                f"f50={f1:.3f} oracle={o1:.3f} rec={r1:.3f} | cascade "
                f"med={med2:.3f} f50={f2:.3f} oracle={o2:.3f} rec={r2:.3f}")
    log("done")


if __name__ == "__main__":
    main()
