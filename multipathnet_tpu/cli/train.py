"""Training entry point — train.lua analog (SURVEY.md §2.1, §3.1).

    python -m multipathnet_tpu.cli.train --preset multipath_vgg16_train \
        --dataset-root /data/coco --split trainval35k
    python -m multipathnet_tpu.cli.train --preset tiny --synthetic --steps 60

`--proposal-net` trains the SharpMask-style proposal network instead (the
reference's DeepMask/SharpMask sibling repo had its own train entry; here it
is a mode). Its checkpoints feed `cli.export_proposals
--proposal-checkpoint-dir` and `cli.demo --proposal-source sharpmask`, and
the final eval reports proposal recall@IoU0.5 instead of detection AP.

Checkpoints + config dump + JSONL metrics land in cfg.train.checkpoint_dir;
`--resume` continues exactly (params, opt state, step, PRNG).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import numpy as np

from multipathnet_tpu.cli import common


def _proposal_recall(trainer, params, loader, cfg, top_k: int = 64,
                     max_images: int = 64) -> dict:
    """Proposal-quality eval for --proposal-net: recall@top_k at IoU 0.5 and
    mean best-IoU over non-crowd GT (the DeepMask-family operating metrics).

    Images are resized onto the TRAINING canvas first — the net's anchors
    are calibrated to cfg.data.image_size (train/proposal.py), so scoring at
    raw resolution would measure an operating point it never trained at.
    One jitted graph at the fixed canvas shape (eager generate_proposals
    through the axon relay costs ~25 ms per op dispatch)."""
    import jax
    import jax.numpy as jnp

    from multipathnet_tpu.core.padding import pad_axis_to
    from multipathnet_tpu.data.transforms import batch_resize_to_canvas
    from multipathnet_tpu.models.sharpmask import generate_proposals
    from multipathnet_tpu.ops.boxes import iou_matrix

    # memoized on the trainer, KEYED BY top_k (the closure bakes it in):
    # re-jitting per eval call would recompile the whole generator graph on
    # every --eval-every tick
    cache = getattr(trainer, "_recall_jit", None)
    if cache is None:
        cache = trainer._recall_jit = {}
    run = cache.get(top_k)
    if run is None:
        @jax.jit
        def run(p, raw_u8, src_hw):
            canvas, scale = batch_resize_to_canvas(
                raw_u8[None], cfg.data.image_size, src_hw[None])
            out = generate_proposals(trainer.model, p, canvas, top_k=top_k,
                                     with_masks=False)
            return out["boxes"][0] / scale[0]  # back to raw image coords

        cache[top_k] = run

    sizes = [loader.image_size(i) for i in range(len(loader))]
    hmax, wmax = (max(s[d] for s in sizes) for d in (0, 1))
    hits, total, best = 0, 0, []
    for i in range(min(len(loader), max_images)):
        img = loader.load_image(i)
        h, w = img.shape[:2]
        # fixed canvas => one compile for the whole split
        pad = pad_axis_to(pad_axis_to(img, hmax, 0), wmax, 1)
        boxes = run(params, jnp.asarray(pad),
                    jnp.asarray([h, w], jnp.float32))
        ann = loader.annotations(i)
        keep = ~ann["iscrowd"]  # crowds are not recall targets (COCO conv.)
        gt = ann["boxes"][keep]
        if len(gt) == 0:
            continue
        iou = np.asarray(iou_matrix(boxes, jnp.asarray(gt)))
        m = iou.max(0)
        hits += int((m >= 0.5).sum())
        total += len(gt)
        best.extend(m.tolist())
    return {"proposal_recall@0.5": hits / max(total, 1),
            "mean_best_iou": float(np.mean(best)) if best else 0.0,
            "top_k": float(top_k)}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_config_args(p)
    p.add_argument("--steps", type=int, default=0,
                   help="override cfg.train.total_steps")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-every", type=int, default=0,
                   help="run the tester every N steps (0 = only at end)")
    p.add_argument("--no-final-eval", action="store_true")
    p.add_argument("--tensorboard", action="store_true",
                   help="also export scalars to <checkpoint_dir>/tb")
    p.add_argument("--proposal-net", action="store_true",
                   help="train the SharpMask-style proposal network "
                        "(checkpoints feed export_proposals/demo)")
    args = p.parse_args(argv)

    cfg = common.build_config(args)
    if args.steps:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, total_steps=args.steps))
    if 0 < cfg.train.total_steps <= cfg.train.warmup_steps:
        # short runs inside the linear warmup train at LR ~0 and eval at
        # chance — loud note instead of a silent AP=0 (seen in practice)
        print(f"WARNING: total_steps={cfg.train.total_steps} <= "
              f"warmup_steps={cfg.train.warmup_steps}; the LR never leaves "
              f"warmup (peak {cfg.train.lr * cfg.train.total_steps / max(cfg.train.warmup_steps, 1):.2e} "
              f"of lr={cfg.train.lr}). For short runs pass "
              f"--set train.warmup_steps=0 (or a small value).")

    import jax

    from multipathnet_tpu.data.pipeline import DetectionPipeline
    from multipathnet_tpu.eval.tester import Tester
    from multipathnet_tpu.train.checkpoint import Checkpointer
    from multipathnet_tpu.train.loop import Trainer
    from multipathnet_tpu.utils.metrics import MetricsLogger

    loader, props = common.resolve_data(args, cfg)
    print(f"dataset: {len(loader)} images, {loader.num_classes} classes; "
          f"devices: {jax.devices()}")
    if loader.num_classes != cfg.model.num_classes:
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, num_classes=loader.num_classes))
        print(f"config: num_classes -> {loader.num_classes} (from dataset)")

    os.makedirs(cfg.train.checkpoint_dir, exist_ok=True)
    with open(os.path.join(cfg.train.checkpoint_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    if args.proposal_net:
        from multipathnet_tpu.train.proposal import ProposalTrainer

        trainer = ProposalTrainer(cfg)
    else:
        trainer = Trainer(cfg)
    pipe = DetectionPipeline(loader, props, cfg.data,
                             batch_size=cfg.train.batch_size,
                             seed=cfg.train.seed,
                             with_masks=args.proposal_net)
    ckpt = Checkpointer(os.path.join(cfg.train.checkpoint_dir, "ckpt"))
    logger = MetricsLogger(
        os.path.join(cfg.train.checkpoint_dir, "metrics.jsonl"),
        tensorboard_dir=(os.path.join(cfg.train.checkpoint_dir, "tb")
                         if args.tensorboard else None))

    state = trainer.init_state()
    if args.resume:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state = trainer.shard_state(restored)
            print(f"resumed from step {int(np.asarray(restored.step))}")
        else:
            print("no checkpoint found; starting fresh")

    def run_eval(params, tag):
        if args.proposal_net:
            m = _proposal_recall(trainer, params, loader, cfg)
        else:
            m = Tester(trainer.model, params, cfg, loader, props).test()
        logger.log(int(np.asarray(state.step)), tag=tag, **m)
        return m

    step = int(np.asarray(state.step))
    epoch = step // max(len(pipe), 1)
    t_last, s_last = time.time(), step
    t_start, first_step_logged = time.time(), False
    imgs_per_step = cfg.train.batch_size
    while step < cfg.train.total_steps:
        # device prefetch: batch N+1 transfers while step N computes
        # (shard_batch on an already-resident batch is a no-op)
        for batch in pipe.epoch_on_device(epoch, trainer.shard_batch):
            state, metrics = trainer.step(state, batch)
            step += 1
            if not first_step_logged:
                # includes the step-graph compile; init itself is fast now
                # (small-canvas trace, train/loop.py init_state)
                dt0 = time.time() - t_start
                logger.log(step, time_to_first_step=dt0)
                print(f"time to first step: {dt0:.1f}s")
                first_step_logged = True
            if step % cfg.train.log_every == 0:
                dt = time.time() - t_last
                ips = (step - s_last) * imgs_per_step / max(dt, 1e-9)
                logger.log(step, lr=trainer.lr_schedule(step),
                           imgs_per_sec=ips,
                           **{k: v for k, v in metrics.items()})
                t_last, s_last = time.time(), step
            if step % cfg.train.checkpoint_every == 0:
                ckpt.save(state)
            if args.eval_every and step % args.eval_every == 0:
                run_eval(state.params, "interim")
            if step >= cfg.train.total_steps:
                break
        epoch += 1

    ckpt.save(state, force=True)
    ckpt.wait()
    if not args.no_final_eval:
        m = run_eval(state.params, "final")
        print("final:", {k: round(v, 4) for k, v in m.items()})


if __name__ == "__main__":
    main()
