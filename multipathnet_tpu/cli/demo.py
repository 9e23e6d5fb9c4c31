"""Demo entry point — demo.lua analog (SURVEY.md §2.1, §3.3).

Single image -> proposals -> detections -> rendered boxes. Proposals come from
a proposal .npz, or (once trained) the on-TPU SharpMask-style generator
(models/sharpmask.py), or a dense sliding-window fallback so the demo always
runs offline.

    python -m multipathnet_tpu.cli.demo --preset tiny --synthetic --index 0 \
        --output /tmp/demo_out.png
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np

from multipathnet_tpu.cli import common


def sliding_window_proposals(h: int, w: int, n: int = 256) -> np.ndarray:
    """Dense multi-scale window grid — proposal source of last resort."""
    out = []
    for frac in (0.2, 0.35, 0.5, 0.7):
        bw, bh = w * frac, h * frac
        steps = max(int(np.sqrt(max(n // 8, 1))), 2)
        for cy in np.linspace(bh / 2, h - bh / 2, steps):
            for cx in np.linspace(bw / 2, w - bw / 2, steps):
                out.append([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2])
    return np.asarray(out[:n], np.float32)


def draw_detections(image: np.ndarray, dets: dict, class_names,
                    score_threshold: float = 0.3,
                    proposal_masks: np.ndarray | None = None) -> "object":
    """Render boxes (+ instance masks when sharpmask proposals provide them —
    the detection `indices` give each detection's source proposal)."""
    from PIL import Image, ImageDraw

    img = Image.fromarray(image).convert("RGB")
    palette = [(230, 60, 60), (60, 200, 90), (70, 100, 240), (240, 200, 40),
               (200, 80, 220), (60, 210, 210)]
    if proposal_masks is not None and "indices" in dets:
        overlay = np.asarray(img, np.float32)
        for box, score, cls, src, ok in zip(
                dets["boxes"], dets["scores"], dets["classes"],
                dets["indices"], dets["valid"]):
            if not ok or score < score_threshold or \
                    int(src) >= len(proposal_masks):
                continue  # padded proposal slots have no mask
            x1, y1 = int(max(box[0], 0)), int(max(box[1], 0))
            x2 = int(min(box[2], image.shape[1]))
            y2 = int(min(box[3], image.shape[0]))
            if x2 <= x1 or y2 <= y1:
                continue
            m = Image.fromarray(
                (proposal_masks[int(src)] * 255).astype(np.uint8))
            m = np.asarray(m.resize((x2 - x1, y2 - y1)), np.float32) / 255.0
            color = np.asarray(palette[int(cls) % len(palette)], np.float32)
            region = overlay[y1:y2, x1:x2]
            a = (m > 0.5)[..., None] * 0.45
            overlay[y1:y2, x1:x2] = region * (1 - a) + color * a
        img = Image.fromarray(overlay.astype(np.uint8))
    dr = ImageDraw.Draw(img)
    n = 0
    for box, score, cls, ok in zip(dets["boxes"], dets["scores"],
                                   dets["classes"], dets["valid"]):
        if not ok or score < score_threshold:
            continue
        color = palette[int(cls) % len(palette)]
        dr.rectangle([float(box[0]), float(box[1]),
                      float(box[2]), float(box[3])], outline=color, width=2)
        name = class_names[int(cls) - 1] if int(cls) - 1 < len(class_names) \
            else str(int(cls))
        dr.text((float(box[0]) + 2, float(box[1]) + 2),
                f"{name} {float(score):.2f}", fill=color)
        n += 1
    return img, n


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_config_args(p)
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--index", type=int, default=0, help="dataset image index")
    p.add_argument("--image", default="", help="arbitrary image file instead")
    p.add_argument("--output", default="demo_out.png")
    p.add_argument("--score-threshold", type=float, default=0.3)
    p.add_argument("--proposal-source", default="file",
                   choices=("file", "sharpmask", "sliding"),
                   help="file: precomputed .npz; sharpmask: run the on-TPU "
                        "proposal net (config 5 e2e); sliding: dense grid")
    p.add_argument("--proposal-checkpoint-dir", default="",
                   help="SharpMask checkpoint (defaults to random init)")
    p.add_argument("--top-proposals", type=int, default=128)
    args = p.parse_args(argv)

    cfg = common.build_config(args)
    loader, props = common.resolve_data(args, cfg)
    if loader.num_classes != cfg.model.num_classes:
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, num_classes=loader.num_classes))

    from multipathnet_tpu.core.padding import pad_to
    from multipathnet_tpu.eval.detect import Detector

    trainer, state = common.restore_float_state(cfg, args.checkpoint_dir,
                                                strict=False)

    if args.image:
        from PIL import Image

        image = np.asarray(Image.open(args.image).convert("RGB"), np.uint8)
    else:
        image = loader.load_image(args.index)

    if args.proposal_source == "sharpmask":
        # config-5 path: image -> on-TPU proposal net -> detector (§3.3)
        import jax.numpy as jnp

        from multipathnet_tpu.data.transforms import normalize
        from multipathnet_tpu.models.sharpmask import generate_proposals
        from multipathnet_tpu.train.proposal import ProposalTrainer

        ptrainer = ProposalTrainer(cfg)
        pstate = ptrainer.init_state()
        if args.proposal_checkpoint_dir:
            import os

            from multipathnet_tpu.train.checkpoint import Checkpointer

            restored = Checkpointer(os.path.join(
                args.proposal_checkpoint_dir, "ckpt")).restore_latest(pstate)
            if restored is not None:
                pstate = restored
                print(f"proposal net: restored step "
                      f"{int(np.asarray(pstate.step))}")
        x = jnp.asarray(normalize(jnp.asarray(image)))[None]
        prop_out = generate_proposals(ptrainer.model, pstate.params, x,
                                      top_k=args.top_proposals,
                                      with_masks=True)
        boxes = np.asarray(prop_out["boxes"][0])
        proposal_masks = np.asarray(prop_out["masks"][0])
        print(f"sharpmask: {len(boxes)} proposals (+masks), "
              f"top score {float(prop_out['scores'][0].max()):.3f}")
    elif args.proposal_source == "sliding" or args.image:
        boxes = sliding_window_proposals(*image.shape[:2])
        proposal_masks = None
    else:
        boxes, _ = props.for_image_id(loader.image_id(args.index))
        proposal_masks = None

    h, w = image.shape[:2]
    pb, pm = pad_to(boxes.astype(np.float32), cfg.data.max_proposals)
    det = Detector(common.eval_model_for(cfg, trainer), state.params, cfg)
    out = det(image[None], np.asarray([[h, w]], np.float32),
              pb[None], pm[None])
    dets = {k: v[0] for k, v in out.items()}
    # detections whose source proposal index exceeds the real proposal count
    # (padded slots) can't be valid; masks map by source index
    img, n = draw_detections(image, dets, loader.category_names,
                             args.score_threshold,
                             proposal_masks=proposal_masks)
    img.save(args.output)
    kept = int(dets["valid"].sum())
    print(f"{kept} detections ({n} above {args.score_threshold}); "
          f"wrote {args.output}")


if __name__ == "__main__":
    main()
