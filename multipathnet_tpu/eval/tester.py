"""Split-level evaluation harness — Tester_FRCNN analog (SURVEY.md §2.1, §3.2).

Loop over an eval split: batched on-device detection (eval/detect.py), convert
the fixed-size detection sets to COCO result dicts, score with the
self-contained evaluator (eval/coco_eval.py). The reference's test-time model
surgery (strip DataParallelTable, insert SoftMax, :evaluate()) has no analog:
the flax model is already functional, softmax+averaging live in the detect
graph, and dropout is off because train=False is the default.
"""

from __future__ import annotations

import numpy as np

from multipathnet_tpu.core.config import Config
from multipathnet_tpu.data.pipeline import DetectionPipeline
from multipathnet_tpu.data.proposals import ProposalStore
from multipathnet_tpu.eval.coco_eval import CocoEvaluator
from multipathnet_tpu.eval.detect import Detector
from multipathnet_tpu.models.multipath import MultiPathNet


def detections_to_coco(out: dict, image_ids, label_to_cat) -> list[dict]:
    """Fixed-size detection arrays (B, D, ...) -> COCO result dicts."""
    results = []
    for b, img_id in enumerate(image_ids):
        valid = out["valid"][b]
        for box, score, cls, ok in zip(out["boxes"][b], out["scores"][b],
                                       out["classes"][b], valid):
            if not ok:
                continue
            x1, y1, x2, y2 = (float(v) for v in box)
            results.append({
                "image_id": int(img_id),
                "category_id": int(label_to_cat[int(cls)]),
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "score": float(score),
            })
    return results


def groundtruth_to_coco(loader) -> list[dict]:
    gts = []
    for i in range(len(loader)):
        ann = loader.annotations(i)
        img_id = loader.image_id(i)
        difficult = ann.get("difficult")
        for k, (box, cls, crowd, area) in enumerate(zip(
                ann["boxes"], ann["classes"], ann["iscrowd"], ann["areas"])):
            x1, y1, x2, y2 = (float(v) for v in box)
            g = {
                "image_id": int(img_id),
                "category_id": int(loader.label_to_cat[int(cls)]),
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "area": float(area),
                "iscrowd": bool(crowd),
            }
            if difficult is not None:
                g["difficult"] = bool(difficult[k])  # VOC ignore semantics
            gts.append(g)
    return gts


class Tester:
    __test__ = False  # not a pytest class

    def __init__(self, model: MultiPathNet, params, cfg: Config, loader,
                 proposals: ProposalStore, batch_size: int = None):
        self.cfg = cfg
        self.loader = loader
        self.detector = Detector(model, params, cfg)
        self.pipeline = DetectionPipeline(
            loader, proposals, cfg.data,
            batch_size=batch_size or max(cfg.train.batch_size, 1),
            seed=cfg.train.seed)

    def collect_detections(self, max_images: int = None) -> list[dict]:
        results = []
        done = 0
        for idxs, batch in self.pipeline.eval_batches():
            out = self.detector(batch.images, batch.src_hws, batch.proposals,
                                batch.prop_mask)
            ids = [self.loader.image_id(i) for i in idxs]
            sliced = {k: v[: len(ids)] for k, v in out.items()}
            results.extend(
                detections_to_coco(sliced, ids, self.loader.label_to_cat))
            done += len(ids)
            if max_images and done >= max_images:
                break
        return results

    def test(self, max_images: int = None, verbose: bool = False,
             protocol: str = None) -> dict:
        """protocol: "coco" (AP .5:.95 table) or "voc" (devkit mAP).
        Default: the loader's declared protocol (VocLoader) else COCO."""
        dets = self.collect_detections(max_images)
        gts = groundtruth_to_coco(self.loader)
        if max_images:
            keep_ids = {self.loader.image_id(i)
                        for i in range(min(max_images, len(self.loader)))}
            gts = [g for g in gts if g["image_id"] in keep_ids]
            dets = [d for d in dets if d["image_id"] in keep_ids]
        protocol = protocol or getattr(self.loader, "protocol", "coco")
        if protocol == "voc":
            from multipathnet_tpu.eval.voc_eval import evaluate_voc

            res = evaluate_voc(gts, dets)
            return {"mAP": res["mAP"],
                    **{f"AP_{c}": v for c, v in res["AP_per_class"].items()}}
        return CocoEvaluator().evaluate(gts, dets, verbose=verbose)
