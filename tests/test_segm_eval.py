"""Segmentation-mode evaluation + NMS provenance indices (the reference's
COCO segmentation-challenge capability, SURVEY.md §0)."""

import jax.numpy as jnp
import numpy as np

from multipathnet_tpu.data import rle
from multipathnet_tpu.eval.coco_eval import CocoEvaluator
from multipathnet_tpu.ops import nms as N


def _mask(h, w, y1, y2, x1, x2):
    m = np.zeros((h, w), np.uint8)
    m[y1:y2, x1:x2] = 1
    return rle.encode(m)


def test_segm_ap_perfect():
    seg = _mask(32, 32, 4, 12, 6, 20)
    gts = [{"image_id": 1, "category_id": 1, "bbox": [6, 4, 14, 8],
            "area": 112.0, "segmentation": seg}]
    dts = [{"image_id": 1, "category_id": 1, "bbox": [6, 4, 14, 8],
            "score": 0.9, "segmentation": seg}]
    m = CocoEvaluator(mode="segm").evaluate(gts, dts)
    assert abs(m["AP"] - 1.0) < 1e-9


def test_segm_stricter_than_bbox():
    """Same bbox, different mask: bbox AP perfect, segm AP low."""
    gt_seg = _mask(32, 32, 4, 12, 6, 20)           # full box
    dt_seg = _mask(32, 32, 4, 8, 6, 20)            # top half only: IoU 0.5
    gts = [{"image_id": 1, "category_id": 1, "bbox": [6, 4, 14, 8],
            "area": 112.0, "segmentation": gt_seg}]
    dts = [{"image_id": 1, "category_id": 1, "bbox": [6, 4, 14, 8],
            "score": 0.9, "segmentation": dt_seg}]
    bbox_ap = CocoEvaluator().evaluate(gts, dts)["AP"]
    segm_ap = CocoEvaluator(mode="segm").evaluate(gts, dts)["AP"]
    assert abs(bbox_ap - 1.0) < 1e-9
    assert abs(segm_ap - 0.1) < 1e-9  # mask IoU 0.5 -> TP at 0.5 only


def test_nms_indices_provenance():
    """multiclass_nms returns each detection's source proposal index."""
    rng = np.random.default_rng(5)
    n, c = 40, 3
    x1 = rng.uniform(0, 100, n); y1 = rng.uniform(0, 100, n)
    boxes = np.stack([x1, y1, x1 + 10, y1 + 10], -1).astype(np.float32)
    scores = rng.uniform(0, 1, (n, c)).astype(np.float32)
    out = N.multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool),
        score_threshold=0.0, iou_threshold=0.5,
        pre_nms_per_class=20, max_detections=10)
    idx = np.asarray(out["indices"])
    v = np.asarray(out["valid"])
    ob = np.asarray(out["boxes"])
    oc = np.asarray(out["classes"])
    os_ = np.asarray(out["scores"])
    for i in np.nonzero(v)[0]:
        src = idx[i]
        np.testing.assert_allclose(ob[i], boxes[src], atol=1e-5)
        # classes here are raw 0-based column indices (detect.py adds the +1)
        assert abs(os_[i] - scores[src, oc[i]]) < 1e-6
