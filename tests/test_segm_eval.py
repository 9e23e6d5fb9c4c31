"""Segmentation-mode evaluation + NMS provenance indices (the reference's
COCO segmentation-challenge capability, SURVEY.md §0)."""

import jax.numpy as jnp
import numpy as np
import pytest

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


def test_proposal_store_rle_roundtrip(tmp_path):
    """Mask proposals keep their RLEs through save/load; boxes derive from
    the masks (SURVEY.md §2.2 'RLE->boxes')."""
    from multipathnet_tpu.data.proposals import ProposalStore

    r1 = _mask(16, 16, 2, 8, 3, 10)
    r2 = _mask(16, 16, 5, 12, 1, 6)
    store = ProposalStore.from_mask_proposals(
        [[r1], [r2]], [[0.9], [0.8]], [100, 101])
    assert store.rles is not None
    p = str(tmp_path / "props.npz")
    store.save(p)
    back = ProposalStore.load(p)
    assert back.rles_for_image_id(101)[0] == r2
    np.testing.assert_allclose(back.for_image_id(100)[0][0], [3, 2, 10, 8])


@pytest.mark.slow
def test_e2e_segmentation_protocol(tmp_path):
    """The reference's COCO segmentation-challenge workflow: mask proposals
    (DeepMask-style) + detector scores -> segm-mode AP (detections carry the
    source proposal's mask via the NMS provenance indices)."""
    import dataclasses

    from multipathnet_tpu.core.config import preset
    from multipathnet_tpu.core.mesh import make_mesh
    from multipathnet_tpu.data import rle as rle_codec
    from multipathnet_tpu.data import synthetic
    from multipathnet_tpu.data.coco import CocoLoader
    from multipathnet_tpu.data.pipeline import DetectionPipeline
    from multipathnet_tpu.data.proposals import ProposalStore
    from multipathnet_tpu.eval.tester import Tester
    from multipathnet_tpu.train.loop import Trainer

    fx = synthetic.generate(str(tmp_path), num_images=8, image_size=64,
                            num_classes=4, proposals_per_image=24, seed=5)
    loader = CocoLoader(fx["annotations"], fx["images"])

    # build a MASK-proposal store: GT polygon masks (DeepMask-perfect
    # proposals) + random rectangles as distractors
    rng = np.random.default_rng(0)
    per_rles, per_scores, ids = [], [], []
    for i in range(len(loader)):
        ann = loader.annotations(i)
        h, w = loader.image_size(i)
        rles, scores = [], []
        for seg in ann["segmentations"]:
            rles.append(rle.encode(rle_codec.polys_to_mask(seg, h, w)))
            scores.append(float(rng.uniform(0.7, 1.0)))
        while len(rles) < 12:
            x1, y1 = rng.integers(0, 40, 2)
            bw, bh = rng.integers(8, 24, 2)
            rles.append(_mask(h, w, int(y1), int(min(y1 + bh, h)),
                              int(x1), int(min(x1 + bw, w))))
            scores.append(float(rng.uniform(0.0, 0.5)))
        per_rles.append(rles)
        per_scores.append(scores)
        ids.append(loader.image_id(i))
    props = ProposalStore.from_mask_proposals(per_rles, per_scores, ids)

    cfg = preset("tiny")
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, num_classes=5))
    trainer = Trainer(cfg, mesh=make_mesh(n_data=2))
    pipe = DetectionPipeline(loader, props, cfg.data, batch_size=2, seed=0)
    from state_cache import cached_state

    def build():
        state = trainer.init_state()
        for ep in range(20):
            for batch in pipe.epoch(ep):
                state, _ = trainer.step(state, batch)
        return state

    state = cached_state("segm-e2e-20ep", build)

    tester = Tester(trainer.model, state.params, cfg, loader, props,
                    batch_size=2)
    bbox = tester.test()
    segm = tester.test(mode="segm")
    print(f"bbox AP50={bbox['AP50']:.3f} segm AP50={segm['AP50']:.3f}")
    assert segm["AP50"] > 0.3, (bbox, segm)
    # GT-polygon proposals: segm should track bbox closely
    assert segm["AP50"] > bbox["AP50"] - 0.25
