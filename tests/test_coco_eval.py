"""COCO-protocol AP evaluator vs hand-computed cases (SURVEY.md §4: golden-file
tests with analytically known AP)."""

import numpy as np

from multipathnet_tpu.eval.coco_eval import CocoEvaluator, box_iou_xywh


def gt(img, cat, bbox, **kw):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox), **kw}


def det(img, cat, bbox, score):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox), "score": score}


def ev(gts, dts):
    return CocoEvaluator().evaluate(gts, dts)


def test_box_iou_crowd():
    d = np.array([[0, 0, 10, 5]], float)
    g = np.array([[0, 0, 10, 10]], float)
    np.testing.assert_allclose(box_iou_xywh(d, g, np.array([False])), [[0.5]])
    np.testing.assert_allclose(box_iou_xywh(d, g, np.array([True])), [[1.0]])


def test_perfect_detection_ap1():
    gts = [gt(1, 1, [0, 0, 10, 10]), gt(1, 1, [50, 50, 20, 20])]
    dts = [det(1, 1, [0, 0, 10, 10], 0.9), det(1, 1, [50, 50, 20, 20], 0.8)]
    m = ev(gts, dts)
    assert abs(m["AP"] - 1.0) < 1e-9
    assert abs(m["AP50"] - 1.0) < 1e-9
    assert abs(m["AR100"] - 1.0) < 1e-9


def test_high_scoring_fp_halves_ap():
    gts = [gt(1, 1, [0, 0, 10, 10])]
    dts = [det(1, 1, [200, 200, 10, 10], 0.9),  # FP, higher score
           det(1, 1, [0, 0, 10, 10], 0.8)]      # TP
    m = ev(gts, dts)
    assert abs(m["AP"] - 0.5) < 1e-9


def test_low_scoring_fp_after_full_recall_free():
    gts = [gt(1, 1, [0, 0, 10, 10])]
    dts = [det(1, 1, [0, 0, 10, 10], 0.9),
           det(1, 1, [200, 200, 10, 10], 0.1)]  # FP after recall=1 reached
    m = ev(gts, dts)
    assert abs(m["AP"] - 1.0) < 1e-9


def test_iou_060_matches_3_of_10_thresholds():
    gts = [gt(1, 1, [0, 0, 10, 10])]
    dts = [det(1, 1, [0, 0, 10, 6], 0.9)]  # IoU exactly 0.6
    m = ev(gts, dts)
    assert abs(m["AP"] - 0.3) < 1e-9
    assert abs(m["AP50"] - 1.0) < 1e-9
    assert abs(m["AP75"] - 0.0) < 1e-9


def test_missed_gt_caps_recall():
    gts = [gt(1, 1, [0, 0, 10, 10]), gt(1, 1, [100, 100, 10, 10])]
    dts = [det(1, 1, [0, 0, 10, 10], 0.9)]
    m = ev(gts, dts)
    # recall plateau at 0.5: precision 1.0 for the 51 thresholds <= 0.5
    assert abs(m["AP"] - 51 / 101) < 1e-9
    assert abs(m["AR100"] - 0.5) < 1e-9


def test_crowd_absorbs_without_penalty():
    gts = [gt(1, 1, [0, 0, 10, 10]),
           gt(1, 1, [100, 100, 50, 50], iscrowd=1)]
    dts = [det(1, 1, [0, 0, 10, 10], 0.9),
           det(1, 1, [100, 100, 25, 50], 0.8),   # inside crowd -> ignored
           det(1, 1, [110, 100, 40, 50], 0.7)]   # also inside crowd -> ignored
    m = ev(gts, dts)
    assert abs(m["AP"] - 1.0) < 1e-9


def test_category_without_gt_excluded():
    gts = [gt(1, 1, [0, 0, 10, 10])]
    dts = [det(1, 1, [0, 0, 10, 10], 0.9),
           det(1, 2, [0, 0, 10, 10], 0.9)]  # cat 2 has no GT anywhere
    m = ev(gts, dts)
    assert abs(m["AP"] - 1.0) < 1e-9


def test_two_categories_mean():
    gts = [gt(1, 1, [0, 0, 10, 10]), gt(1, 2, [50, 50, 10, 10])]
    dts = [det(1, 1, [0, 0, 10, 10], 0.9),
           det(1, 2, [200, 200, 10, 10], 0.9)]  # cat 2: pure FP
    m = ev(gts, dts)
    assert abs(m["AP"] - 0.5) < 1e-9  # (1.0 + 0.0) / 2


def test_area_ranges():
    # small GT: area 100 < 32^2; large GT: area 10000 > 96^2
    gts = [gt(1, 1, [0, 0, 10, 10]), gt(1, 1, [50, 50, 100, 100])]
    dts = [det(1, 1, [0, 0, 10, 10], 0.9), det(1, 1, [50, 50, 100, 100], 0.8)]
    m = ev(gts, dts)
    assert abs(m["APsmall"] - 1.0) < 1e-9
    assert abs(m["APlarge"] - 1.0) < 1e-9
    assert m["APmedium"] == -1.0  # no medium GT anywhere


def test_maxdets_1_limits_recall():
    gts = [gt(1, 1, [0, 0, 10, 10]), gt(1, 1, [100, 100, 10, 10])]
    dts = [det(1, 1, [0, 0, 10, 10], 0.9),
           det(1, 1, [100, 100, 10, 10], 0.8)]
    m = ev(gts, dts)
    assert abs(m["AR1"] - 0.5) < 1e-9
    assert abs(m["AR100"] - 1.0) < 1e-9


def test_duplicate_detection_is_fp():
    gts = [gt(1, 1, [0, 0, 10, 10])]
    dts = [det(1, 1, [0, 0, 10, 10], 0.9),
           det(1, 1, [0, 0, 10, 10], 0.8)]  # duplicate -> FP
    m = ev(gts, dts)
    assert abs(m["AP"] - 1.0) < 1e-9  # dup after full recall: harmless
    gts2 = [gt(1, 1, [0, 0, 10, 10]), gt(2, 1, [0, 0, 10, 10])]
    dts2 = [det(1, 1, [0, 0, 10, 10], 0.9),
            det(1, 1, [0, 0, 10, 10], 0.85),  # dup FP *before* img2's TP
            det(2, 1, [0, 0, 10, 10], 0.8)]
    m2 = ev(gts2, dts2)
    # rc=[.5,.5,1], pr=[1,.5,2/3] -> envelope [1,2/3,2/3]:
    # r<=0.5 -> 1.0 (51 pts), r>0.5 -> 2/3 (50 pts)
    want = (51 * 1.0 + 50 * (2 / 3)) / 101
    assert abs(m2["AP"] - want) < 1e-9
