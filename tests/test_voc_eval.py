"""VOC mAP evaluator vs hand-computed cases."""

import numpy as np

from multipathnet_tpu.eval.voc_eval import evaluate_voc


def gt(img, cat, bbox, difficult=False):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox),
            "difficult": difficult}


def det(img, cat, bbox, score):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox),
            "score": score}


def test_perfect():
    g = [gt(1, 1, [0, 0, 10, 10]), gt(2, 1, [5, 5, 10, 10])]
    d = [det(1, 1, [0, 0, 10, 10], 0.9), det(2, 1, [5, 5, 10, 10], 0.8)]
    m = evaluate_voc(g, d)
    assert abs(m["mAP"] - 1.0) < 1e-9
    m07 = evaluate_voc(g, d, use_07_metric=True)
    assert abs(m07["mAP"] - 1.0) < 1e-9


def test_high_fp_halves():
    g = [gt(1, 1, [0, 0, 10, 10])]
    d = [det(1, 1, [100, 100, 5, 5], 0.95),  # FP first
         det(1, 1, [0, 0, 10, 10], 0.9)]
    # PR: (r=0, p=0), (r=1, p=0.5) -> exact area = 0.5
    m = evaluate_voc(g, d)
    assert abs(m["mAP"] - 0.5) < 1e-9


def test_duplicate_is_fp():
    g = [gt(1, 1, [0, 0, 10, 10])]
    d = [det(1, 1, [0, 0, 10, 10], 0.9),
         det(1, 1, [1, 0, 10, 10], 0.8)]  # dup of same GT after match
    m = evaluate_voc(g, d)
    assert abs(m["mAP"] - 1.0) < 1e-9  # dup after full recall: area unchanged


def test_difficult_ignored():
    g = [gt(1, 1, [0, 0, 10, 10]),
         gt(1, 1, [50, 50, 10, 10], difficult=True)]
    d = [det(1, 1, [0, 0, 10, 10], 0.9),
         det(1, 1, [50, 50, 10, 10], 0.8)]  # matches difficult: no credit/blame
    m = evaluate_voc(g, d)
    assert abs(m["mAP"] - 1.0) < 1e-9


def test_missed_gt():
    g = [gt(1, 1, [0, 0, 10, 10]), gt(1, 1, [50, 50, 10, 10])]
    d = [det(1, 1, [0, 0, 10, 10], 0.9)]
    m = evaluate_voc(g, d)  # recall caps at 0.5, precision 1
    assert abs(m["mAP"] - 0.5) < 1e-9
    m07 = evaluate_voc(g, d, use_07_metric=True)
    assert abs(m07["mAP"] - 6 / 11) < 1e-9  # thresholds 0..0.5 -> p=1


def test_multiclass_mean():
    g = [gt(1, 1, [0, 0, 10, 10]), gt(1, 2, [50, 50, 10, 10])]
    d = [det(1, 1, [0, 0, 10, 10], 0.9),
         det(1, 2, [200, 200, 10, 10], 0.9)]
    m = evaluate_voc(g, d)
    assert abs(m["mAP"] - 0.5) < 1e-9
    assert abs(m["AP_per_class"][1] - 1.0) < 1e-9
    assert abs(m["AP_per_class"][2] - 0.0) < 1e-9
