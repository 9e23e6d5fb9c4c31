"""NMS vs naive NumPy greedy oracle (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from multipathnet_tpu.ops import nms as N

RNG = np.random.default_rng(1)


def rand_dets(n, span=60):
    x1 = RNG.uniform(0, span, n)
    y1 = RNG.uniform(0, span, n)
    w = RNG.uniform(5, 40, n)
    h = RNG.uniform(5, 40, n)
    boxes = np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)
    scores = RNG.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


def naive_nms(boxes, scores, thresh):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            ix1, iy1 = max(boxes[i, 0], boxes[j, 0]), max(boxes[i, 1], boxes[j, 1])
            ix2, iy2 = min(boxes[i, 2], boxes[j, 2]), min(boxes[i, 3], boxes[j, 3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            aj = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(ai + aj - inter, 1e-8) > thresh:
                suppressed[j] = True
    return keep


def test_nms_matches_naive():
    for trial in range(5):
        boxes, scores = rand_dets(50)
        idx, keep = N.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=50)
        got = [int(i) for i, k in zip(np.asarray(idx), np.asarray(keep)) if k]
        assert got == naive_nms(boxes, scores, 0.5), f"trial {trial}"


def test_nms_respects_valid_mask():
    boxes, scores = rand_dets(20)
    valid = np.zeros(20, bool)
    valid[:5] = True
    idx, keep = N.nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=20,
        valid=jnp.asarray(valid),
    )
    kept = np.asarray(idx)[np.asarray(keep)]
    assert np.all(kept < 5)


def test_nms_max_out_truncates():
    boxes = np.stack([np.arange(10) * 100.0] * 2 + [np.arange(10) * 100.0 + 10] * 2, -1)
    boxes = boxes.astype(np.float32)  # 10 disjoint boxes
    scores = np.linspace(1, 0.1, 10).astype(np.float32)
    idx, keep = N.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=3)
    assert int(np.asarray(keep).sum()) == 3
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2])


def test_batched_nms_per_class_independence():
    b0, s0 = rand_dets(30)
    b1, s1 = rand_dets(30)
    boxes = np.stack([b0, b1])
    scores = np.stack([s0, s1])
    idx, keep = N.batched_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.4, 30)
    for c, (bb, ss) in enumerate([(b0, s0), (b1, s1)]):
        got = [int(i) for i, k in zip(np.asarray(idx[c]), np.asarray(keep[c])) if k]
        assert got == naive_nms(bb, ss, 0.4)


def test_multiclass_nms_shapes_and_protocol():
    n, c, d = 100, 7, 10
    boxes, _ = rand_dets(n)
    scores = RNG.uniform(0, 1, (n, c)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[80:] = False
    out = N.multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        score_threshold=0.05, iou_threshold=0.5,
        pre_nms_per_class=20, max_detections=d,
    )
    assert out["boxes"].shape == (d, 4)
    assert out["scores"].shape == (d,)
    assert out["classes"].shape == (d,)
    v = np.asarray(out["valid"])
    s = np.asarray(out["scores"])
    # scores sorted descending among valid, zeros on invalid
    assert np.all(np.diff(s[v]) <= 1e-6)
    assert np.all(s[~v] == 0)
    assert np.asarray(out["classes"]).max() < c


def test_multiclass_nms_high_threshold_kills_all():
    boxes, _ = rand_dets(10)
    scores = np.full((10, 3), 0.01, np.float32)
    out = N.multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(10, bool),
        score_threshold=0.5, iou_threshold=0.5,
        pre_nms_per_class=5, max_detections=4,
    )
    assert not np.any(np.asarray(out["valid"]))


def test_nms_sorted_fixpoint_matches_greedy():
    """nms_sorted (parallel fixpoint, the multiclass_nms fast path) ==
    sequential greedy `nms` on sorted candidates — including score ties
    (stable order = argmax-first tie-breaking) and invalid (-1e10) tails."""
    for trial in range(8):
        boxes, scores = rand_dets(64, span=40)  # dense -> deep chains
        if trial % 2:
            scores = np.round(scores, 1)  # force plenty of exact ties
        order = np.argsort(-scores, kind="stable")
        b, s = boxes[order], scores[order]
        if trial % 3 == 0:
            s[-10:] = -1e10  # invalid tail, as after thresholding
        keep = np.asarray(N.nms_sorted(jnp.asarray(b), jnp.asarray(s), 0.5))
        idx, kmask = N.nms(jnp.asarray(b), jnp.asarray(s), 0.5, max_out=64)
        greedy = np.zeros(64, bool)
        greedy[[int(i) for i, k in zip(np.asarray(idx), np.asarray(kmask))
                if k]] = True
        np.testing.assert_array_equal(keep, greedy, err_msg=f"trial {trial}")
