"""Native C++ RLE codec vs NumPy oracle — byte-exact parity."""

import numpy as np
import pytest

from multipathnet_tpu.data import rle
from multipathnet_tpu.data import rle_native

pytestmark = pytest.mark.skipif(not rle_native.available(),
                                reason="native codec not built")

RNG = np.random.default_rng(11)


def rand_mask(h, w, p=0.4):
    return (RNG.random((h, w)) < p).astype(np.uint8)


def test_string_codec_exact():
    for _ in range(20):
        counts = RNG.integers(0, 100_000, int(RNG.integers(1, 40))).tolist()
        s_np = rle.encode_counts_np(counts)
        s_cc = rle_native.encode_string(counts)
        assert s_np == s_cc
        assert rle_native.decode_string(s_np) == counts
        assert rle.decode_counts_np(s_cc) == counts


def test_mask_codec_exact():
    for _ in range(10):
        h, w = int(RNG.integers(1, 60)), int(RNG.integers(1, 60))
        mask = rand_mask(h, w)
        c_np = rle.mask_to_counts_np(mask)
        c_cc = rle_native.mask_to_counts(mask)
        assert c_np == c_cc
        np.testing.assert_array_equal(
            rle_native.counts_to_mask(c_cc, (h, w)),
            rle.counts_to_mask_np(c_np, (h, w)))


def test_area_bbox_exact():
    for _ in range(10):
        h, w = int(RNG.integers(4, 50)), int(RNG.integers(4, 50))
        mask = np.zeros((h, w), np.uint8)
        y1, x1 = RNG.integers(0, h - 1), RNG.integers(0, w - 1)
        y2 = RNG.integers(y1 + 1, h + 1)
        x2 = RNG.integers(x1 + 1, w + 1)
        mask[y1:y2, x1:x2] = 1
        counts = rle.mask_to_counts_np(mask)
        area, bbox = rle_native.area_bbox(counts, h)
        assert area == int(mask.sum())
        np.testing.assert_allclose(bbox, [x1, y1, x2 - x1, y2 - y1])


def test_dispatch_is_native():
    # rle module must route through the native codec when built
    assert rle.decode_counts is rle_native.decode_string


def test_box_iou_native_matches_python():
    from multipathnet_tpu.eval import coco_eval

    dt = RNG.uniform(0, 50, (9, 4))
    dt[:, 2:] = RNG.uniform(1, 30, (9, 2))
    gt = RNG.uniform(0, 50, (7, 4))
    gt[:, 2:] = RNG.uniform(1, 30, (7, 2))
    crowd = RNG.random(7) < 0.3

    native = rle_native.box_iou_xywh(dt, gt, crowd.astype(np.uint8))
    # pure-python reference (force the non-native branch)
    iw = np.maximum(np.minimum(dt[:, None, 0] + dt[:, None, 2],
                               gt[None, :, 0] + gt[None, :, 2])
                    - np.maximum(dt[:, None, 0], gt[None, :, 0]), 0)
    ih = np.maximum(np.minimum(dt[:, None, 1] + dt[:, None, 3],
                               gt[None, :, 1] + gt[None, :, 3])
                    - np.maximum(dt[:, None, 1], gt[None, :, 1]), 0)
    inter = iw * ih
    da = (dt[:, 2] * dt[:, 3])[:, None]
    ga = (gt[:, 2] * gt[:, 3])[None, :]
    union = np.where(crowd[None, :], da, da + ga - inter)
    want = np.where(union > 0, inter / union, 0)
    np.testing.assert_allclose(native, want, atol=1e-12)


def test_native_malformed_input_errors():
    with pytest.raises(ValueError):
        rle_native.counts_to_mask([5, 5], (2, 2))  # covers 10 px, mask is 4
