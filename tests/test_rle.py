"""RLE codec tests — roundtrips + hand-computed cases (maskApi.c parity spec)."""

import numpy as np

from multipathnet_tpu.data import rle

RNG = np.random.default_rng(3)


def test_counts_hand_case_column_major():
    mask = np.array([[1, 0], [0, 1]], np.uint8)
    # F-order flat: (0,0)=1,(1,0)=0,(0,1)=0,(1,1)=1 -> runs 0x0,1x1,2x0,1x1
    assert rle.mask_to_counts(mask) == [0, 1, 2, 1]
    np.testing.assert_array_equal(rle.counts_to_mask([0, 1, 2, 1], (2, 2)), mask)


def test_mask_roundtrip_random():
    for _ in range(10):
        h, w = RNG.integers(1, 40, 2)
        mask = (RNG.random((h, w)) > 0.6).astype(np.uint8)
        enc = rle.encode(mask)
        np.testing.assert_array_equal(rle.decode(enc), mask)
        assert rle.area(enc) == int(mask.sum())


def test_string_counts_roundtrip():
    for _ in range(20):
        n = int(RNG.integers(1, 30))
        counts = RNG.integers(0, 10_000, n).tolist()
        assert rle.decode_counts(rle.encode_counts(counts)) == counts


def test_to_bbox_matches_mask_bbox():
    for _ in range(10):
        h, w = int(RNG.integers(5, 40)), int(RNG.integers(5, 40))
        mask = np.zeros((h, w), np.uint8)
        y1, x1 = RNG.integers(0, h - 2), RNG.integers(0, w - 2)
        y2 = RNG.integers(y1 + 1, h)
        x2 = RNG.integers(x1 + 1, w)
        mask[y1:y2, x1:x2] = 1
        bb = rle.to_bbox(rle.encode(mask))
        np.testing.assert_allclose(bb, [x1, y1, x2 - x1, y2 - y1])


def test_to_bbox_empty():
    np.testing.assert_array_equal(rle.to_bbox(rle.encode(np.zeros((4, 4), np.uint8))), np.zeros(4))


def test_polys_to_mask_square():
    m = rle.polys_to_mask([[2, 2, 8, 2, 8, 8, 2, 8]], 10, 10)
    assert m[5, 5] == 1 and m[0, 0] == 0
    assert 36 <= m.sum() <= 64  # rasterization tolerance on the boundary


def test_mask_iou_crowd_semantics():
    a = np.zeros((10, 10), np.uint8)
    a[:5] = 1  # 50 px
    b = np.zeros((10, 10), np.uint8)
    b[:10] = 1  # 100 px, contains a
    ea, eb = rle.encode(a), rle.encode(b)
    plain = rle.iou([ea], [eb], [0])
    crowd = rle.iou([ea], [eb], [1])
    np.testing.assert_allclose(plain, [[0.5]])
    np.testing.assert_allclose(crowd, [[1.0]])  # union = area(dt) for crowds
