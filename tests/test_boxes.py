"""Box math vs NumPy naive oracles (SURVEY.md §4: unit tests, encode/decode
round-trip, IoU vs O(n^2) oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multipathnet_tpu.ops import boxes as B

RNG = np.random.default_rng(0)


def rand_boxes(n, lo=0, hi=100):
    x1 = RNG.uniform(lo, hi, n)
    y1 = RNG.uniform(lo, hi, n)
    w = RNG.uniform(1, 50, n)
    h = RNG.uniform(1, 50, n)
    return np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)


def naive_iou(a, b):
    out = np.zeros((len(a), len(b)), np.float32)
    for i, bi in enumerate(a):
        for j, bj in enumerate(b):
            ix1, iy1 = max(bi[0], bj[0]), max(bi[1], bj[1])
            ix2, iy2 = min(bi[2], bj[2]), min(bi[3], bj[3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            ua = (bi[2] - bi[0]) * (bi[3] - bi[1])
            ub = (bj[2] - bj[0]) * (bj[3] - bj[1])
            u = ua + ub - inter
            out[i, j] = inter / u if u > 0 else 0.0
    return out


def test_iou_matches_naive():
    a, b = rand_boxes(17), rand_boxes(23)
    got = np.asarray(B.iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, naive_iou(a, b), atol=1e-5)


def test_iou_zero_area_padded_rows():
    a = np.zeros((4, 4), np.float32)  # degenerate padded boxes
    b = rand_boxes(5)
    got = np.asarray(B.iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    assert np.all(got == 0)


def test_encode_decode_roundtrip():
    rois, gt = rand_boxes(64), rand_boxes(64)
    means = (0.1, -0.1, 0.05, 0.0)
    stds = (0.1, 0.1, 0.2, 0.2)
    t = B.encode(jnp.asarray(rois), jnp.asarray(gt), means, stds)
    back = B.decode(jnp.asarray(rois), t, means, stds)
    np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-4, atol=1e-2)
    assert np.all(np.isfinite(np.asarray(t)))


def test_encode_safe_on_degenerate():
    rois = np.zeros((3, 4), np.float32)
    gt = rand_boxes(3)
    t = np.asarray(B.encode(jnp.asarray(rois), jnp.asarray(gt)))
    assert np.all(np.isfinite(t))


def test_decode_clamps_exploding_deltas():
    rois = rand_boxes(3)
    deltas = np.full((3, 4), 50.0, np.float32)  # garbage padded rows
    out = np.asarray(B.decode(jnp.asarray(rois), jnp.asarray(deltas)))
    assert np.all(np.isfinite(out))


def test_clip_and_area():
    b = np.array([[-5, -5, 10, 10], [90, 90, 120, 130]], np.float32)
    c = np.asarray(B.clip(jnp.asarray(b), 100, 100))
    np.testing.assert_allclose(c, [[0, 0, 10, 10], [90, 90, 100, 100]])
    np.testing.assert_allclose(np.asarray(B.area(jnp.asarray(c))), [100, 100])


def test_hflip_involution():
    b = rand_boxes(10)
    out = np.asarray(B.hflip(B.hflip(jnp.asarray(b), 128.0), 128.0))
    np.testing.assert_allclose(out, b, atol=1e-5)
    f = np.asarray(B.hflip(jnp.asarray(b), 128.0))
    assert np.all(f[:, 2] >= f[:, 0])  # stays well-formed


@pytest.mark.parametrize("factor", [1.0, 1.5, 2.0, 4.0])
def test_expand_foveal(factor):
    b = rand_boxes(10)
    e = np.asarray(B.expand(jnp.asarray(b), factor))
    # same center
    np.testing.assert_allclose(
        (e[:, :2] + e[:, 2:]) / 2, (b[:, :2] + b[:, 2:]) / 2, atol=1e-4
    )
    # scaled extents
    np.testing.assert_allclose(
        e[:, 2] - e[:, 0], (b[:, 2] - b[:, 0]) * factor, rtol=1e-5
    )
    # clipped variant stays in image
    ec = np.asarray(B.expand(jnp.asarray(b), factor, 100.0, 100.0))
    assert ec.min() >= 0 and ec.max() <= 100
