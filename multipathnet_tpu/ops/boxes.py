"""Box math — IoU, Fast R-CNN delta encode/decode, clip, flip, foveal expansion.

Replaces the reference's utils.lua tensor box code and the ConvertFrom/BBoxNorm
modules (SURVEY.md §2.1, unverified names — empty mount). The delta
parameterization is the Fast R-CNN one (paper §2.3, arXiv:1504.08083):

    tx = (gx - px) / pw      tw = log(gw / pw)
    ty = (gy - py) / ph      th = log(gh / ph)

Boxes are (x1, y1, x2, y2) in continuous 0-based coordinates; width = x2 - x1
(no +1 — see DESIGN.md "Conventions"). All functions are jittable, broadcast over
leading axes, and treat zero-area padded boxes safely (no NaN/Inf).
"""

from __future__ import annotations

import jax.numpy as jnp

# Clamp on tw/th deltas before exp: exp(4.14) ~ 63x growth, matches common practice
# (log(1000/16)); prevents overflow from garbage padded rows.
BBOX_XFORM_CLIP = 4.135166556742356

_EPS = 1e-8


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (...). Degenerate boxes get area 0."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def to_center_form(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1,y1,x2,y2) -> (cx,cy,w,h)."""
    wh = boxes[..., 2:4] - boxes[..., 0:2]
    c = boxes[..., 0:2] + 0.5 * wh
    return jnp.concatenate([c, wh], axis=-1)


def from_center_form(cboxes: jnp.ndarray) -> jnp.ndarray:
    """(cx,cy,w,h) -> (x1,y1,x2,y2)."""
    half = 0.5 * cboxes[..., 2:4]
    return jnp.concatenate(
        [cboxes[..., 0:2] - half, cboxes[..., 0:2] + half], axis=-1
    )


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU: a (..., N, 4), b (..., M, 4) -> (..., N, M).

    Replaces utils.boxoverlap (SURVEY.md §3.4 hot loop). Zero-area (padded)
    boxes yield IoU 0 against everything.
    """
    a_ = a[..., :, None, :]
    b_ = b[..., None, :, :]
    lt = jnp.maximum(a_[..., 0:2], b_[..., 0:2])
    rb = jnp.minimum(a_[..., 2:4], b_[..., 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(a)[..., :, None] + area(b)[..., None, :] - inter
    return inter / jnp.maximum(union, _EPS)


def encode(rois: jnp.ndarray, gt: jnp.ndarray,
           means=(0.0, 0.0, 0.0, 0.0), stds=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Regression targets for matched (roi, gt) pairs; both (..., 4) -> (..., 4).

    Fast R-CNN delta form, then normalized by (means, stds) — the BBoxNorm
    behavior (SURVEY.md §2.1). Safe on degenerate rois (clamped to eps size).
    """
    r = to_center_form(rois)
    g = to_center_form(gt)
    rw = jnp.maximum(r[..., 2], _EPS)
    rh = jnp.maximum(r[..., 3], _EPS)
    tx = (g[..., 0] - r[..., 0]) / rw
    ty = (g[..., 1] - r[..., 1]) / rh
    tw = jnp.log(jnp.maximum(g[..., 2], _EPS) / rw)
    th = jnp.log(jnp.maximum(g[..., 3], _EPS) / rh)
    t = jnp.stack([tx, ty, tw, th], axis=-1)
    means = jnp.asarray(means, t.dtype)
    stds = jnp.asarray(stds, t.dtype)
    return (t - means) / stds


def decode(rois: jnp.ndarray, deltas: jnp.ndarray,
           means=(0.0, 0.0, 0.0, 0.0), stds=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Apply predicted deltas to boxes (ConvertFrom analog). (..., 4) each.

    Denormalizes by (means, stds) first; tw/th are clamped (BBOX_XFORM_CLIP)
    so garbage padded rows can't overflow exp.
    """
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    d = deltas * stds + means
    r = to_center_form(rois)
    rw = jnp.maximum(r[..., 2], _EPS)
    rh = jnp.maximum(r[..., 3], _EPS)
    cx = d[..., 0] * rw + r[..., 0]
    cy = d[..., 1] * rh + r[..., 1]
    w = jnp.exp(jnp.minimum(d[..., 2], BBOX_XFORM_CLIP)) * rw
    h = jnp.exp(jnp.minimum(d[..., 3], BBOX_XFORM_CLIP)) * rh
    return from_center_form(jnp.stack([cx, cy, w, h], axis=-1))


def clip(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """Clip boxes to [0, width] x [0, height]."""
    x1 = jnp.clip(boxes[..., 0], 0.0, width)
    y1 = jnp.clip(boxes[..., 1], 0.0, height)
    x2 = jnp.clip(boxes[..., 2], 0.0, width)
    y2 = jnp.clip(boxes[..., 3], 0.0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def hflip(boxes: jnp.ndarray, width) -> jnp.ndarray:
    """Horizontal flip within an image of the given width."""
    x1 = width - boxes[..., 2]
    x2 = width - boxes[..., 0]
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def expand(boxes: jnp.ndarray, factor, height=None, width=None) -> jnp.ndarray:
    """Foveal context expansion (MultiPath §3.1): scale each box by `factor`
    about its center; optionally clip to the image. Factor may be scalar or
    broadcastable to boxes[..., 0]."""
    c = to_center_form(boxes)
    f = jnp.asarray(factor, boxes.dtype)
    wh = c[..., 2:4] * f[..., None]
    out = from_center_form(jnp.concatenate([c[..., 0:2], wh], axis=-1))
    if height is not None and width is not None:
        out = clip(out, height, width)
    return out
