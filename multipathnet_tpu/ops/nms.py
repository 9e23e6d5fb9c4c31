"""On-device NMS — static shapes, no host round-trips.

Replaces the reference's host-side Lua NMS loop (SURVEY.md §2.1 utils.nms,
§3.2: per-class suppression on host). TPU design (DESIGN.md):

  1. `nms`          — single-class pick-max/suppress loop, at most `max_out`
                      sequential steps (not N), each step fully vectorized.
  2. `batched_nms`  — vmapped over a leading class (or image) axis.
  3. `multiclass_nms` — full eval post-processing: per-class top-k candidates,
                      per-class NMS, global top-`max_detections` (COCO's
                      <=100 det/img protocol), all on device.

All functions return fixed-size outputs + validity masks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from multipathnet_tpu.ops import boxes as box_ops

_NEG = -1e10


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        max_out: int, valid: jnp.ndarray | None = None):
    """Greedy NMS over N boxes; returns (indices[max_out], keep_mask[max_out]).

    Iterative pick-argmax / suppress-overlaps: max_out sequential steps, each a
    vectorized argmax + row mask over the precomputed IoU matrix. Matches the
    score-sorted greedy semantics of utils.nms exactly.
    """
    n = boxes.shape[0]
    iou = box_ops.iou_matrix(boxes, boxes)  # (N, N)
    s = scores if valid is None else jnp.where(valid, scores, _NEG)
    s = jnp.where(jnp.isfinite(s), s, _NEG)

    def body(carry, _):
        s_live = carry
        i = jnp.argmax(s_live)
        ok = s_live[i] > _NEG / 2
        # suppress i itself and everything overlapping it above threshold
        row = iou[i] > iou_threshold
        kill = row | (jnp.arange(n) == i)
        s_next = jnp.where(ok & kill, _NEG, s_live)
        return s_next, (i, ok)

    _, (idx, keep) = lax.scan(body, s, None, length=max_out)
    return idx, keep


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
                max_out: int, valid: jnp.ndarray | None = None):
    """nms vmapped over a leading axis: boxes (B, N, 4), scores (B, N)."""
    fn = partial(nms, iou_threshold=iou_threshold, max_out=max_out)
    if valid is None:
        return jax.vmap(lambda b, s: fn(b, s))(boxes, scores)
    return jax.vmap(lambda b, s, v: fn(b, s, valid=v))(boxes, scores, valid)


def multiclass_nms(
    boxes: jnp.ndarray,          # (N, C, 4) or (N, 4) shared across classes
    scores: jnp.ndarray,         # (N, C) — foreground class scores only
    valid: jnp.ndarray,          # (N,) proposal validity
    *,
    score_threshold: float,
    iou_threshold: float,
    pre_nms_per_class: int,
    max_detections: int,
):
    """Full detection post-processing on device (SURVEY.md §3.2 boundary note).

    Returns dict of fixed-size arrays:
      boxes (D, 4), scores (D,), classes (D,) int32 (0-based fg class),
      valid (D,) bool — D = max_detections.
    """
    n, c = scores.shape
    if boxes.ndim == 2:
        boxes = jnp.broadcast_to(boxes[:, None, :], (n, c, 4))

    s = jnp.where(valid[:, None], scores, _NEG)
    s = jnp.where(s >= score_threshold, s, _NEG)

    k = min(pre_nms_per_class, n)
    # per-class top-k candidates: (C, k)
    s_t = s.T  # (C, N)
    top_s, top_i = lax.top_k(s_t, k)
    cls_boxes = jnp.take_along_axis(
        boxes.transpose(1, 0, 2), top_i[..., None], axis=1
    )  # (C, k, 4)

    idx, keep = batched_nms(cls_boxes, top_s, iou_threshold, max_out=k)
    # gather kept entries per class
    kept_s = jnp.take_along_axis(top_s, idx, axis=1)
    kept_s = jnp.where(keep & (kept_s > _NEG / 2), kept_s, _NEG)
    kept_b = jnp.take_along_axis(cls_boxes, idx[..., None], axis=1)
    kept_c = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[:, None], (c, k))

    # provenance: each kept candidate's source proposal index (lets callers
    # attach per-proposal payloads — e.g. segmentation masks — to detections)
    kept_src = jnp.take_along_axis(top_i, idx, axis=1)  # (C, k)

    # global top max_detections across (C * k) candidates
    flat_s = kept_s.reshape(-1)
    flat_b = kept_b.reshape(-1, 4)
    flat_c = kept_c.reshape(-1)
    flat_src = kept_src.reshape(-1)
    d = min(max_detections, flat_s.shape[0])
    fs, fi = lax.top_k(flat_s, d)
    out = {
        "boxes": flat_b[fi],
        "scores": fs,
        "classes": flat_c[fi],
        "indices": flat_src[fi].astype(jnp.int32),
        "valid": fs > _NEG / 2,
    }
    if d < max_detections:
        pad = max_detections - d
        out = {
            "boxes": jnp.pad(out["boxes"], ((0, pad), (0, 0))),
            "scores": jnp.pad(out["scores"], (0, pad), constant_values=_NEG),
            "classes": jnp.pad(out["classes"], (0, pad)),
            "indices": jnp.pad(out["indices"], (0, pad)),
            "valid": jnp.pad(out["valid"], (0, pad)),
        }
    out["scores"] = jnp.where(out["valid"], out["scores"], 0.0)
    return out
