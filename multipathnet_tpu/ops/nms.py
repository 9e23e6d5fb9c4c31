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


def nms_sorted(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float):
    """Greedy NMS for DESCENDING-sorted scores, as a parallel fixpoint.

    Greedy NMS is the unique solution of the recurrence
        keep_i = ok_i and not exists j<i: keep_j and iou(j, i) > t
    (for score-sorted candidates; argmax tie-breaking == stable sort order).
    `nms` solves it with N sequential pick/suppress steps — N tiny kernels,
    pure dispatch latency on TPU (~4 ms of the bench batch for 8x80 lanes of
    N=100, docs/PERF.md r5). This solves the SAME recurrence by damped
    iteration: start keep=ok, recompute all rows in parallel, repeat until
    unchanged. After round r every i whose suppression-chain depth < r is
    final, so it converges in (longest alternating suppressor chain) rounds
    — 3-6 in practice — each a vectorized (N, N) mask reduction. Fixpoint ==
    greedy exactly (pinned vs `nms` in tests/test_nms.py).

    Returns keep (N,) bool IN INPUT ORDER (not pick order — the input is
    already score-sorted).
    """
    n = boxes.shape[0]
    iou = box_ops.iou_matrix(boxes, boxes)
    ok = scores > _NEG / 2
    # P[j, i]: candidate j (higher priority: earlier position) suppresses i
    sup = (iou > iou_threshold) & (jnp.arange(n)[:, None]
                                   < jnp.arange(n)[None, :])

    def cond(carry):
        _, changed, it = carry
        return changed & (it < n)

    def body(carry):
        keep, _, it = carry
        kill = jnp.any(sup & keep[:, None], axis=0)
        new = ok & ~kill
        return new, jnp.any(new != keep), it + 1

    # run round 1 eagerly so the `changed` carry is data-derived — a literal
    # True initial carry has no sharding variance and shard_map rejects the
    # mismatched while_loop carry types (tester DP-mesh path)
    keep, changed, it = body((ok, True, 0))
    keep, _, _ = lax.while_loop(cond, body, (keep, changed, it))
    return keep


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

    # top_k output is descending-sorted, so the fixpoint NMS applies
    # directly and kept entries stay in score order — no pick-order gathers
    keep = jax.vmap(partial(nms_sorted, iou_threshold=iou_threshold))(
        cls_boxes, top_s)                               # (C, k)
    kept_s = jnp.where(keep, top_s, _NEG)
    kept_b = cls_boxes
    kept_c = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[:, None], (c, k))

    # provenance: each kept candidate's source proposal index (lets callers
    # attach per-proposal payloads — e.g. segmentation masks — to detections)
    kept_src = top_i  # (C, k)

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
