"""Jittable fg/bg ROI sampling — the BatchProviderROI redesign.

The reference sampled ROIs in host Lua donkey threads (SURVEY.md §2.1
BatchProviderROI, §3.4 call stack): IoU-match proposals to GT, draw 25% fg
(IoU >= 0.5) / 75% bg (IoU in [0.1, 0.5)), build regression targets. That host
loop was the classic input-bound risk (§3.1 note). Here the whole stack is a
deterministic, PRNG-keyed, masked device computation on padded tensors — it
fuses into the train step (SURVEY.md §3.4 closing note).

Sampling without replacement uses the Gumbel-top-k trick (uniform random keys
+ masked top_k), which is exact category-free reservoir sampling and fully
vectorized.

Fast R-CNN conventions (paper §2.3): GT boxes join the proposal pool, fg
threshold 0.5, bg range [0.1, 0.5), fg fraction 0.25.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from multipathnet_tpu.ops import boxes as box_ops


class RoiSample(NamedTuple):
    rois: jnp.ndarray           # (S, 4) sampled boxes, image coords
    matched_class: jnp.ndarray  # (S,) int32 — class of best-IoU GT (1..C-1)
    max_iou: jnp.ndarray        # (S,) f32 — IoU with that GT
    bbox_targets: jnp.ndarray   # (S, 4) f32 — normalized deltas to that GT
    is_fg: jnp.ndarray          # (S,) bool — sampled from the fg pool
    valid: jnp.ndarray          # (S,) bool — slot actually holds a candidate


def _masked_topk_sample(key, candidate_mask: jnp.ndarray, k: int):
    """Draw up to k distinct indices uniformly from candidate_mask==True.
    Returns (idx (k,), got (k,) bool)."""
    n = candidate_mask.shape[0]
    noise = jax.random.uniform(key, candidate_mask.shape)
    scores = jnp.where(candidate_mask, noise, -1.0)
    kk = min(k, n)
    _, idx = lax.top_k(scores, kk)
    got = jnp.take(candidate_mask, idx)
    if kk < k:  # pool smaller than request: pad with invalid slots
        idx = jnp.concatenate([idx, jnp.zeros(k - kk, idx.dtype)])
        got = jnp.concatenate([got, jnp.zeros(k - kk, bool)])
    return idx, got


def sample_rois(
    key: jax.Array,
    proposals: jnp.ndarray,    # (P, 4)
    prop_mask: jnp.ndarray,    # (P,) bool
    gt_boxes: jnp.ndarray,     # (G, 4)
    gt_classes: jnp.ndarray,   # (G,) int32, 1..C-1
    gt_mask: jnp.ndarray,      # (G,) bool
    *,
    rois_per_image: int = 64,
    fg_fraction: float = 0.25,
    fg_iou_threshold: float = 0.5,
    bg_iou_range: tuple = (0.1, 0.5),
    bbox_reg_means=(0.0, 0.0, 0.0, 0.0),
    bbox_reg_stds=(0.1, 0.1, 0.2, 0.2),
) -> RoiSample:
    """One image's ROI minibatch. Pure, jittable, vmappable over a batch."""
    # GT joins the pool (guarantees fg candidates exist)
    pool = jnp.concatenate([proposals, gt_boxes], 0)
    pool_mask = jnp.concatenate([prop_mask, gt_mask], 0)

    iou = box_ops.iou_matrix(pool, gt_boxes)          # (P+G, G)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)      # invalid GT never matches
    max_iou = iou.max(axis=1)
    argmax_gt = iou.argmax(axis=1)
    matched_class = jnp.take(gt_classes, argmax_gt)
    matched_box = jnp.take(gt_boxes, argmax_gt, axis=0)

    fg_pool = (max_iou >= fg_iou_threshold) & pool_mask
    bg_pool = (
        (max_iou >= bg_iou_range[0]) & (max_iou < bg_iou_range[1]) & pool_mask
    )

    n_fg = int(round(rois_per_image * fg_fraction))
    n_bg = rois_per_image - n_fg
    k_fg, k_bg = jax.random.split(key)
    fg_idx, fg_got = _masked_topk_sample(k_fg, fg_pool, n_fg)
    bg_idx, bg_got = _masked_topk_sample(k_bg, bg_pool, n_bg)

    idx = jnp.concatenate([fg_idx, bg_idx])
    valid = jnp.concatenate([fg_got, bg_got])
    is_fg = jnp.concatenate(
        [jnp.ones(n_fg, bool), jnp.zeros(n_bg, bool)]) & valid

    rois = jnp.take(pool, idx, axis=0)
    s_max_iou = jnp.take(max_iou, idx)
    s_cls = jnp.where(is_fg, jnp.take(matched_class, idx), 0)
    targets = box_ops.encode(
        rois, jnp.take(matched_box, idx, axis=0),
        means=bbox_reg_means, stds=bbox_reg_stds,
    )
    targets = jnp.where(is_fg[:, None], targets, 0.0)
    return RoiSample(rois, s_cls.astype(jnp.int32), s_max_iou, targets,
                     is_fg, valid)


def sample_batch(key, proposals, prop_mask, gt_boxes, gt_classes, gt_mask,
                 **kw) -> RoiSample:
    """vmapped sampler: leading batch axis on every tensor arg."""
    b = proposals.shape[0]
    keys = jax.random.split(key, b)
    return jax.vmap(lambda k, p, pm, gb, gc, gm: sample_rois(
        k, p, pm, gb, gc, gm, **kw
    ))(keys, proposals, prop_mask, gt_boxes, gt_classes, gt_mask)


def integral_labels(matched_class: jnp.ndarray, max_iou: jnp.ndarray,
                    is_fg: jnp.ndarray,
                    thresholds) -> jnp.ndarray:
    """Per-head labels for the integral loss (MultiPath §3.3): head k treats a
    sampled ROI as its matched class iff IoU >= threshold_k, else background.
    matched_class/max_iou/is_fg: (..., S); returns (..., S, K) int32."""
    thr = jnp.asarray(thresholds)
    fg_k = is_fg[..., None] & (max_iou[..., None] >= thr)
    return jnp.where(fg_k, matched_class[..., None], 0).astype(jnp.int32)
