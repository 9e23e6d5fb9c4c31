"""Training losses: integral cross-entropy + smooth-L1 box regression.

Rebuilds the reference's criterion stack (SURVEY.md §3.1: ParallelCriterion of
K CrossEntropy heads + BBoxRegressionCriterion):

- integral classification (MultiPath §3.3): K softmax heads, head k trained
  with fg-IoU threshold t_k. Aggregation over heads is CONFIGURABLE
  (`integral_agg`): "sum" is the paper-literal integral approximation
  L = sum_k CE_k (ParallelCriterion semantics, cls:bbox balance K:1);
  "mean" (default) divides by K, balancing cls:bbox 1:1 like single-head
  Fast R-CNN. The default deviates from the paper DELIBERATELY: on the
  synthetic overfit benchmark (tests/test_e2e.py, 30 epochs, lr 2e-2)
  "mean" reaches AP50 0.82 while "sum" stalls at 0.21 — with random-init
  trunks the K-fold classification gradient starves box regression. Both
  paths' arithmetic is pinned by tests/test_train.py::test_integral_loss_agg.
- bbox regression (Fast R-CNN §2.3 / BBoxRegressionCriterion): smooth-L1 on
  positive ROIs only, on the class-specific 4-slice of the 4C-dim output
  (PosSlicer analog is the fg mask — no routing module needed in masked SPMD).

All terms are masked means over valid ROI slots (padding never contributes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from multipathnet_tpu.data.sampler import RoiSample, integral_labels


def smooth_l1(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def detection_loss(
    scores: jnp.ndarray,   # (B, S, K, C) f32 logits
    deltas: jnp.ndarray,   # (B, S, 4C) or (B, S, 4) f32
    sample: RoiSample,     # batched (B, S, ...)
    *,
    integral_thresholds,
    num_classes: int,
    class_specific_bbox: bool = True,
    bbox_loss_weight: float = 1.0,
    integral_agg: str = "mean",
):
    """Returns (total_loss, metrics dict)."""
    b, s, k, c = scores.shape
    labels = integral_labels(sample.matched_class, sample.max_iou,
                             sample.is_fg, integral_thresholds)  # (B, S, K)
    valid = sample.valid.astype(jnp.float32)
    n_valid = jnp.maximum(valid.sum(), 1.0)

    ce = optax.softmax_cross_entropy_with_integer_labels(
        scores, labels
    )  # (B, S, K)
    ce = (ce * valid[..., None]).sum(axis=(0, 1)) / n_valid  # per-head mean
    # "sum" = paper-literal integral loss; "mean" = default (see module
    # docstring for the measured rationale)
    cls_loss = ce.sum() if integral_agg == "sum" else ce.mean()

    fg = (sample.is_fg & sample.valid).astype(jnp.float32)
    if class_specific_bbox:
        d = deltas.reshape(b, s, num_classes, 4)
        idx = jnp.broadcast_to(
            sample.matched_class[..., None, None].astype(jnp.int32),
            (b, s, 1, 4))
        d = jnp.take_along_axis(d, idx, axis=2)[:, :, 0, :]
    else:
        d = deltas
    reg = smooth_l1(d - sample.bbox_targets).sum(-1)  # (B, S)
    # Fast R-CNN normalizes by the total sampled ROI count, not fg count
    bbox_loss = (reg * fg).sum() / n_valid

    # accuracy of head 0 (threshold 0.5) on valid slots, for monitoring
    pred0 = scores[..., 0, :].argmax(-1)
    acc0 = ((pred0 == labels[..., 0]).astype(jnp.float32) * valid).sum() / n_valid

    total = cls_loss + bbox_loss_weight * bbox_loss
    metrics = {
        "loss": total,
        "loss_cls": cls_loss,
        "loss_bbox": bbox_loss,
        "acc_head0": acc0,
        "num_fg": fg.sum(),
        "num_valid": valid.sum(),
    }
    for ki in range(k):
        metrics[f"loss_cls_h{ki}"] = ce[ki]
    return total, metrics
