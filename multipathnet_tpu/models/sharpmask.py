"""SharpMask-style proposal generator — the reference's proposal source.

The reference consumes DeepMask/SharpMask proposals from sibling repos (only
demo.lua runs the generator itself — SURVEY.md §3.3; BASELINE.json config 5 is
the end-to-end SharpMask -> MultiPath pipeline). This module is a TPU-native
proposal network with the same capability surface:

  - dense class-agnostic objectness over positions x anchor scales x
    aspects on the shared trunk (DeepMask's sliding-window objectness,
    expressed as 1x1 convs — no image pyramid, multi-scale/aspect anchors
    instead: static shapes),
  - box regression per anchor (proposals as boxes for the detector),
  - a stage-2 box cascade (r4): top-K stage-1 boxes are ROI-pooled on the
    neck and given a corrective delta + quality re-score — single-shot
    anchor regression capped generated quality at median IoU ~0.19; the
    cascade lifts the same fixture to 0.59-0.80 (tests/test_sharpmask.py),
  - a coarse mask head per top-K proposal + one top-down refinement stage
    mixing in fine trunk features (the "Sharp" in SharpMask), giving
    segmentation proposals like the reference's .t7 mask files,
  - `generate(...)`: image -> top-K (boxes, scores, masks) fully on device,
    ready to feed eval/detect.py.

Everything is static-shaped: top-K via lax.top_k, masks decoded for exactly K
proposals via the same windowed pyramid kernel machinery as the detector.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from multipathnet_tpu.core.config import ModelConfig
from multipathnet_tpu.models.backbones import get_backbone
from multipathnet_tpu.ops import boxes as box_ops
from multipathnet_tpu.ops import roi as roi_ops


def anchor_boxes(h: int, w: int, stride: int,
                 scales: Tuple[float, ...],
                 aspects: Tuple[float, ...] = (1.0,)) -> jnp.ndarray:
    """(H*W*A*R, 4) anchors centered on each stride-cell: per scale s and
    aspect a, width s*sqrt(a) x height s/sqrt(a) (equal-area family — the
    RPN convention). aspects=(1.0,) reproduces the r1-r3 square anchors;
    the synthetic/COCO object distribution spans ~1:3 aspect, which square
    anchors cap at IoU ~0.58 before regression (r3 VERDICT weak #3)."""
    ys = (jnp.arange(h) + 0.5) * stride
    xs = (jnp.arange(w) + 0.5) * stride
    cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
    centers = jnp.stack([cx, cy], -1).reshape(-1, 1, 2)  # (HW, 1, 2)
    s = jnp.asarray(scales, jnp.float32)[:, None]        # (S, 1)
    ra = jnp.sqrt(jnp.asarray(aspects, jnp.float32))[None, :]  # (1, R)
    wh = jnp.stack([jnp.broadcast_to(s * ra, s.shape[:1] + ra.shape[1:]),
                    jnp.broadcast_to(s / ra, s.shape[:1] + ra.shape[1:])],
                   -1).reshape(1, -1, 2)                 # (1, S*R, 2)
    half = jnp.broadcast_to(wh / 2.0, (centers.shape[0],) + wh.shape[1:])
    c = jnp.broadcast_to(centers, half.shape)
    return jnp.concatenate([c - half, c + half], -1).reshape(-1, 4)


def _pool_rois(fmap, rois_b, stride, size, impl):
    """(B,H,W,C) features + (B,K,4) image-coord rois -> (B,K,g,g,C).

    impl="pyramid": windowed-pyramid pooling (eval — 6x faster on the v5e,
    docs/PERF.md config-5); "direct": gather roi_align (training — exact
    gradients; the vmapped pyramid-slice backward compiles pathologically,
    same as the detector's pool)."""
    if impl == "pyramid":
        from multipathnet_tpu.ops import roi_pyramid as RP

        def one(f, r):
            pyr = RP.build_pyramid(f, 1.0 / stride, output_size=size)
            return RP.pyramid_roi_align(pyr, r, output_size=size,
                                        samples_per_bin=1)

        return jax.vmap(one)(fmap, rois_b)
    return jax.vmap(lambda f, r: roi_ops.roi_align(
        f, r, output_size=size, spatial_scale=1.0 / stride,
        samples_per_bin=1))(fmap, rois_b)


class SharpMaskNet(nn.Module):
    """Trunk + dense objectness/box heads + stage-2 box cascade + refined
    mask decoder."""

    cfg: ModelConfig
    anchor_scales: Tuple[float, ...] = (48.0, 96.0, 192.0, 384.0)
    anchor_aspects: Tuple[float, ...] = (0.5, 1.0, 2.0)
    neck_level: str = "c5"  # c4 for small canvases (denser anchor grid)
    mask_size: int = 28
    head_dim: int = 256

    def setup(self):
        dtype = jnp.dtype(self.cfg.dtype)
        self.backbone = get_backbone(self.cfg.backbone, dtype)
        self.neck = nn.Conv(self.head_dim, (3, 3), padding="SAME",
                            dtype=dtype, name="neck")
        a = len(self.anchor_scales) * len(self.anchor_aspects)
        self.score_head = nn.Conv(a, (1, 1), dtype=dtype, name="score")
        self.box_head = nn.Conv(4 * a, (1, 1), dtype=dtype,
                                kernel_init=nn.initializers.normal(1e-3),
                                name="box")
        # coarse mask decoder on ROI-pooled neck features (DeepMask head)
        self.mask_fc = nn.Dense(self.mask_size * self.mask_size // 4,
                                dtype=dtype, name="mask_fc")
        # refinement: fuse fine trunk features (SharpMask top-down stage)
        self.refine_conv = nn.Conv(8, (3, 3), padding="SAME", dtype=dtype,
                                   name="refine_conv")
        self.refine_out = nn.Conv(1, (3, 3), padding="SAME", dtype=dtype,
                                  name="refine_out")
        # stage-2 box cascade (r4): ROI-pooled neck features at the stage-1
        # decoded boxes -> corrective delta + quality logit. Single-shot
        # anchor regression from one coarse cell capped generated-proposal
        # quality at median IoU ~0.19 (r3 VERDICT weak #3); re-reading the
        # features AT the predicted box is the standard cascade fix and is
        # TPU-shaped (static top-K, one more pool + two GEMMs).
        self.box_refine_fc = nn.Dense(self.head_dim, dtype=dtype,
                                      name="box_refine_fc")
        self.box_refine_delta = nn.Dense(
            4, dtype=dtype, kernel_init=nn.initializers.normal(1e-3),
            name="box_refine_delta")
        self.box_refine_logit = nn.Dense(1, dtype=dtype,
                                         name="box_refine_logit")

    # -- dense heads ---------------------------------------------------------
    def dense(self, images: jnp.ndarray, train: bool = False):
        """images (B,H,W,3) -> (anchors (N,4), scores (B,N), deltas (B,N,4),
        feats dict)."""
        feats = self.backbone(images, train=train)
        neck = nn.relu(self.neck(feats[self.neck_level]))
        b, fh, fw, _ = neck.shape
        stride = images.shape[1] // fh
        anchors = anchor_boxes(fh, fw, stride, self.anchor_scales,
                               self.anchor_aspects)
        scores = self.score_head(neck).astype(jnp.float32).reshape(b, -1)
        deltas = self.box_head(neck).astype(jnp.float32).reshape(b, -1, 4)
        feats["neck"] = neck
        return anchors, scores, deltas, feats

    # -- mask decoding for given rois ----------------------------------------
    def decode_masks(self, feats: dict, rois: jnp.ndarray,
                     image_hw, impl: str = "pyramid") -> jnp.ndarray:
        """feats from dense(); rois (B, K, 4) -> mask logits (B, K, M, M).

        impl="pyramid" (eval default): windowed-pyramid pooling — the 28x28
        fine-feature crop through the direct gather measured 163.5 ms for
        3200 ROIs on the v5e vs 27.5 ms through the pyramid (docs/PERF.md
        config-5 section); same roi_align math at pyramid-level granularity
        (closeness pinned by tests/test_sharpmask.py). Training passes
        "direct" — exact gradients, and the vmapped pyramid-slice backward
        compiles pathologically (same reason the detector's pool_rois pins
        direct for training)."""
        m = self.mask_size
        b, k = rois.shape[:2]
        stride_neck = image_hw[0] // feats["neck"].shape[1]
        stride_c3 = image_hw[0] // feats["c3"].shape[1]

        def pool(fmap, r_b, stride, size):
            return _pool_rois(fmap, r_b, stride, size, impl)

        coarse_feat = pool(feats["neck"], rois, stride_neck, 7)
        coarse = self.mask_fc(coarse_feat.reshape(b * k, -1))
        half = self.mask_size // 2
        coarse = coarse.reshape(b * k, half, half, 1)
        coarse = jax.image.resize(coarse, (b * k, m, m, 1), "bilinear")
        # refinement with fine features pooled at mask resolution
        fine = pool(feats["c3"], rois, stride_c3, m)
        fine = fine.reshape(b * k, m, m, -1)
        r = nn.relu(self.refine_conv(fine))
        out = self.refine_out(jnp.concatenate(
            [coarse.astype(r.dtype), r], axis=-1))
        return out.astype(jnp.float32).reshape(b, k, m, m)

    # -- stage-2 box cascade ---------------------------------------------
    def refine_boxes(self, feats: dict, rois: jnp.ndarray, image_hw,
                     impl: str = "pyramid"):
        """feats from dense(); rois (B, K, 4) stage-1 boxes in image
        coords -> (deltas (B, K, 4) f32, quality logits (B, K) f32).

        Pools the neck at each box and predicts a corrective Fast R-CNN
        delta plus an objectness re-score — the second regression stage of
        the proposal cascade (see box_refine_* in setup)."""
        b, k = rois.shape[:2]
        stride = image_hw[0] // feats["neck"].shape[1]
        pooled = _pool_rois(feats["neck"], rois, stride, 7, impl)
        x = nn.relu(self.box_refine_fc(pooled.reshape(b * k, -1)))
        deltas = self.box_refine_delta(x).astype(jnp.float32)
        logits = self.box_refine_logit(x).astype(jnp.float32)
        return deltas.reshape(b, k, 4), logits.reshape(b, k)

    def __call__(self, images: jnp.ndarray, rois: jnp.ndarray,
                 train: bool = False):
        """Training contract: dense heads everywhere + stage-2 refinement
        and masks for the given rois."""
        anchors, scores, deltas, feats = self.dense(images, train=train)
        impl = "direct" if train else "pyramid"
        masks = self.decode_masks(feats, rois, images.shape[1:3], impl=impl)
        ref_deltas, ref_logits = self.refine_boxes(
            feats, rois, images.shape[1:3], impl=impl)
        return anchors, scores, deltas, masks, (ref_deltas, ref_logits)


def generate_proposals(model: SharpMaskNet, params, images: jnp.ndarray,
                       *, top_k: int = 256, with_masks: bool = True,
                       refine: bool = True,
                       score_activation=jax.nn.sigmoid):
    """Jittable: images (B,H,W,3) normalized -> dict of top-K proposals.

    boxes (B,K,4) decoded+clipped, scores (B,K), masks (B,K,M,M) sigmoid
    logits (omitted when with_masks=False).

    refine=True (default) runs the stage-2 cascade: the top-K stage-1
    boxes are re-pooled and corrected (refine_boxes), and the final score
    is the geometric mean of the stage-1 and stage-2 probabilities —
    stage 2 sees the actual box so its quality estimate ranks tighter
    boxes higher (measured on the 64px fixture: median IoU 0.19 -> see
    tests/test_sharpmask.py), while stage 1 keeps recall information.
    Masks are decoded at the REFINED boxes."""
    h, w = images.shape[1:3]
    anchors, scores, deltas, feats = model.apply(
        params, images, method=SharpMaskNet.dense)
    s, idx = jax.lax.top_k(scores, top_k)  # (B, K)
    sel_anchors = jnp.take(anchors, idx, axis=0)  # (B, K, 4)
    sel_deltas = jnp.take_along_axis(deltas, idx[..., None], axis=1)
    boxes = box_ops.clip(box_ops.decode(sel_anchors, sel_deltas,
                                        stds=(0.1, 0.1, 0.2, 0.2)),
                         float(h), float(w))
    prob = score_activation(s)
    if refine:
        ref_deltas, ref_logits = model.apply(
            params, feats, boxes, (h, w), method=SharpMaskNet.refine_boxes)
        boxes = box_ops.clip(box_ops.decode(boxes, ref_deltas,
                                            stds=(0.1, 0.1, 0.2, 0.2)),
                             float(h), float(w))
        prob = jnp.sqrt(prob * jax.nn.sigmoid(ref_logits))
    out = {"boxes": boxes, "scores": prob}
    if with_masks:
        out["masks"] = jax.nn.sigmoid(
            model.apply(params, feats, boxes, (h, w),
                        method=SharpMaskNet.decode_masks))
    return out
