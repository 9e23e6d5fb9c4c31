"""On-device detection path: (image, proposals) -> final boxes/scores/classes.

Rebuilds ImageDetect.lua + the test-time pieces of utils.lua (SURVEY.md §2.1,
§3.2 call stack) with the boundary moved per the north star: the reference
uploaded the image, downloaded raw scores, and did NMS on host; here
proposals -> final detections is ONE jitted graph (resize/normalize, trunk,
chunked ROI heads, integral-softmax averaging, delta decode, class-aware NMS)
and only the final fixed-size detection set leaves the device.

Reference analogies:
  - SequentialSplitBatch (ROI chunking ~512)  -> lax.map over static chunks
  - 6-softmax averaging at test time [H]      -> probs.mean over the K axis
  - BBoxNorm denorm + ConvertFrom decode      -> ops.boxes.decode(means, stds)
  - per-class threshold + NMS + keep<=100     -> ops.nms.multiclass_nms
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from multipathnet_tpu.core.config import Config
from multipathnet_tpu.data import transforms
from multipathnet_tpu.models.multipath import MultiPathNet
from multipathnet_tpu.ops import boxes as box_ops
from multipathnet_tpu.ops import nms as nms_ops


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def score_batch(params, model: MultiPathNet, cfg: Config,
                images_u8: jnp.ndarray,   # (B, H0, W0, 3) uint8, padded raw
                src_hws: jnp.ndarray,     # (B, 2) valid (h, w) per image
                proposals: jnp.ndarray):  # (B, P, 4) original image coords
    """Jittable proposal scoring: image + proposals -> per-class probabilities
    and decoded per-class boxes (original coords), BEFORE NMS.

    This is the reference ImageDetect boundary (SURVEY.md §3.2: it returned
    per-class scores + decoded boxes; testCoco did NMS afterwards). Exposed
    separately so chunk-invariance can be asserted on the continuous
    quantities — NMS downstream turns ULP-level score ties into discrete
    output differences by design.
    Returns (boxes (B, P, C, 4), probs (B, P, C))."""
    canvas_hw = cfg.data.image_size
    b, p = proposals.shape[:2]

    canvases, scales = transforms.batch_resize_to_canvas(
        images_u8, canvas_hw, src_hws, preprocess=cfg.model.preprocess)
    rois = proposals * scales[:, None, None]

    feats = model.apply(params, canvases, method=MultiPathNet.features)

    # The Pallas ROI path streams fixed windows (no gather blowup), so it
    # needs no SequentialSplitBatch-style chunking: one pass over all P.
    impl = cfg.model.roi_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "direct"
    chunk = p if impl == "pallas" else min(cfg.eval.roi_chunk, p)
    p_pad = _round_up(p, chunk)
    rois_p = jnp.pad(rois, ((0, 0), (0, p_pad - p), (0, 0)))
    n_chunks = p_pad // chunk

    # int8 serving + Pallas kernels: the head's bias/relu/quantize runs
    # IN-KERNEL and the pool emits int8 + per-view scales directly — same
    # math (roi_pallas._quant_view bit-mirrors quantize_rows), minus the
    # pooled tensor's bf16 write -> read -> int8 rewrite (~3.2 GB of HBM
    # at bench shapes; docs/PERF.md r5 stage table).
    quantized_pool = (cfg.model.head_quant == "int8" and impl == "pallas"
                      and cfg.model.roi_mode != "max")

    skip_bias = (params["params"]["head"]["skip_bias"] if quantized_pool
                 else None)

    def head_chunk(rois_c):  # (B, chunk, 4) -> scores, deltas
        if quantized_pool:
            pooled, pscale = model.apply(
                params, feats, rois_c, canvas_hw, skip_bias,
                method=MultiPathNet.pool_rois_quantized)
            return model.apply(params, pooled,
                               method=MultiPathNet.predict_rois,
                               pooled_scale=pscale)
        pooled = model.apply(params, feats, rois_c, canvas_hw,
                             method=MultiPathNet.pool_rois)
        return model.apply(params, pooled, method=MultiPathNet.predict_rois)

    chunks = rois_p.reshape(b, n_chunks, chunk, 4).transpose(1, 0, 2, 3)
    scores_c, deltas_c = lax.map(head_chunk, chunks)
    # (n_chunks, B, chunk, K, C) -> (B, P, K, C)
    k = scores_c.shape[3]
    scores = scores_c.transpose(1, 0, 2, 3, 4).reshape(b, p_pad, k, -1)[:, :p]
    deltas = deltas_c.transpose(1, 0, 2, 3).reshape(b, p_pad, -1)[:, :p]

    # integral heads: average the K softmaxes (MultiPath §3.3 test protocol)
    probs = jax.nn.softmax(scores, axis=-1).mean(axis=2)  # (B, P, C)
    num_classes = probs.shape[-1]

    # decode class-specific deltas against each proposal
    m = cfg.model
    if m.class_specific_bbox:
        d = deltas.reshape(b, p, num_classes, 4)
    else:
        d = jnp.broadcast_to(deltas[:, :, None, :], (b, p, num_classes, 4))
    boxes = box_ops.decode(rois[:, :, None, :], d,
                           means=m.bbox_reg_means, stds=m.bbox_reg_stds)
    # clip to each image's scaled valid extent, then back to original coords
    lim = src_hws.astype(jnp.float32) * scales[:, None]  # (B, 2) = (h, w)*s
    boxes = jnp.minimum(
        jnp.maximum(boxes, 0.0),
        jnp.stack([lim[:, 1], lim[:, 0], lim[:, 1], lim[:, 0]], -1)[
            :, None, None, :],
    )
    boxes = boxes / scales[:, None, None, None]
    return boxes, probs


def detect_batch(params, model: MultiPathNet, cfg: Config,
                 images_u8: jnp.ndarray,   # (B, H0, W0, 3) uint8, padded raw
                 src_hws: jnp.ndarray,     # (B, 2) valid (h, w) per image
                 proposals: jnp.ndarray,   # (B, P, 4) original image coords
                 prop_mask: jnp.ndarray):  # (B, P) bool
    """Jittable batched detection. Returns dict of (B, D, ...) arrays in
    ORIGINAL image coordinates."""
    boxes, probs = score_batch(params, model, cfg, images_u8, src_hws,
                               proposals)

    # background column dropped; per-class NMS + global top-100 on device
    def one(bx, pr, vm):
        return nms_ops.multiclass_nms(
            bx[:, 1:, :], pr[:, 1:], vm,
            score_threshold=cfg.eval.score_threshold,
            iou_threshold=cfg.eval.nms_iou_threshold,
            pre_nms_per_class=cfg.eval.pre_nms_per_class,
            max_detections=cfg.eval.max_detections,
        )

    out = jax.vmap(one)(boxes, probs, prop_mask)
    out["classes"] = out["classes"] + 1  # back to contiguous labels (bg=0)
    return out


class Detector:
    """User-facing wrapper: holds the jitted graph; feeds numpy, returns numpy.

    The ImageDetect analog — construct once, call per image/batch.

    `mesh`: optional `jax.sharding.Mesh`. When given, the batch axis is
    split over the mesh's "data" axis via `shard_map` and params are
    replicated — DP evaluation over all chips (the reference's
    Tester_FRCNN was single-GPU). shard_map (not GSPMD auto-partitioning)
    on purpose: each device runs the WHOLE detect graph on its local batch
    shard, so the Pallas ROI kernels — opaque custom calls with no SPMD
    partitioning rule — execute per-shard instead of forcing a replicated
    fallback. Per-image independence makes the split exact (equality
    pinned by test_eval_dp_sharding_matches_single_device /
    test_tester_dp_mesh_matches_single_device). The batch size must be a
    multiple of the data-axis width.
    """

    def __init__(self, model: MultiPathNet, params, cfg: Config, mesh=None):
        if model.cfg.fc6_rank or model.cfg.fc7_rank:
            # low-rank serving config on a full-rank FLOAT checkpoint:
            # truncated-SVD factorize at load (ops/lowrank.py, Fast R-CNN
            # §3.1); already-factored trees (serving bundles) pass through.
            # Must precede int8 quantization (SVD needs float kernels).
            from multipathnet_tpu.ops.lowrank import (check_factored_ranks,
                                                      factorize_head_params,
                                                      is_factored)

            if not is_factored(params):
                params = factorize_head_params(
                    params, model.cfg.fc6_rank, model.cfg.fc7_rank)
            else:
                check_factored_ranks(params, model.cfg.fc6_rank,
                                     model.cfg.fc7_rank)
        if model.cfg.head_quant == "int8":
            # serving config on a FLOAT checkpoint: quantize the head once at
            # load (ops/quant.py); already-quantized trees pass through.
            leaves = jax.tree_util.tree_leaves_with_path(params)
            if not any("kernel_i8" in str(p) for p, _ in leaves):
                from multipathnet_tpu.ops.quant import quantize_head_params

                params = quantize_head_params(params)
        self.model, self.params, self.cfg = model, params, cfg
        fn = lambda p, im, hw, pr, pm: detect_batch(p, model, cfg,
                                                    im, hw, pr, pm)
        self.batch_sharding = None
        if mesh is None:
            self._fn = jax.jit(fn)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from multipathnet_tpu.core.mesh import DATA_AXIS

            repl = NamedSharding(mesh, P())
            self.batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
            self._n_data = mesh.shape[DATA_AXIS]
            self.params = jax.device_put(params, repl)
            b = P(DATA_AXIS)
            self._fn = jax.jit(jax.shard_map(
                fn, mesh=mesh, in_specs=(P(), b, b, b, b), out_specs=b))
        self.mesh = mesh

    def __call__(self, images_u8, src_hws, proposals, prop_mask):
        import numpy as np

        if self.mesh is not None:
            b = np.shape(images_u8)[0]
            assert b % self._n_data == 0, (
                f"batch {b} not divisible by data axis {self._n_data}")
        out = self._fn(self.params, jnp.asarray(images_u8),
                       jnp.asarray(src_hws), jnp.asarray(proposals),
                       jnp.asarray(prop_mask))
        return {k: np.asarray(v) for k, v in out.items()}
