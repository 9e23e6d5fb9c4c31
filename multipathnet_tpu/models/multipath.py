"""MultiPathNet assembly — trunk + foveal/skip ROI features + heads.

Rebuilds models/multipathnet.lua (SURVEY.md §2.1) as a flax module with the
reference's behavioral contract (input {images, rois} -> {class_scores,
bbox_deltas}) and TPU-native internals: NHWC bf16 trunk, static padded ROI
tensors, fused multi-level+foveal ROI pooling (XLA oracle now, Pallas kernel
drop-in in ops/roi_pallas.py).

Degenerate config = vanilla Fast R-CNN: foveal_scales=(1.0,),
skip_levels=("c5",), integral_thresholds=(0.5,) — the reference's plain
per-trunk model defs (SURVEY.md §2.1) are config presets here, not separate
model files.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from multipathnet_tpu.core.config import ModelConfig
from multipathnet_tpu.models.backbones import get_backbone
from multipathnet_tpu.models.heads import MultiPathHead
from multipathnet_tpu.ops import roi as roi_ops


class MultiPathNet(nn.Module):
    cfg: ModelConfig
    # NoBackprop analog (train-time models only): stop-gradient after trunk
    # stage N, so XLA never builds the frozen backward. Forward-identical;
    # does not change the param tree (checkpoints are interchangeable).
    freeze_stages: int = 0

    def setup(self):
        dtype = jnp.dtype(self.cfg.dtype)
        self.backbone = get_backbone(self.cfg.backbone, dtype,
                                     freeze_stages=self.freeze_stages)
        # ION-style 1x1 skip reduction (MultiPath §3.2), applied PER LEVEL on
        # the trunk maps: pooling is linear, so sum_l(pool(W_l f_l)) equals
        # the reference's reduce(concat_l(pool(f_l))) at 24x fewer FLOPs
        # (trunk pixels, not ROI views x bins — docs/PERF.md). The shared
        # bias + ReLU complete the reduction inside the head.
        self.reduce = {
            l: nn.Conv(self.cfg.skip_reduce_dim, (1, 1), use_bias=False,
                       dtype=dtype, name=f"reduce_{l}")
            for l in self.cfg.skip_levels
        }
        self.head = MultiPathHead(
            num_classes=self.cfg.num_classes,
            foveal_scales=self.cfg.foveal_scales,
            num_integral_heads=len(self.cfg.integral_thresholds),
            fc_dim=self.cfg.fc_dim,
            skip_reduce_dim=self.cfg.skip_reduce_dim,
            class_specific_bbox=self.cfg.class_specific_bbox,
            dtype=dtype,
            quant=self.cfg.head_quant,
            fc6_rank=self.cfg.fc6_rank,
            fc7_rank=self.cfg.fc7_rank,
        )

    def features(self, images: jnp.ndarray, train: bool = False) -> dict:
        """images (B, H, W, 3) normalized float -> {"c3","c4","c5"} NHWC,
        each 1x1-reduced to skip_reduce_dim channels (see setup).

        roi_mode="max" returns the RAW trunk maps: max pooling is not
        linear, so the reduction cannot be hoisted before it — pool_rois
        applies the reference order (pool raw -> concat -> 1x1 reduce)."""
        feats = self.backbone(images, train=train)
        if self.cfg.roi_mode == "max":
            return {l: feats[l] for l in self.cfg.skip_levels}
        return {l: self.reduce[l](feats[l]) for l in self.cfg.skip_levels}

    def _view_level_plan(self):
        """-> list of (foveal_factors tuple, levels tuple) groups, in foveal
        order. "reference" topology (SURVEY.md §3.1 "ROIPool x7"): the 1x
        view pools all skip levels, context views pool only the last level.
        "dense" (§2.2 reading): every view pools every level."""
        fs, ls = self.cfg.foveal_scales, self.cfg.skip_levels
        if (self.cfg.foveal_topology == "dense" or len(fs) == 1
                or len(ls) == 1):
            return [(fs, ls)]
        assert self.cfg.foveal_topology == "reference", self.cfg.foveal_topology
        return [((fs[0],), ls), (tuple(fs[1:]), (ls[-1],))]

    def pool_rois(self, feats: dict, rois: jnp.ndarray,
                  image_hw: tuple, train: bool = False, quant_bias=None):
        """feats: level -> (B, Hl, Wl, C); rois (B, R, 4) image coords.
        -> (B, F, R, G, G, C).

        Implementation per cfg.roi_impl (training pins "direct", the
        differentiable path — the Pallas kernel is forward-only).

        quant_bias: optional (C,) head-dtype skip bias (Pallas align path,
        eval only). When given, bias/relu + the head's per-view int8
        quantization run IN-KERNEL and the return is
        ((B, F, R, G, G, C) int8, (B, F, R, 1) f32 scales) — the exact
        input Int8Dense consumes, skipping the pooled tensor's bf16
        write/read/int8-rewrite round trip (docs/PERF.md r5). Use
        pool_rois_quantized for the param-aware entry point."""
        import jax

        impl = self.cfg.train_roi_impl if train else self.cfg.roi_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "direct"
        if train and impl == "pyramid":
            impl = "direct"  # vmapped-slice path: pathological compile
        assert quant_bias is None or (impl == "pallas" and not train
                                      and self.cfg.roi_mode != "max"), (
            "in-kernel quantized emission needs the eval Pallas align path",
            impl, train, self.cfg.roi_mode)

        strides = self.backbone.feature_strides
        scales = {l: 1.0 / strides[l] for l in self.cfg.skip_levels}

        if self.cfg.roi_mode == "max":
            # training pins the direct path (the windowed max carries no
            # custom VJP and max-mode training is a parity scenario anyway)
            return self._pool_rois_max(feats, rois, image_hw, scales,
                                       impl="direct" if train else impl)

        plan = self._view_level_plan()

        if impl == "direct":
            def group(factors, levels):
                def wrapper(*args):
                    f_b = dict(zip(levels, args[:-1]))
                    return roi_ops.multilevel_foveal_roi_features(
                        f_b, args[-1], scales=scales,
                        foveal_factors=factors,
                        image_hw=image_hw,
                        output_size=self.cfg.roi_output_size,
                        samples_per_bin=self.cfg.roi_samples_per_bin,
                        combine="sum",
                    )

                return jax.vmap(wrapper)(*[feats[l] for l in levels], rois)

            return jnp.concatenate(
                [group(fs_, ls_) for fs_, ls_ in plan], axis=1)

        from multipathnet_tpu.ops import boxes as box_ops
        from multipathnet_tpu.ops import roi_pallas, roi_pyramid

        if impl == "pyramid":  # XLA oracle of the kernel path
            def group(factors, levels):
                def wrapper(*args):
                    pyrs = {
                        l: roi_pyramid.build_pyramid(
                            f_b, scales[l],
                            output_size=self.cfg.roi_output_size)
                        for l, f_b in zip(levels, args[:-1])
                    }
                    return roi_pyramid.multilevel_foveal_pyramid_features(
                        pyrs, args[-1], foveal_factors=factors,
                        image_hw=image_hw,
                        output_size=self.cfg.roi_output_size,
                        samples_per_bin=self.cfg.roi_samples_per_bin,
                        combine="sum",
                    )

                return jax.vmap(wrapper)(*[feats[l] for l in levels], rois)

            return jnp.concatenate(
                [group(fs_, ls_) for fs_, ls_ in plan], axis=1)

        assert impl == "pallas", f"unknown roi_impl {impl!r}"
        b, r = rois.shape[:2]
        g = self.cfg.roi_output_size
        interp = jax.default_backend() != "tpu"
        c = feats[self.cfg.skip_levels[0]].shape[-1]
        assert all(feats[l].shape[-1] == c for l in self.cfg.skip_levels), (
            "pre-reduced skip levels must share C")
        # Mosaic can't lane-merge sub-128-channel windows: pad up to the
        # lane width — moot for production configs (levels are pre-reduced
        # to skip_reduce_dim=512) but kept for small test configs.
        # Interpret mode (CPU tests) has no lane constraint.
        pad_c = 0 if interp else (-c) % 128
        pyramids = {}
        for l in self.cfg.skip_levels:
            lvl_feats = feats[l]
            if pad_c:
                lvl_feats = jnp.pad(
                    lvl_feats, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
            pyramids[l] = roi_pyramid.build_pyramid_batch(
                lvl_feats, scales[l], output_size=g)

        # One fused kernel pass PER PLAN GROUP: the group's L windows are
        # DMA'd per view, the level sum accumulates in registers, one output
        # write (roi_pallas multi-level notes). "reference" topology runs
        # 2 groups (1x view x all levels; context views x last level) = 7
        # windows/ROI instead of dense's 12. Single-level groups whose
        # per-image pyramid fits the VMEM budget (c5 at 640^2 is ~3.3 MB)
        # use the RESIDENT kernel instead: the pyramid is pipelined into
        # VMEM once per image and windows become local copies — B*3 MB of
        # HBM traffic instead of N*160 KB (docs/PERF.md, resident row).
        resident_budget = 4 * 1024 * 1024  # bytes/image, 2x-buffered by Pallas
        qbias = None
        if quant_bias is not None and pad_c:
            qbias = jnp.pad(quant_bias, (0, pad_c))  # zero bias on pad lanes
        elif quant_bias is not None:
            qbias = quant_bias
        outs, outs_s = [], []

        def collect(out, nf):
            if qbias is None:
                outs.append(out[..., :c].reshape(b, nf, r, g, g, c))
            else:
                q, s = out
                outs.append(q[..., :c].reshape(b, nf, r, g, g, c))
                outs_s.append(s.reshape(b, nf, r, 1))

        for factors, levels in plan:
            nf = len(factors)
            views = jnp.stack(
                [box_ops.expand(rois, f, image_hw[0], image_hw[1])
                 for f in factors], axis=1)  # (B, nf, R, 4)
            vflat = views.reshape(-1, 4)
            if len(levels) == 1 and not train:
                meta = pyramids[levels[0]][1]
                pyr_bytes = (meta.flat.shape[0] * meta.flat.shape[1]
                             * meta.flat.shape[2] * meta.flat.dtype.itemsize)
                if pyr_bytes <= resident_budget:
                    # trainable=False always: the `not train` guard above is
                    # the single switch — resident training pooling is
                    # intentionally not wired up (the trainable VJP belongs
                    # to the window/multi kernels).
                    out = roi_pallas.batched_pyramid_pool_resident(
                        pyramids[levels[0]][0], meta, vflat, b,
                        output_size=g,
                        samples_per_bin=self.cfg.roi_samples_per_bin,
                        interpret=interp, trainable=False, quant_bias=qbias)
                    collect(out, nf)
                    continue
            img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), nf * r)
            out = roi_pallas.batched_pyramid_pool_multi(
                [pyramids[l][0] for l in levels],
                [pyramids[l][1] for l in levels],
                vflat, img_idx, output_size=g,
                samples_per_bin=self.cfg.roi_samples_per_bin,
                interpret=interp, trainable=train, quant_bias=qbias)
            collect(out, nf)
        if qbias is not None:
            return (jnp.concatenate(outs, axis=1),
                    jnp.concatenate(outs_s, axis=1))
        return jnp.concatenate(outs, axis=1)

    def _pool_rois_max(self, feats: dict, rois: jnp.ndarray,
                       image_hw: tuple, scales: dict,
                       impl: str = "direct") -> jnp.ndarray:
        """Reference-exact path (cfg.roi_mode="max"): max-pool the RAW trunk
        maps with inn.ROIPooling semantics, concat levels, THEN apply the 1x1
        reduction — the reference's operation order, which cannot be hoisted
        because max is not linear. Intended for mAP-parity evaluation against
        Torch checkpoints, not the production fast path. Honors
        foveal_topology via the same view x level plan as the align path.

        impl="direct": the O(R*G^2*H*W) masked-max oracle (bit-exact at every
        scale, slow — 864 ms/batch-8 measured r2). impl="pyramid"/"pallas"/
        "auto": the WINDOWED max path (roi_pyramid mode="exact_max", max
        pyramid + masked window max) — bit-exact for views with bins <= 1
        base cell, cell-quantized bin edges at coarser pyramid levels
        (docs/PARITY.md); ~the avg pyramid path's speed."""
        import jax

        from multipathnet_tpu.ops import roi as roi_ops
        from multipathnet_tpu.ops import roi_pyramid

        windowed = impl in ("pyramid", "pallas", "auto")

        outs = []
        for factors, levels in self._view_level_plan():
            if windowed:
                def wrapper(*args):
                    pyrs = {
                        l: roi_pyramid.build_pyramid(
                            f_b, scales[l], mode="max",
                            output_size=self.cfg.roi_output_size)
                        for l, f_b in zip(levels, args[:-1])
                    }
                    return roi_pyramid.multilevel_foveal_pyramid_features(
                        pyrs, args[-1], foveal_factors=factors,
                        image_hw=image_hw,
                        output_size=self.cfg.roi_output_size,
                        mode="exact_max", combine="concat",
                    )
            else:
                def wrapper(*args):
                    f_b = dict(zip(levels, args[:-1]))
                    return roi_ops.multilevel_foveal_roi_features(
                        f_b, args[-1], scales=scales,
                        foveal_factors=factors,
                        image_hw=image_hw,
                        output_size=self.cfg.roi_output_size,
                        samples_per_bin=self.cfg.roi_samples_per_bin,
                        mode="exact_max", combine="concat",
                    )

            pooled = jax.vmap(wrapper)(
                *[feats[l] for l in levels], rois)  # (B, f, R, g, g, sumC)
            b, f, r, g, _, _ = pooled.shape
            out = None
            for l in levels:
                c_l = feats[l].shape[-1]
                part, pooled = pooled[..., :c_l], pooled[..., c_l:]
                red = self.reduce[l](part.reshape(b * f * r, g, g, c_l))
                out = red if out is None else out + red
            outs.append(out.reshape(b, f, r, g, g, out.shape[-1]))
        return jnp.concatenate(outs, axis=1)

    def pool_rois_quantized(self, feats: dict, rois: jnp.ndarray,
                            image_hw: tuple, skip_bias: jnp.ndarray):
        """Eval Pallas align path with the head's bias/relu + per-view int8
        quantization fused INTO the pool kernels (serving fast path,
        head_quant="int8" only). skip_bias is the head's raw "skip_bias"
        param (the caller reads it off the param tree — flax linen can't
        declare/read a sibling's param from here). Returns
        (pooled (B,F,R,G,G,C) int8, scales (B,F,R,1) f32) — feed both to
        predict_rois. Bit-mirrors pool_rois -> heads'
        relu(pooled+skip_bias) -> quantize_rows (roi_pallas._quant_view),
        minus ~3.2 GB of HBM round trip at bench shapes (docs/PERF.md r5)."""
        return self.pool_rois(feats, rois, image_hw, train=False,
                              quant_bias=skip_bias.astype(self.head.dtype))

    def predict_rois(self, pooled: jnp.ndarray, train: bool = False,
                     pooled_scale=None):
        """pooled (B, F, R, G, G, C) -> scores (B, R, K, C), deltas (B, R, D).

        The head flattens (B, R) into one big GEMM batch internally; the
        natural layout goes in unchanged (no (F, B*R) transpose — it measured
        7.75 ms on the 4 GB round-1 pooled tensor, docs/PERF.md).
        pooled_scale: per-view f32 scales when pooled is the int8 output of
        pool_rois_quantized."""
        b, r = pooled.shape[0], pooled.shape[2]
        scores, deltas = self.head(pooled, train=train,
                                   pooled_scale=pooled_scale)
        k = scores.shape[1]
        return (scores.reshape(b, r, k, -1), deltas.reshape(b, r, -1))

    def __call__(self, images: jnp.ndarray, rois: jnp.ndarray,
                 train: bool = False):
        """The reference contract: {image batch, rois} -> {class_scores,
        bbox_deltas}. images (B,H,W,3); rois (B,R,4) padded image-coord boxes.
        """
        feats = self.features(images, train=train)
        pooled = self.pool_rois(feats, rois, images.shape[1:3], train=train)
        return self.predict_rois(pooled, train=train)


def build_model(cfg: ModelConfig, freeze_stages: int = 0) -> MultiPathNet:
    return MultiPathNet(cfg=cfg, freeze_stages=freeze_stages)
