"""ROI feature extraction — pure-XLA implementations (correctness oracle + fallback).

Replaces the reference's `inn.ROIPooling` CUDA kernel (SURVEY.md §2.2 row 1).
TPU design (DESIGN.md): the primary op is `roi_align` — bilinear sampling on a
static G x G x S x S grid (static shapes, differentiable, MXU/VPU friendly) —
rather than the reference's dynamic-extent max pool. `roi_pool_max` reproduces
the reference's exact max-pool semantics (masked max over cells) and is kept as
a parity/test op. The fused Pallas kernel in ops/roi_pallas.py must match
`roi_align` bit-for-tolerance; this module is its forever-oracle.

Coordinates: rois are (x1,y1,x2,y2) in *image* coordinates; `spatial_scale`
(e.g. 1/16 for conv5 of VGG-16 — Fast R-CNN §2.1) maps them to feature cells.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray):
    """feat (H, W, C); sy (R, Py); sx (R, Px) continuous feature coords.
    Returns (R, Py, Px, C) bilinear-interpolated samples. Out-of-range samples
    are clamped (same as torchvision roi_align's border handling)."""
    h, w, c = feat.shape
    sy = jnp.clip(sy, 0.0, h - 1.0)
    sx = jnp.clip(sx, 0.0, w - 1.0)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy1 = sy - y0
    wx1 = sx - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    flat = feat.reshape(h * w, c)

    def take(yi, xi):  # yi (R,Py), xi (R,Px) -> (R,Py,Px,C)
        idx = yi[:, :, None] * w + xi[:, None, :]
        return jnp.take(flat, idx.reshape(idx.shape[0], -1), axis=0).reshape(
            idx.shape[0], yi.shape[1], xi.shape[1], c
        )

    v00 = take(y0, x0)
    v01 = take(y0, x1)
    v10 = take(y1, x0)
    v11 = take(y1, x1)
    wy1 = wy1[:, :, None, None]
    wx1 = wx1[:, None, :, None]
    return (
        v00 * (1 - wy1) * (1 - wx1)
        + v01 * (1 - wy1) * wx1
        + v10 * wy1 * (1 - wx1)
        + v11 * wy1 * wx1
    )


def roi_align(
    feat: jnp.ndarray,      # (H, W, C) single feature map
    rois: jnp.ndarray,      # (R, 4) image-coordinate boxes
    *,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    samples_per_bin: int = 2,
    mode: str = "avg",      # avg | max over the S*S samples in each bin
) -> jnp.ndarray:
    """ROI Align -> (R, G, G, C). Static shapes; jit/vmap/grad-safe."""
    g, s = output_size, samples_per_bin
    b = rois * spatial_scale
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    bin_h = jnp.maximum(y2 - y1, 1e-6) / g
    bin_w = jnp.maximum(x2 - x1, 1e-6) / g
    # sample offsets within the ROI: (G*S,) fractions of a bin
    off = (jnp.arange(g * s) // s) + (jnp.arange(g * s) % s + 0.5) / s
    sy = y1[:, None] + off[None, :] * bin_h[:, None]   # (R, G*S)
    sx = x1[:, None] + off[None, :] * bin_w[:, None]   # (R, G*S)
    vals = _bilinear_gather(feat, sy, sx)              # (R, G*S, G*S, C)
    r, _, _, c = vals.shape
    vals = vals.reshape(r, g, s, g, s, c)
    if mode == "avg":
        return vals.mean(axis=(2, 4))
    if mode == "max":
        return vals.max(axis=(2, 4))
    raise ValueError(f"mode must be avg|max, got {mode!r}")


def roi_pool_max(
    feat: jnp.ndarray,      # (H, W, C)
    rois: jnp.ndarray,      # (R, 4) image-coordinate boxes
    *,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
) -> jnp.ndarray:
    """Exact ROIPooling max semantics (inn.ROIPooling parity op) -> (R, G, G, C).

    Each ROI is split into G x G bins with floor/ceil integer extents; each bin
    max-pools the feature cells it covers (empty bins -> 0). Implemented as a
    masked max over all H*W cells per bin — O(R*G^2*H*W) — an *oracle*, used in
    tests and tiny configs only; models use roi_align.
    """
    h, w, c = feat.shape
    g = output_size
    b = rois * spatial_scale
    x1 = jnp.floor(b[:, 0])
    y1 = jnp.floor(b[:, 1])
    x2 = jnp.ceil(b[:, 2])
    y2 = jnp.ceil(b[:, 3])
    roi_h = jnp.maximum(y2 - y1, 1.0)
    roi_w = jnp.maximum(x2 - x1, 1.0)
    bins = jnp.arange(g, dtype=feat.dtype)
    # integer bin extents, clamped to the map
    ys = jnp.clip(jnp.floor(y1[:, None] + bins * roi_h[:, None] / g), 0, h)
    ye = jnp.clip(jnp.ceil(y1[:, None] + (bins + 1) * roi_h[:, None] / g), 0, h)
    xs = jnp.clip(jnp.floor(x1[:, None] + bins * roi_w[:, None] / g), 0, w)
    xe = jnp.clip(jnp.ceil(x1[:, None] + (bins + 1) * roi_w[:, None] / g), 0, w)

    rows = jnp.arange(h, dtype=feat.dtype)
    cols = jnp.arange(w, dtype=feat.dtype)
    # (R, G, H) / (R, G, W) membership masks
    my = (rows[None, None, :] >= ys[:, :, None]) & (rows[None, None, :] < ye[:, :, None])
    mx = (cols[None, None, :] >= xs[:, :, None]) & (cols[None, None, :] < xe[:, :, None])

    neg = jnp.asarray(-jnp.inf, feat.dtype)
    # (R, Gy, H, 1, 1, 1) & (R, 1, 1, Gx, W, 1) -> masked feat (R,Gy,H,Gx,W,C)
    masked = jnp.where(
        (my[:, :, :, None, None] & mx[:, None, None, :, :])[..., None],
        feat[None, None, :, None, :, :],
        neg,
    )
    out = masked.max(axis=(2, 4))  # (R, Gy, Gx, C)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def multilevel_foveal_roi_features(
    feats: dict,             # {level: (H_l, W_l, C_l)} e.g. {"c3":..,"c4":..,"c5":..}
    rois: jnp.ndarray,       # (R, 4) image-coordinate boxes
    *,
    scales: dict,            # {level: spatial_scale}
    foveal_factors=(1.0, 1.5, 2.0, 4.0),
    image_hw=None,           # (H, W) to clip foveal expansions; None = no clip
    output_size: int = 7,
    samples_per_bin: int = 2,
    mode: str = "avg",
    combine: str = "concat",
) -> jnp.ndarray:
    """The fused MultiPath feature op (XLA reference implementation).

    For each foveal context factor f (MultiPath §3.1) and each skip level l
    (§3.2): expand the ROI by f, roi_align on level l, combine channels over
    levels. combine="concat" -> (F, R, G, G, sum_l C_l); combine="sum"
    (all levels same C, used when the ION-style 1x1 reduction has already
    been applied per level on the trunk maps — pooling is linear, so
    sum-of-pooled-reduced == reduce(concat-of-pooled)) -> (F, R, G, G, C).

    ops/roi_pallas.py provides the fused-kernel fast path with identical
    semantics; this function is its test oracle (SURVEY.md §7.3 item 1).
    """
    from multipathnet_tpu.ops import boxes as box_ops

    levels = list(feats.keys())
    out_per_f = []
    for f in foveal_factors:
        if image_hw is not None:
            r = box_ops.expand(rois, f, image_hw[0], image_hw[1])
        else:
            r = box_ops.expand(rois, f)
        if mode == "exact_max":
            # reference-exact inn.ROIPooling semantics (integer bin extents,
            # max over covered cells) — see roi_pool_max
            pooled = [
                roi_pool_max(feats[l], r, output_size=output_size,
                             spatial_scale=scales[l])
                for l in levels
            ]
        else:
            pooled = [
                roi_align(
                    feats[l], r,
                    output_size=output_size,
                    spatial_scale=scales[l],
                    samples_per_bin=samples_per_bin,
                    mode=mode,
                )
                for l in levels
            ]
        if combine == "sum":
            out_per_f.append(sum(pooled))
        else:
            out_per_f.append(jnp.concatenate(pooled, axis=-1))
    return jnp.stack(out_per_f, axis=0)


def batched_roi_align(feats: jnp.ndarray, rois: jnp.ndarray, **kw) -> jnp.ndarray:
    """roi_align vmapped over images: feats (B,H,W,C), rois (B,R,4) -> (B,R,G,G,C)."""
    return jax.vmap(partial(roi_align, **kw))(feats, rois)
