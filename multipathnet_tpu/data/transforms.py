"""Device-side image preprocessing (ImageTransformer + scaling, SURVEY.md §2.1).

The reference resized on host (short side 600, cap 1000 — Fast R-CNN §2.2) and
mean-subtracted per Caffe. TPU-native redesign (DESIGN.md, BASELINE.json north
star "device-side decode/resize/normalize pipeline feeding HBM"):

- static canvas (cfg.data.image_size), aspect-preserving `scale_and_translate`
  on device (dynamic scale, static output shape — no recompiles per image),
- normalization fused into the same jitted graph,
- box coordinates scaled by the same factor (ops/boxes analog of the
  reference's box rescale in ImageDetect).

Training from scratch offline: normalization constants are plain [0,1]
mean/std (ImageNet constants kept for future pretrained import).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGE_MEAN = (0.485, 0.456, 0.406)
IMAGE_STD = (0.229, 0.224, 0.225)
# Caffe-origin trunks (the reference's converted VGG/ResNet .t7s): pixels in
# 0-255, BGR channel order, per-channel mean-pixel subtraction, no std.
# Values are the Fast R-CNN-era PIXEL_MEANS, in BGR order.
CAFFE_BGR_MEAN = (102.9801, 115.9465, 122.7717)


def normalize(image_u8: jnp.ndarray, preprocess: str = "rgb_unit") -> jnp.ndarray:
    """(..., 3) uint8 RGB -> f32 normalized per the preprocess convention:
    "rgb_unit" ([0,1] RGB, ImageNet mean/std) or "caffe_bgr" (BGR, 0-255,
    mean-pixel subtraction — SURVEY.md §2.1 ImageTransformer)."""
    if preprocess == "caffe_bgr":
        x = image_u8.astype(jnp.float32)[..., ::-1]  # RGB -> BGR
        return x - jnp.asarray(CAFFE_BGR_MEAN)
    assert preprocess == "rgb_unit", preprocess
    x = image_u8.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGE_MEAN)) / jnp.asarray(IMAGE_STD)


def resize_to_canvas(image_u8: jnp.ndarray, canvas_hw: tuple[int, int],
                     src_hw=None, preprocess: str = "rgb_unit"):
    """Aspect-preserving resize of (H, W, 3) uint8 onto a fixed canvas.

    src_hw: optional (h, w) *valid extent* when the input is already padded to
    a fixed raw shape (host pipeline contract) — may be traced values.
    Returns (canvas (CH, CW, 3) f32 normalized, scale scalar f32). Boxes in
    source coords map to canvas coords by multiplying by `scale`.
    """
    ch, cw = canvas_hw
    h, w = image_u8.shape[:2]
    if src_hw is None:
        sh, sw = float(h), float(w)
    else:
        sh = jnp.asarray(src_hw[0], jnp.float32)
        sw = jnp.asarray(src_hw[1], jnp.float32)
    scale = jnp.minimum(ch / sh, cw / sw)
    x = normalize(image_u8, preprocess)
    out = jax.image.scale_and_translate(
        x, (ch, cw, 3), (0, 1),
        scale=jnp.stack([scale, scale]),
        translation=jnp.zeros(2),
        method="linear",
    )
    # zero out the region beyond the scaled extent (scale_and_translate pads
    # with zeros already for linear method outside support; mask defensively)
    yy = jnp.arange(ch, dtype=jnp.float32)[:, None]
    xx = jnp.arange(cw, dtype=jnp.float32)[None, :]
    valid = (yy < sh * scale) & (xx < sw * scale)
    return out * valid[..., None], scale


def batch_resize_to_canvas(images_u8: jnp.ndarray, canvas_hw, src_hws,
                           preprocess: str = "rgb_unit"):
    """vmapped resize: images (B, H, W, 3), src_hws (B, 2) -> (B, CH, CW, 3),
    scales (B,)."""
    return jax.vmap(
        lambda im, hw: resize_to_canvas(im, canvas_hw, hw, preprocess))(
        images_u8, src_hws
    )
