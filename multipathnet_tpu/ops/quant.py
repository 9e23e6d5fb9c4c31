"""Int8 dynamic quantization for the FC detection heads (inference only).

TPU-native serving optimization with no reference counterpart (the reference
ran f32 cuDNN end to end — SURVEY.md §2.2 "Conv/FC/softmax stack"): the v5e
MXU runs int8 x int8 -> int32 at ~2x the bf16 rate (measured 286 vs 171 TF/s
on the head GEMM stack, docs/PERF.md), and the MultiPath head is ~55% of the
inference graph (fc6/fc7 x4 foveal branches + the fused cls/bbox GEMM are
~7.9 TF of the ~8 TF total at bench shapes). Scheme:

- Weights: symmetric per-OUTPUT-channel int8 (`round(w / max|w_col| * 127)`),
  quantized ONCE at load time by `quantize_head_params` — not per call (the
  fc6 kernels alone are 1.6 GB f32; requantizing inside the step would burn
  ~3 ms of HBM traffic per batch).
- Activations: symmetric per-ROW (per-ROI) int8, computed dynamically inside
  the graph (abs-max over the feature axis). Head inputs are post-ReLU with
  per-ROI magnitude spread, so a single tensor-wide scale would waste range;
  per-row costs one reduction the GEMM's operand read already pays for.
- Accumulation: int32 on the MXU (`lax.dot_general` with
  preferred_element_type=int32), rescaled in f32 by (row_scale x col_scale).

Eval-only by design: training keeps the bf16 path (straight-through int8
training is out of scope; the reference trained f32). Accuracy is pinned by
tests/test_quant.py (logits tolerance vs the float head; AP-preservation on
a trained model) and on-hardware by tests_tpu.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def quantize_weight(w: jnp.ndarray):
    """(K, N) float kernel -> ((K, N) int8, (N,) f32 per-output-channel scale).

    Symmetric: w ~= w_i8 * scale[None, :]. A zero column gets scale eps so the
    division is defined (its int8 column is exactly zero either way)."""
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    w_i8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_i8, scale.astype(jnp.float32)


def quantize_rows(x: jnp.ndarray):
    """(..., K) float activations -> ((..., K) int8, (..., 1) f32 row scale).

    Dynamic symmetric per-row quantization (abs-max). All-zero rows get scale
    eps (their int8 row is zero).

    The scale is amax * (1/127) as an EXPLICIT constant multiply, not
    amax / 127: XLA rewrites division-by-constant into reciprocal multiply
    in some fusion contexts but not others (observed CPU, 2026-08-19 — the
    Pallas in-kernel copy of this formula got the rewrite, this one didn't,
    and the 1-ULP scale gap flipped round() ties). One canonical op keeps
    every implementation of this formula bit-identical."""
    xf = x.astype(jnp.float32)
    scale = (jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
             * jnp.float32(1.0 / 127.0))
    scale = jnp.maximum(scale, 1e-12)
    x_i8 = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x_i8, scale


def matmul_int8(x_i8: jnp.ndarray, x_scale: jnp.ndarray, w_i8: jnp.ndarray,
                w_scale: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """int8 x int8 -> int32 MXU GEMM on pre-quantized operands, f32 rescale
    by (row scale x output-channel scale). Returns f32 (caller casts)."""
    acc = lax.dot_general(x_i8, w_i8, (((x_i8.ndim - 1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (x_scale * w_scale)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


def dense_int8(x: jnp.ndarray, w_i8: jnp.ndarray, w_scale: jnp.ndarray,
               bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Quantized replacement for `x @ w + b`: dynamic per-row activation int8,
    int8 x int8 -> int32 MXU GEMM, f32 rescale. Returns f32 (caller casts)."""
    x_i8, x_scale = quantize_rows(x)
    return matmul_int8(x_i8, x_scale, w_i8, w_scale, bias)


def quantize_head_params(params):
    """One-time load transform: rewrite the MultiPath head's Dense params
    (fc6_f*/fc7_f*/cls_bbox: {kernel, bias}) into the Int8Dense layout
    ({kernel_i8, kernel_scale, bias}) expected by a model built with
    head_quant="int8". Works on the full model param tree; everything outside
    the head (trunk convs, 1x1 reduces, skip_bias) is untouched — the trunk
    stays bf16 (its convs are lane-bound, not MXU-bound; docs/PERF.md)."""
    import flax

    tree = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else params

    def walk(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                if (k.startswith("fc6_f") or k.startswith("fc7_f")
                        or k == "cls_bbox") and "kernel" in v:
                    w_i8, scale = quantize_weight(v["kernel"])
                    q = {"kernel_i8": w_i8, "kernel_scale": scale}
                    if "bias" in v:
                        q["bias"] = v["bias"]
                    out[k] = q
                else:
                    out[k] = walk(v)
            else:
                out[k] = v
        return out

    return walk(tree)
