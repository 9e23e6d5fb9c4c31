"""Detection heads: foveal FC branches, integral classifiers, bbox regressor.

Rebuilds the reference's head assembly (SURVEY.md §2.1 "MultiPath model
builder": 4 foveal branches each ROI-pool -> FC6 -> FC7, concatenated; 6
integral classifier heads; class-specific bbox regressor) as one flax module
operating on pre-pooled ROI features. The pooling itself lives in
ops/roi.py / ops/roi_pallas.py so the head is kernel-agnostic.

Paper anchors: foveal regions MultiPath §3.1; skip-connection 1x1 reduction
§3.2 (ION-style, dim [M] -> 512); integral heads §3.3 (K thresholds, averaged
at test time — the averaging lives in eval/detect.py).

TPU layout notes (docs/PERF.md, measured on the v5e 2026-08-16):
- The ION 1x1 reduction is NOT applied here: pooling is linear, so
  reduce(concat_l(pool_l(f))) == sum_l(pool_l(reduce_l(f))). The per-level
  1x1 convs live in MultiPathNet.features on the trunk maps (24x fewer
  FLOPs: ~270k trunk pixels instead of 8k ROIs x 4 foveal x 49 bins), and
  this head receives the level-SUMMED pooled tensor, adding only the shared
  bias + ReLU. This also shrinks the pooled tensor 2.5x (C=1280 -> 512).
- Input stays in its natural (B, F, R, g, g, C) layout; per-branch slabs are
  strided slices XLA fuses into the FC6 GEMM (an explicit (F, B*R, ...)
  transpose measured 7.75 ms at bench shapes).
- The per-branch fc6/fc7 GEMM loop runs at ~180 TF/s (91% MFU) — batching
  the branches into one einsum measured no faster, so the loop (with its
  checkpoint-friendly per-branch param names fc6_f{i}/fc7_f{i}) stays.
- cls + bbox share one GEMM (one read of the (N, F*fc) trunk instead of two).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import flax.linen as nn
import jax.numpy as jnp


class Int8Dense(nn.Module):
    """Drop-in Dense for int8 serving (ops/quant.py): per-output-channel int8
    kernel quantized at LOAD time (`quantize_head_params`), dynamic per-row
    activation quantization in-graph, int32 MXU accumulation. Param layout
    {kernel_i8, kernel_scale, bias} replaces Dense's {kernel, bias}; init
    exists only to give the tree its shapes — real weights always arrive via
    the load-time transform of a float checkpoint."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_scale=None) -> jnp.ndarray:
        """x float (quantized in here), or pre-quantized int8 with its per-row
        `x_scale` — the head pre-quantizes the pooled tensor ONCE and feeds
        int8 slices, so the per-branch strided reads don't each repay a
        quantization pass (bench-measured: per-branch quantize-of-a-slice
        lost the whole int8 GEMM win)."""
        from multipathnet_tpu.ops import quant

        k = x.shape[-1]
        w_i8 = self.param("kernel_i8", nn.initializers.zeros,
                          (k, self.features), jnp.int8)
        scale = self.param("kernel_scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        if x_scale is None:
            out = quant.dense_int8(x, w_i8, scale, bias)
        else:
            out = quant.matmul_int8(x, x_scale, w_i8, scale, bias)
        return out.astype(self.dtype)


class MultiPathHead(nn.Module):
    num_classes: int
    foveal_scales: Tuple[float, ...] = (1.0, 1.5, 2.0, 4.0)
    num_integral_heads: int = 6
    fc_dim: int = 4096
    skip_reduce_dim: int = 512
    class_specific_bbox: bool = True
    dropout_rate: float = 0.5
    dtype: Any = jnp.bfloat16
    # "none" (bf16 GEMMs) or "int8" (serving path: Int8Dense everywhere the
    # head has a GEMM; params come from ops/quant.quantize_head_params).
    quant: str = "none"
    # Truncated-SVD serving compression (Fast R-CNN §3.1, ops/lowrank.py):
    # rank t > 0 splits that FC family into a bias-free (in -> t) factor
    # layer (fc6_f{i}_u) followed by the (t -> fc_dim) layer that keeps the
    # original name + bias. Params come from lowrank.factorize_head_params
    # of a full-rank float checkpoint; composes with quant="int8" (both
    # factors quantize; the t-dim intermediate re-quantizes per-row
    # dynamically). Inference-only, like quant.
    fc6_rank: int = 0
    fc7_rank: int = 0

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, train: bool = False,
                 pooled_scale=None):
        """pooled: (B, F, R, G, G, C) — level-summed, pre-reduced ROI
        features (C = skip_reduce_dim), one slab per foveal view. Returns
        (scores (B*R, K, num_classes) f32, bbox_deltas (B*R, D) f32).

        pooled_scale: per-view (B, F, R, 1) f32 scales when pooled arrives
        PRE-QUANTIZED int8 from the pool kernels (pool_rois_quantized) —
        bias/relu/quantize were already applied in-kernel, so this path
        skips straight to the int8 branch GEMMs."""
        b, f, r, g, _, c = pooled.shape
        assert f == len(self.foveal_scales), (f, self.foveal_scales)
        assert c == self.skip_reduce_dim, (c, self.skip_reduce_dim)
        assert self.quant in ("none", "int8"), self.quant
        assert not (train and self.quant != "none"), (
            "int8 head is inference-only; train with quant='none' and "
            "quantize the checkpoint via ops.quant.quantize_head_params")
        assert not (train and (self.fc6_rank or self.fc7_rank)), (
            "low-rank head is inference-only; train full-rank and "
            "factorize the checkpoint via ops.lowrank.factorize_head_params")
        assert self.fc6_rank <= min(g * g * c, self.fc_dim), (
            "fc6_rank exceeds full rank", self.fc6_rank, g * g * c,
            self.fc_dim)
        assert self.fc7_rank <= self.fc_dim, (self.fc7_rank, self.fc_dim)
        dense: Callable = (Int8Dense if self.quant == "int8" else nn.Dense)
        n = b * r

        if pooled_scale is not None:
            assert self.quant == "int8" and not train, (
                "pre-quantized pooled input is int8-serving only",
                self.quant, train)
            assert pooled.dtype == jnp.int8, pooled.dtype
            # keep the param in the tree (same leaf __call__ declares) even
            # though the kernel already consumed it
            self.param("skip_bias", nn.initializers.zeros, (c,))
            xq = pooled.reshape(b, f, r, g * g * c)
            xs = pooled_scale
        else:
            # shared bias + ReLU completing the ION-style reduction (the 1x1
            # convs ran per level on the trunk maps — see module docstring)
            bias = self.param("skip_bias", nn.initializers.zeros, (c,))
            x = nn.relu(pooled.astype(self.dtype) + bias.astype(self.dtype))

            # per-branch FC6/FC7 (each foveal view has its own head — §3.1).
            # int8 path: quantize the pooled tensor ONCE (per-(roi,view)
            # rows), then feed int8 slices — quantizing each branch's strided
            # slice separately cost the entire int8 win (74.0 vs 75.4 img/s).
            if self.quant == "int8":
                from multipathnet_tpu.ops import quant as quant_ops

                xq, xs = quant_ops.quantize_rows(
                    x.reshape(b, f, r, g * g * c))
        def factored(name, rank, xin, xin_scale=None):
            """One FC as (in -> rank) bias-free factor + (rank -> fc_dim)
            named layer, or the plain single GEMM when rank == 0. The int8
            path feeds the pre-quantized slab into the FIRST GEMM only; the
            rank-t intermediate re-quantizes per-row inside Int8Dense."""
            if rank > 0:
                args = (xin,) if xin_scale is None else (xin, xin_scale)
                hu = dense(rank, use_bias=False, dtype=self.dtype,
                           name=f"{name}_u")(*args)
                return dense(self.fc_dim, dtype=self.dtype, name=name)(hu)
            args = (xin,) if xin_scale is None else (xin, xin_scale)
            return dense(self.fc_dim, dtype=self.dtype, name=name)(*args)

        branches = []
        for i in range(f):
            if self.quant == "int8":
                h = factored(f"fc6_f{i}", self.fc6_rank,
                             xq[:, i].reshape(n, g * g * c),
                             xs[:, i].reshape(n, 1))
            else:
                h = factored(f"fc6_f{i}", self.fc6_rank,
                             x[:, i].reshape(n, g * g * c))
            h = nn.relu(h)
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
            h = factored(f"fc7_f{i}", self.fc7_rank, h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
            branches.append(h)
        trunk = jnp.concatenate(branches, axis=-1)  # (N, F*fc_dim)

        # K integral heads + bbox regressor as ONE fused GEMM over the trunk
        k = self.num_integral_heads
        cls_dim = k * self.num_classes
        bbox_dim = 4 * self.num_classes if self.class_specific_bbox else 4

        def mixed_init(key, shape, dtype=jnp.float32):
            # cls columns: LeCun-normal (nn.Dense default); bbox columns:
            # small normal so predicted deltas start near 0 (standard practice)
            import jax

            kc_key, kb_key = jax.random.split(key)
            kc = nn.initializers.lecun_normal()(kc_key, (shape[0], cls_dim),
                                                dtype)
            kb = nn.initializers.normal(1e-3)(kb_key,
                                              (shape[0], shape[1] - cls_dim),
                                              dtype)
            return jnp.concatenate([kc, kb], axis=1)

        if self.quant == "int8":
            out = Int8Dense(cls_dim + bbox_dim, dtype=self.dtype,
                            name="cls_bbox")(trunk)
        else:
            out = nn.Dense(cls_dim + bbox_dim, dtype=self.dtype,
                           kernel_init=mixed_init, name="cls_bbox")(trunk)
        scores = out[:, :cls_dim].reshape(n, k, self.num_classes)
        bbox = out[:, cls_dim:]
        return scores.astype(jnp.float32), bbox.astype(jnp.float32)
