"""Detection heads: foveal FC branches, integral classifiers, bbox regressor.

Rebuilds the reference's head assembly (SURVEY.md §2.1 "MultiPath model
builder": 4 foveal branches each ROI-pool -> FC6 -> FC7, concatenated; 6
integral classifier heads; class-specific bbox regressor) as one flax module
operating on pre-pooled ROI features. The pooling itself lives in
ops/roi.py / ops/roi_pallas.py so the head is kernel-agnostic.

Paper anchors: foveal regions MultiPath §3.1; skip-connection 1x1 reduction
§3.2 (ION-style, dim [M] -> 512); integral heads §3.3 (K thresholds, averaged
at test time — the averaging lives in eval/detect.py).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


class MultiPathHead(nn.Module):
    num_classes: int
    foveal_scales: Tuple[float, ...] = (1.0, 1.5, 2.0, 4.0)
    num_integral_heads: int = 6
    fc_dim: int = 4096
    skip_reduce_dim: int = 512
    class_specific_bbox: bool = True
    dropout_rate: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, train: bool = False):
        """pooled: (F, N, G, G, C) — F foveal slabs of multi-level-concat ROI
        features for N ROIs. Returns (scores (N, K, num_classes) f32,
        bbox_deltas (N, 4*num_classes or 4) f32)."""
        f, n, g, _, c = pooled.shape
        assert f == len(self.foveal_scales), (f, self.foveal_scales)
        x = pooled.astype(self.dtype)

        # shared 1x1 reduction of the skip concat (ION-style)
        x = nn.Conv(self.skip_reduce_dim, (1, 1), dtype=self.dtype,
                    name="skip_reduce")(x.reshape(f * n, g, g, c))
        x = nn.relu(x)
        x = x.reshape(f, n, g * g * self.skip_reduce_dim)

        # per-branch FC6/FC7 (each foveal view has its own head — §3.1)
        branches = []
        for i in range(f):
            h = nn.Dense(self.fc_dim, dtype=self.dtype, name=f"fc6_f{i}")(x[i])
            h = nn.relu(h)
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
            h = nn.Dense(self.fc_dim, dtype=self.dtype, name=f"fc7_f{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
            branches.append(h)
        trunk = jnp.concatenate(branches, axis=-1)  # (N, F*fc_dim)

        # K integral classifier heads as one fused matmul: (N, K*C)
        k = self.num_integral_heads
        scores = nn.Dense(k * self.num_classes, dtype=self.dtype,
                          name="cls_integral")(trunk)
        scores = scores.reshape(n, k, self.num_classes).astype(jnp.float32)

        bbox_dim = 4 * self.num_classes if self.class_specific_bbox else 4
        # bbox head init: small weights — deltas start near 0 (standard practice)
        bbox = nn.Dense(bbox_dim, dtype=self.dtype,
                        kernel_init=nn.initializers.normal(1e-3),
                        name="bbox")(trunk).astype(jnp.float32)
        return scores, bbox
