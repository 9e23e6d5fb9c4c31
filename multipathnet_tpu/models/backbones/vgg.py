"""VGG-16 trunk (flax, NHWC, bf16 compute).

The reference's primary trunk is a Caffe-converted VGG-16 (SURVEY.md §2.1
"Model utils" [M]; Fast R-CNN paper §2 uses VGG-16 as model "L"). Skip levels
(MultiPath §3.2) tap conv3_3 (stride 4), conv4_3 (stride 8), conv5_3
(stride 16); the detector never uses pool5/fc layers of the classifier —
heads are built fresh in models/heads.py.

No pretrained weights exist in this offline environment (SURVEY.md §7.3 item
4): init is He-normal; the loading hook accepts an .npz of named arrays if one
ever appears.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# (out_channels, num_convs) per block
_CFG: Sequence[tuple[int, int]] = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class VGG16(nn.Module):
    dtype: Any = jnp.bfloat16
    freeze_stages: int = 0  # stop-gradient after block N (NoBackprop analog)
    feature_strides = {"c3": 4, "c4": 8, "c5": 16}

    @staticmethod
    def frozen_prefixes(n_stages: int) -> tuple:
        """Param-name prefixes for freezing conv blocks 1..n (NoBackprop
        analog; the reference freezes early VGG blocks during fine-tuning)."""
        return tuple(f"conv{b}_" for b in range(1, min(n_stages, 5) + 1))

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> dict:
        """x: (B, H, W, 3) float in [0, 1]-ish (already normalized).
        Returns {"c3","c4","c5"} NHWC feature maps."""
        x = x.astype(self.dtype)
        feats = {}
        for b, (ch, n) in enumerate(_CFG, start=1):
            for c in range(1, n + 1):
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv{b}_{c}")(x)
                x = nn.relu(x)
            if b <= self.freeze_stages:
                # frozen block: cut the cotangent here so XLA skips the
                # whole backward below (incl. the expensive conv1 block)
                x = jax.lax.stop_gradient(x)
            if b == 3:
                feats["c3"] = x  # conv3_3, stride 4
            if b == 4:
                feats["c4"] = x  # conv4_3, stride 8
            if b == 5:
                feats["c5"] = x  # conv5_3, stride 16
                break  # no pool5 — detector taps conv5_3
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats
