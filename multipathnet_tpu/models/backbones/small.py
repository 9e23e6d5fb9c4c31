"""Small trunks: AlexNet-style (reference's model "S" family — Fast R-CNN §2
evaluated S/M/L trunks; SURVEY.md §2.1 lists an alexnet model def) and TinyNet
(test-sized trunk so CPU tests and the synthetic overfit smoke run in seconds).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class AlexNetLike(nn.Module):
    """AlexNet-shaped trunk re-expressed with SAME padding + clean strides so
    the c3/c4/c5 contract (strides 4/8/16) holds exactly."""

    dtype: Any = jnp.bfloat16
    feature_strides = {"c3": 4, "c4": 8, "c5": 16}

    @nn.compact
    def __call__(self, x, train: bool = False) -> dict:
        x = x.astype(self.dtype)
        x = nn.relu(nn.Conv(64, (7, 7), (2, 2), padding="SAME",
                            dtype=self.dtype)(x))       # /2
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")  # /4
        x = nn.relu(nn.Conv(192, (5, 5), padding="SAME", dtype=self.dtype)(x))
        feats = {"c3": x}
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")  # /8
        x = nn.relu(nn.Conv(384, (3, 3), padding="SAME", dtype=self.dtype)(x))
        feats["c4"] = x
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")  # /16
        x = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype)(x))
        feats["c5"] = x
        return feats


class TinyNet(nn.Module):
    """4-conv trunk (8/16/32 channels) honoring the c3/c4/c5 contract."""

    dtype: Any = jnp.float32
    feature_strides = {"c3": 4, "c4": 8, "c5": 16}

    @nn.compact
    def __call__(self, x, train: bool = False) -> dict:
        x = x.astype(self.dtype)
        x = nn.relu(nn.Conv(8, (3, 3), (2, 2), padding="SAME", dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(8, (3, 3), (2, 2), padding="SAME", dtype=self.dtype)(x))
        feats = {"c3": x}
        x = nn.relu(nn.Conv(16, (3, 3), (2, 2), padding="SAME", dtype=self.dtype)(x))
        feats["c4"] = x
        x = nn.relu(nn.Conv(32, (3, 3), (2, 2), padding="SAME", dtype=self.dtype)(x))
        feats["c5"] = x
        return feats
