"""Small trunks: AlexNet-style (reference's model "S" family — Fast R-CNN §2
evaluated S/M/L trunks; SURVEY.md §2.1 lists an alexnet model def) and TinyNet
(test-sized trunk so CPU tests and the synthetic overfit smoke run in seconds).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _freeze(x, conv_index: int, freeze_stages: int):
    """stop_gradient after conv #conv_index when frozen (NoBackprop analog):
    the backward below this point is skipped entirely by XLA."""
    return jax.lax.stop_gradient(x) if conv_index <= freeze_stages else x


class AlexNetLike(nn.Module):
    """AlexNet-shaped trunk re-expressed with SAME padding + clean strides so
    the c3/c4/c5 contract (strides 4/8/16) holds exactly."""

    dtype: Any = jnp.bfloat16
    freeze_stages: int = 0
    feature_strides = {"c3": 4, "c4": 8, "c5": 16}

    @staticmethod
    def frozen_prefixes(n_stages: int) -> tuple:
        """AlexNet-style freezing: conv1..convN (5 convs total)."""
        return tuple(f"conv{i}" for i in range(1, min(n_stages, 5) + 1))

    @nn.compact
    def __call__(self, x, train: bool = False) -> dict:
        x = x.astype(self.dtype)
        x = nn.relu(nn.Conv(64, (7, 7), (2, 2), padding="SAME",
                            dtype=self.dtype, name="conv1")(x))  # /2
        x = _freeze(x, 1, self.freeze_stages)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")  # /4
        x = nn.relu(nn.Conv(192, (5, 5), padding="SAME", dtype=self.dtype,
                            name="conv2")(x))
        x = _freeze(x, 2, self.freeze_stages)
        feats = {"c3": x}
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")  # /8
        x = nn.relu(nn.Conv(384, (3, 3), padding="SAME", dtype=self.dtype,
                            name="conv3")(x))
        x = _freeze(x, 3, self.freeze_stages)
        feats["c4"] = x
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")  # /16
        x = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                            name="conv4")(x))
        x = _freeze(x, 4, self.freeze_stages)
        x = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                            name="conv5")(x))
        x = _freeze(x, 5, self.freeze_stages)
        feats["c5"] = x
        return feats


class TinyNet(nn.Module):
    """4-conv trunk (8/16/32 channels) honoring the c3/c4/c5 contract."""

    dtype: Any = jnp.float32
    freeze_stages: int = 0
    feature_strides = {"c3": 4, "c4": 8, "c5": 16}

    @staticmethod
    def frozen_prefixes(n_stages: int) -> tuple:
        return tuple(f"conv{i}" for i in range(1, min(n_stages, 4) + 1))

    @nn.compact
    def __call__(self, x, train: bool = False) -> dict:
        x = x.astype(self.dtype)
        x = nn.relu(nn.Conv(8, (3, 3), (2, 2), padding="SAME",
                            dtype=self.dtype, name="conv1")(x))
        x = _freeze(x, 1, self.freeze_stages)
        x = nn.relu(nn.Conv(8, (3, 3), (2, 2), padding="SAME",
                            dtype=self.dtype, name="conv2")(x))
        x = _freeze(x, 2, self.freeze_stages)
        feats = {"c3": x}
        x = nn.relu(nn.Conv(16, (3, 3), (2, 2), padding="SAME",
                            dtype=self.dtype, name="conv3")(x))
        x = _freeze(x, 3, self.freeze_stages)
        feats["c4"] = x
        x = nn.relu(nn.Conv(32, (3, 3), (2, 2), padding="SAME",
                            dtype=self.dtype, name="conv4")(x))
        x = _freeze(x, 4, self.freeze_stages)
        feats["c5"] = x
        return feats
