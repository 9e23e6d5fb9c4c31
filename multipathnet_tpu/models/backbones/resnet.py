"""ResNet trunks (flax, NHWC, bf16 compute).

The reference ships a resnet18 integral model for its demo and supports ResNet
trunks (SURVEY.md §0, §2.1 "Per-trunk model defs" [M]). Standard
He-init residual v1 design; c3/c4/c5 are the stride-4/8/16 stage outputs
(stage4/stride-32 is omitted — the detector pools from /16 and below, matching
the VGG tap points).

BatchNorm statistics are FROZEN (use_running_average=True in both train and
eval): detection fine-tuning at batch 1-8 images keeps pretrained running
stats and trains only the affine scale/bias — the Fast R-CNN-era practice
mirrored from the reference's BN handling (SURVEY.md §2.1 "Model utils":
"BN/dropout handling"). The `batch_stats` collection therefore never needs to
be mutable inside the jitted train step.

Naming: the stem is "stem"/"stem_bn"; residual groups are "stage{2,3,4}_block{i}"
(mirroring the conv2_x/conv3_x/conv4_x convention), so stage freezing
(NoBackprop analog) can match parameter paths robustly — see
`frozen_prefixes`.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _frozen_norm(dtype):
    return partial(nn.BatchNorm, use_running_average=True, momentum=0.9,
                   dtype=dtype)


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = _frozen_norm(self.dtype)
        # explicit symmetric padding: torch pads stride-2 convs (1,1) while
        # flax SAME pads (0,1) — parity-pinned by test_resnet18_trunk_parity
        y = nn.Conv(self.filters, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        if x.shape[-1] != self.filters or self.stride != 1:
            x = nn.Conv(self.filters, (1, 1), (self.stride, self.stride),
                        use_bias=False, dtype=self.dtype)(x)
            x = norm()(x)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = _frozen_norm(self.dtype)
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.filters, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        if x.shape[-1] != self.filters * 4 or self.stride != 1:
            x = nn.Conv(self.filters * 4, (1, 1), (self.stride, self.stride),
                        use_bias=False, dtype=self.dtype)(x)
            x = norm()(x)
        return nn.relu(x + y)


class ResNet(nn.Module):
    stage_sizes: Sequence[int] = (2, 2, 2)  # stages at strides 4, 8, 16
    block: Any = BasicBlock
    dtype: Any = jnp.bfloat16
    freeze_stages: int = 0  # stop-gradient after stage N (NoBackprop analog)
    feature_strides = {"c3": 4, "c4": 8, "c5": 16}

    @staticmethod
    def frozen_prefixes(n_stages: int) -> tuple:
        """Param-name prefixes (under the backbone scope) for freezing the
        first n stages: stage 1 = stem conv+BN, stages 2..4 = residual groups
        (conv2_x/conv3_x/conv4_x convention)."""
        out = []
        if n_stages >= 1:
            out += ["stem", "stem_bn"]
        for s in range(2, min(n_stages, 4) + 1):
            out.append(f"stage{s}_")
        return tuple(out)

    @nn.compact
    def __call__(self, x, train: bool = False) -> dict:
        x = x.astype(self.dtype)
        # torch-parity padding: conv1 pads (3,3), the stem max-pool (1,1) —
        # flax SAME would pad (2,3)/(0,1) and shift every window one pixel
        x = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        x = nn.relu(_frozen_norm(self.dtype)(name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))  # /4
        if self.freeze_stages >= 1:  # stage 1 = stem (see frozen_prefixes)
            x = jax.lax.stop_gradient(x)
        feats = {}
        filters = 64
        for si, n_blocks in enumerate(self.stage_sizes):
            stride = 1 if si == 0 else 2
            for bi in range(n_blocks):
                x = self.block(filters, stride if bi == 0 else 1,
                               dtype=self.dtype,
                               name=f"stage{si + 2}_block{bi}")(x, train)
            if si + 2 <= self.freeze_stages:
                x = jax.lax.stop_gradient(x)
            feats[f"c{si + 3}"] = x
            filters *= 2
        return feats


def ResNet18(dtype=jnp.bfloat16, freeze_stages=0):
    return ResNet(stage_sizes=(2, 2, 2), block=BasicBlock, dtype=dtype,
                  freeze_stages=freeze_stages)


def ResNet50(dtype=jnp.bfloat16, freeze_stages=0):
    return ResNet(stage_sizes=(3, 4, 6), block=BottleneckBlock, dtype=dtype,
                  freeze_stages=freeze_stages)


def ResNet101(dtype=jnp.bfloat16, freeze_stages=0):
    # (3, 4, 23): torchvision resnet101's layer1-3; layer4 (/32) is past the
    # detection trunk boundary, as for the other depths
    return ResNet(stage_sizes=(3, 4, 23), block=BottleneckBlock, dtype=dtype,
                  freeze_stages=freeze_stages)
