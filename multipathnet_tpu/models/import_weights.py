"""Pretrained-weight import — the model_utils.lua trunk-loading analog.

The reference loaded Caffe-converted VGG-16 `.t7` trunks (SURVEY.md §2.1
"Model utils" [M]). No pretrained weights exist in this offline environment
(SURVEY.md §7.3 item 4), so this module defines the import *contract*: a flat
`.npz` of torch/torchvision-layout arrays -> flax params. When real weights
appear (torchvision `vgg16` state_dict saved with numpy), they drop in.

Torch layout conventions handled:
  conv weight  (O, I, kH, kW)  ->  flax kernel (kH, kW, I, O)
  linear weight (O, I)         ->  flax kernel (I, O)

The torchvision VGG-16 `features` indices are mapped to our conv{b}_{c}
names. Correctness of the conversion (and of our conv/pool semantics) is
proven against torch-CPU forward passes in tests/test_torch_parity.py —
the strongest offline parity anchor available (SURVEY.md §4 'ROIPool ... vs
torch on random fixtures' generalized to the trunk).
"""

from __future__ import annotations

import numpy as np

# torchvision vgg16: nn.Sequential 'features' indices of the 13 convs
VGG16_TORCH_INDICES = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
VGG16_NAMES = (
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3",
    "conv4_1", "conv4_2", "conv4_3",
    "conv5_1", "conv5_2", "conv5_3",
)


def conv_to_flax(w: np.ndarray, b: np.ndarray | None = None) -> dict:
    """torch conv (O,I,kH,kW)[,+bias] -> flax {'kernel','bias'}."""
    out = {"kernel": np.transpose(w, (2, 3, 1, 0)).copy()}
    if b is not None:
        out["bias"] = np.asarray(b).copy()
    return out


def linear_to_flax(w: np.ndarray, b: np.ndarray | None = None) -> dict:
    out = {"kernel": np.transpose(w, (1, 0)).copy()}
    if b is not None:
        out["bias"] = np.asarray(b).copy()
    return out


def vgg16_params_from_state_dict(state: dict) -> dict:
    """torchvision-style state dict (features.N.weight/.bias arrays) ->
    flax param subtree for models.backbones.vgg.VGG16."""
    params = {}
    for idx, name in zip(VGG16_TORCH_INDICES, VGG16_NAMES):
        w = np.asarray(state[f"features.{idx}.weight"])
        b = np.asarray(state.get(f"features.{idx}.bias"))
        params[name] = conv_to_flax(w, b)
    return params


def load_vgg16_npz(path: str) -> dict:
    z = np.load(path)
    return vgg16_params_from_state_dict({k: z[k] for k in z.files})


def install_backbone_params(full_params: dict, backbone_params: dict) -> dict:
    """Graft imported trunk weights into a model.init param tree
    (params/backbone/...). Returns a new tree; shapes are validated."""
    import jax

    new = jax.tree_util.tree_map(lambda x: x, full_params)  # shallow copy
    tgt = new["params"]["backbone"]
    for k, sub in backbone_params.items():
        assert k in tgt, f"backbone param {k!r} not in model"
        for pk, v in sub.items():
            assert tgt[k][pk].shape == v.shape, (
                f"{k}.{pk}: model {tgt[k][pk].shape} vs import {v.shape}")
            tgt[k][pk] = v.astype(np.asarray(tgt[k][pk]).dtype)
    return new
