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


def _graft(tgt: dict, src: dict, path: str = "") -> None:
    """Recursively install src arrays into the (already-copied) tgt tree,
    validating names and shapes at every level."""
    for k, v in src.items():
        assert k in tgt, f"backbone param {path}{k!r} not in model"
        if isinstance(v, dict):
            _graft(tgt[k], v, f"{path}{k}.")
        else:
            assert tgt[k].shape == v.shape, (
                f"{path}{k}: model {tgt[k].shape} vs import {v.shape}")
            tgt[k] = v.astype(np.asarray(tgt[k]).dtype)


def install_backbone_params(full_params: dict, backbone_params: dict) -> dict:
    """Graft imported trunk weights into a model.init param tree
    (params/backbone/...). Returns a new tree; shapes are validated.
    Handles both flat (VGG conv{b}_{c}) and nested (ResNet block) layouts."""
    import jax

    new = jax.tree_util.tree_map(lambda x: x, full_params)  # fresh containers
    _graft(new["params"]["backbone"], backbone_params)
    return new


# --- ResNet-18 (the reference's released demo model is resnet18-based:
# resnet18_integral_coco.t7 — SURVEY.md §2.1 Demo row) -----------------------
#
# torchvision resnet18 state_dict layout -> our models/backbones/resnet.py
# names (stem/stem_bn, stage{2,3,4}_block{i} with Conv_0/BatchNorm_0 (conv1/
# bn1), Conv_1/BatchNorm_1 (conv2/bn2), Conv_2/BatchNorm_2 (downsample)).
# Our detection trunk keeps stages at strides 4/8/16 = torchvision layer1..3;
# layer4 (stride 32) and fc are ignored, as the reference's trunk split does.


def bn_to_flax(state: dict, prefix: str) -> tuple:
    """torch BN (weight,bias,running_mean,running_var) -> flax
    ({'scale','bias'} for params, {'mean','var'} for batch_stats)."""
    params = {"scale": np.asarray(state[f"{prefix}.weight"]).copy(),
              "bias": np.asarray(state[f"{prefix}.bias"]).copy()}
    stats = {"mean": np.asarray(state[f"{prefix}.running_mean"]).copy(),
             "var": np.asarray(state[f"{prefix}.running_var"]).copy()}
    return params, stats


def resnet18_params_from_state_dict(state: dict) -> tuple:
    """torchvision-style resnet18 state dict -> (flax params subtree,
    flax batch_stats subtree) for models.backbones.resnet.ResNet18."""
    params, stats = {}, {}
    params["stem"] = {"kernel": np.transpose(
        np.asarray(state["conv1.weight"]), (2, 3, 1, 0)).copy()}
    params["stem_bn"], stats["stem_bn"] = bn_to_flax(state, "bn1")
    for layer in (1, 2, 3):  # strides 4/8/16; layer4 (stride 32) unused
        for blk in (0, 1):
            src = f"layer{layer}.{blk}"
            dst = f"stage{layer + 1}_block{blk}"
            p, s = {}, {}
            p["Conv_0"] = conv_to_flax(np.asarray(state[f"{src}.conv1.weight"]))
            p["BatchNorm_0"], s["BatchNorm_0"] = bn_to_flax(state, f"{src}.bn1")
            p["Conv_1"] = conv_to_flax(np.asarray(state[f"{src}.conv2.weight"]))
            p["BatchNorm_1"], s["BatchNorm_1"] = bn_to_flax(state, f"{src}.bn2")
            if f"{src}.downsample.0.weight" in state:
                p["Conv_2"] = conv_to_flax(
                    np.asarray(state[f"{src}.downsample.0.weight"]))
                p["BatchNorm_2"], s["BatchNorm_2"] = bn_to_flax(
                    state, f"{src}.downsample.1")
            params[dst] = p
            stats[dst] = s
    return params, stats


def load_resnet18_npz(path: str) -> tuple:
    z = np.load(path)
    return resnet18_params_from_state_dict({k: z[k] for k in z.files})


def install_backbone_variables(variables: dict, backbone_params: dict,
                               backbone_stats: dict | None = None) -> dict:
    """Graft imported trunk weights (and frozen-BN statistics) into a
    model.init variable tree. Returns a new tree; shapes are validated."""
    new = install_backbone_params(variables, backbone_params)
    if backbone_stats:
        _graft(new["batch_stats"]["backbone"], backbone_stats)
    return new
