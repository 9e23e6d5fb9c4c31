"""Backbone registry (SURVEY.md §2.1 'Per-trunk model defs').

Every backbone is a flax Module mapping NHWC images -> {"c3", "c4", "c5"}
feature pyramid (strides 4/8/16) plus a `feature_strides` dict. NHWC + bf16
compute, f32 params (DESIGN.md conventions).
"""

from multipathnet_tpu.models.backbones.vgg import VGG16
from multipathnet_tpu.models.backbones.resnet import (ResNet, ResNet18,
                                                      ResNet50, ResNet101)
from multipathnet_tpu.models.backbones.small import TinyNet, AlexNetLike

REGISTRY = {
    "vgg16": VGG16,
    "resnet18": ResNet18,
    "resnet50": ResNet50,
    "resnet101": ResNet101,
    "alexnet": AlexNetLike,
    "tinynet": TinyNet,
}


def get_backbone(name: str, dtype, freeze_stages: int = 0):
    """freeze_stages > 0 cuts the gradient at the stage-N boundary with
    lax.stop_gradient (NoBackprop analog): XLA then skips the entire frozen
    backward instead of computing gradients that a mask would zero. Forward
    is bit-identical; param trees are unaffected."""
    try:
        cls = REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown backbone {name!r}; have {sorted(REGISTRY)}")
    return cls(dtype=dtype, freeze_stages=freeze_stages)
