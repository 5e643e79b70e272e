from .registry import BACKBONES, BackboneSpec, get_backbone
from .resnet import ResNet, resnet18, resnet34, resnet50, resnet101, resnet152
from .vgg import VGG, vgg16
from .vit import ViT, vit_b_16, vit_l_16
from .torch_import import (
    load_torch_resnet, load_torch_vgg, load_torch_vit, validate_variables,
)

__all__ = [
    "BACKBONES", "BackboneSpec", "get_backbone",
    "ResNet", "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "VGG", "vgg16",
    "ViT", "vit_b_16", "vit_l_16",
    "load_torch_resnet", "load_torch_vgg", "load_torch_vit",
    "validate_variables",
]
