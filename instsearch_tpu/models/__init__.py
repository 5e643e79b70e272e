from .registry import BACKBONES, BackboneSpec, get_backbone
from .resnet import ResNet, resnet18, resnet34, resnet50, resnet101, resnet152
from .vgg import VGG, vgg16
from .torch_import import load_torch_resnet, load_torch_vgg, validate_variables

__all__ = [
    "BACKBONES", "BackboneSpec", "get_backbone",
    "ResNet", "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "VGG", "vgg16",
    "load_torch_resnet", "load_torch_vgg", "validate_variables",
]
