"""Backbone registry: name -> (flax module factory, feature dim, stride)."""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax.numpy as jnp

from .resnet import resnet18, resnet34, resnet50, resnet101, resnet152
from .vgg import vgg16
from .vit import vit_b_16, vit_l_16
from .torch_import import load_torch_resnet, load_torch_vgg, load_torch_vit


class BackboneSpec(NamedTuple):
    factory: Callable[..., Any]
    feature_dim: int
    stride: int
    torch_loader: Callable[[dict], dict]


BACKBONES: dict[str, BackboneSpec] = {
    "resnet18": BackboneSpec(resnet18, 512, 32, load_torch_resnet),
    "resnet34": BackboneSpec(resnet34, 512, 32, load_torch_resnet),
    "resnet50": BackboneSpec(resnet50, 2048, 32, load_torch_resnet),
    "resnet101": BackboneSpec(resnet101, 2048, 32, load_torch_resnet),
    "resnet152": BackboneSpec(resnet152, 2048, 32, load_torch_resnet),
    "vgg16": BackboneSpec(vgg16, 512, 16, load_torch_vgg),
    # ViT patch-token backbones (beyond-reference family, models/vit.py):
    # stride = patch size; feature_dim = hidden dim of the token grid
    "vit_b_16": BackboneSpec(vit_b_16, 768, 16, load_torch_vit),
    "vit_l_16": BackboneSpec(vit_l_16, 1024, 16, load_torch_vit),
}


def get_backbone(name: str, dtype=jnp.bfloat16, attention: str | None = None):
    """``attention`` selects the ViT attention implementation
    (auto | xla | pallas — models/vit.py); ignored for CNN backbones."""
    try:
        spec = BACKBONES[name]
    except KeyError:
        raise ValueError(f"unknown backbone {name!r}; expected one of {sorted(BACKBONES)}")
    if attention is not None and name.startswith("vit"):
        return spec.factory(dtype=dtype, attention=attention), spec
    return spec.factory(dtype=dtype), spec
