"""Flax VGG backbone truncated after conv5_3 ReLU (SURVEY.md C3).

The MAC/R-MAC literature (arXiv:1511.05879) pools the *last conv layer's*
post-ReLU activations — i.e. conv5_3 at stride 16 — so the final max-pool and
the classifier are dropped. Conv module names carry the torchvision
``features.{idx}`` index (``conv0``, ``conv2``, …) to make weight import a
mechanical mapping (see torch_import.load_torch_vgg).

Simonyan & Zisserman, arXiv:1409.1556.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

# torchvision vgg16.features layout: conv indices and pool positions.
VGG16_CFG: tuple = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                    512, 512, 512, "M", 512, 512, 512)


class VGG(nn.Module):
    """Images [N,H,W,3] -> conv5_3 feature maps [N,H/16,W/16,512]."""

    cfg: Sequence = VGG16_CFG
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # no batchnorm in classic VGG16
        x = x.astype(self.dtype)
        idx = 0  # torchvision features.{idx} counter
        for v in self.cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                idx += 1
            else:
                x = nn.Conv(v, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 2  # conv + relu each take one features slot
        return x


def vgg16(dtype=jnp.bfloat16) -> VGG:
    return VGG(cfg=VGG16_CFG, dtype=dtype)
