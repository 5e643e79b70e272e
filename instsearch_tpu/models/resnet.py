"""Flax ResNet backbones, truncated before the classifier (SURVEY.md C2).

TPU-native choices: NHWC activations, HWIO conv kernels, bf16 compute with
f32 params/batch-stats, inference-mode BatchNorm by default (extraction is
forward-only). Module names mirror torchvision's state_dict layout
(``conv1``, ``bn1``, ``layer{1..4}.{i}.conv{1..3}`` …) so that
``torch_import.load_torch_resnet`` is a mechanical key mapping.

He et al., arXiv:1512.03385.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class BasicBlock(nn.Module):
    """3x3 -> 3x3 residual block (ResNet-18/34), expansion 1."""

    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        residual = x
        y = conv(self.features, (3, 3), strides=(self.strides, self.strides),
                 padding=[(1, 1), (1, 1)], name="conv1")(x)
        y = nn.relu(norm(name="bn1")(y))
        y = conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                 name="conv2")(y)
        y = norm(name="bn2")(y)
        if self.downsample:
            residual = conv(self.features, (1, 1),
                            strides=(self.strides, self.strides),
                            name="downsample_conv")(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck block with expansion 4."""

    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        residual = x
        y = conv(self.features, (1, 1), name="conv1")(x)
        y = nn.relu(norm(name="bn1")(y))
        y = conv(self.features, (3, 3), strides=(self.strides, self.strides),
                 padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = nn.relu(norm(name="bn2")(y))
        y = conv(self.features * 4, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(y)
        if self.downsample:
            residual = conv(self.features * 4, (1, 1),
                            strides=(self.strides, self.strides),
                            name="downsample_conv")(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetStage(nn.Module):
    features: int
    num_blocks: int
    strides: int
    dtype: Any = jnp.bfloat16
    block: Any = Bottleneck

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_blocks):
            # torchvision: BasicBlock stages only downsample when the shape
            # actually changes (stage 1 of resnet18/34 has identity skips)
            needs_ds = (i == 0) and (
                self.block is Bottleneck or self.strides != 1
                or x.shape[-1] != self.features)
            x = self.block(
                self.features,
                strides=self.strides if i == 0 else 1,
                downsample=needs_ds,
                dtype=self.dtype,
                name=str(i),
            )(x, train=train)
        return x


class ResNet(nn.Module):
    """Truncated ResNet: images [N,H,W,3] -> feature maps [N,H/32,W/32,2048].

    No avgpool / fc head — pooling is the descriptor layer's job
    (``instsearch_tpu.ops.pooling``).
    """

    stage_sizes: Sequence[int]
    dtype: Any = jnp.bfloat16
    block: Any = Bottleneck

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for i, (feats, blocks) in enumerate(
                zip((64, 128, 256, 512), self.stage_sizes)):
            x = ResNetStage(feats, blocks, strides=1 if i == 0 else 2,
                            dtype=self.dtype, block=self.block,
                            name=f"layer{i + 1}")(x, train=train)
        return x


def resnet18(dtype=jnp.bfloat16) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), dtype=dtype, block=BasicBlock)


def resnet34(dtype=jnp.bfloat16) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), dtype=dtype, block=BasicBlock)


def resnet50(dtype=jnp.bfloat16) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), dtype=dtype)


def resnet101(dtype=jnp.bfloat16) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), dtype=dtype)


def resnet152(dtype=jnp.bfloat16) -> ResNet:
    return ResNet(stage_sizes=(3, 8, 36, 3), dtype=dtype)
