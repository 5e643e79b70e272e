"""torch(vision) state_dict -> Flax variables conversion (SURVEY.md §7 Phase 1).

The reference stack loads ImageNet-pretrained torchvision checkpoints; this
module imports those exact checkpoints into the Flax backbones. Conventions
handled:

  conv:   torch OIHW  ->  flax HWIO   (transpose 2,3,1,0)
  linear: torch [out,in] -> flax [in,out]   (not used by truncated backbones)
  batchnorm: weight->scale, bias->bias, running_mean->mean, running_var->var

Accepts either torch tensors or numpy arrays, so a raw ``torch.load(...,
map_location='cpu')`` state_dict works directly (no torchvision needed).
"""
from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_kernel(t) -> np.ndarray:
    return _np(t).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def load_torch_resnet(state_dict: Mapping[str, Any]) -> dict:
    """torchvision ResNet state_dict -> {'params': ..., 'batch_stats': ...}.

    Classifier keys (``fc.*``) and bookkeeping (``num_batches_tracked``) are
    ignored — the backbone is truncated (models/resnet.py).
    """
    params: dict = {}
    stats: dict = {}
    block_re = re.compile(r"^layer(\d)\.(\d+)\.(.+)$")
    for key, val in state_dict.items():
        if key.startswith("fc.") or key.endswith("num_batches_tracked"):
            continue
        m = block_re.match(key)
        if m:
            layer, block, rest = f"layer{m.group(1)}", m.group(2), m.group(3)
            prefix = [layer, block]
        else:
            rest, prefix = key, []
        name, leaf = rest.rsplit(".", 1)
        name = name.replace("downsample.0", "downsample_conv")
        name = name.replace("downsample.1", "downsample_bn")
        is_conv = re.fullmatch(r"conv\d|downsample_conv", name)
        is_bn = re.fullmatch(r"bn\d|downsample_bn", name)
        if not (is_conv or is_bn):
            raise ValueError(f"unhandled torch key: {key}")
        if leaf == "weight" and is_conv:
            _set(params, prefix + [name, "kernel"], _conv_kernel(val))
        elif leaf == "weight":   # batchnorm gamma
            _set(params, prefix + [name, "scale"], _np(val))
        elif leaf == "bias":
            _set(params, prefix + [name, "bias"], _np(val))
        elif leaf == "running_mean":
            _set(stats, prefix + [name, "mean"], _np(val))
        elif leaf == "running_var":
            _set(stats, prefix + [name, "var"], _np(val))
        else:
            raise ValueError(f"unhandled torch key: {key}")
    return {"params": params, "batch_stats": stats}


def load_torch_vgg(state_dict: Mapping[str, Any]) -> dict:
    """torchvision VGG16 state_dict -> {'params': ...} for models/vgg.py.

    ``features.{i}.weight|bias`` maps to ``conv{i}.kernel|bias``; classifier
    keys are dropped (backbone truncated after conv5_3).
    """
    params: dict = {}
    feat_re = re.compile(r"^features\.(\d+)\.(weight|bias)$")
    for key, val in state_dict.items():
        if key.startswith("classifier."):
            continue
        m = feat_re.match(key)
        if not m:
            raise ValueError(f"unhandled torch key: {key}")
        idx, leaf = m.group(1), m.group(2)
        if leaf == "weight":
            _set(params, [f"conv{idx}", "kernel"], _conv_kernel(val))
        else:
            _set(params, [f"conv{idx}", "bias"], _np(val))
    return {"params": params}


def load_torch_vit(state_dict: Mapping[str, Any]) -> dict:
    """torchvision VisionTransformer state_dict -> {'params': ...} for
    models/vit.py. Layout (``vit_b_16``): ``class_token``, ``conv_proj.*``,
    ``encoder.pos_embedding``, ``encoder.layers.encoder_layer_{i}.{ln_1,
    self_attention.in_proj_*, self_attention.out_proj.*, ln_2, mlp.{0,3}}``,
    ``encoder.ln``; the classifier (``heads.*``) is dropped. torch's packed
    in_proj stacks [q; k; v] along the output dim, matching the fused
    ``qkv`` Dense split order; Linear weights transpose [out,in]->[in,out].
    Older torchvision exports name the MLP linears ``mlp.linear_{1,2}`` —
    both spellings are accepted.
    """
    params: dict = {}
    layer_re = re.compile(r"^encoder\.layers\.encoder_layer_(\d+)\.(.+)$")
    for key, val in state_dict.items():
        if key.startswith("heads."):
            continue
        if key == "class_token":
            _set(params, ["class_token"], _np(val))
        elif key == "encoder.pos_embedding":
            _set(params, ["pos_embedding"], _np(val))
        elif key == "conv_proj.weight":
            _set(params, ["conv_proj", "kernel"], _conv_kernel(val))
        elif key == "conv_proj.bias":
            _set(params, ["conv_proj", "bias"], _np(val))
        elif key in ("encoder.ln.weight", "encoder.ln.bias"):
            leaf = "scale" if key.endswith("weight") else "bias"
            _set(params, ["ln", leaf], _np(val))
        else:
            m = layer_re.match(key)
            if not m:
                raise ValueError(f"unhandled torch key: {key}")
            block = f"encoder_layer_{m.group(1)}"
            rest = (m.group(2).replace("mlp.linear_1", "mlp.0")
                    .replace("mlp.linear_2", "mlp.3"))
            name, leaf = rest.rsplit(".", 1)
            if name in ("ln_1", "ln_2"):
                flax_leaf = "scale" if leaf == "weight" else "bias"
                _set(params, [block, name, flax_leaf], _np(val))
            elif name == "self_attention" and leaf == "in_proj_weight":
                _set(params, [block, "qkv", "kernel"], _np(val).T)
            elif name == "self_attention" and leaf == "in_proj_bias":
                _set(params, [block, "qkv", "bias"], _np(val))
            elif name == "self_attention.out_proj":
                flax_leaf = "kernel" if leaf == "weight" else "bias"
                v = _np(val).T if leaf == "weight" else _np(val)
                _set(params, [block, "out", flax_leaf], v)
            elif name in ("mlp.0", "mlp.3"):
                dense = "linear_1" if name == "mlp.0" else "linear_2"
                flax_leaf = "kernel" if leaf == "weight" else "bias"
                v = _np(val).T if leaf == "weight" else _np(val)
                _set(params, [block, dense, flax_leaf], v)
            else:
                raise ValueError(f"unhandled torch key: {key}")
    return {"params": params}


def validate_variables(model, variables: dict, input_shape=(1, 224, 224, 3)) -> None:
    """Assert imported trees match the model's own init trees exactly."""
    import jax

    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           np.zeros(input_shape, np.float32)))

    def _flatten(tree, prefix=""):
        out = {}
        for k, v in dict(tree).items():
            path = f"{prefix}/{k}"
            if isinstance(v, Mapping) or isinstance(v, dict):
                out.update(_flatten(v, path))
            else:
                out[path] = tuple(getattr(v, "shape", np.asarray(v).shape))
        return out

    ref_map = _flatten(ref)
    got_map = _flatten(variables)
    missing = sorted(set(ref_map) - set(got_map))
    extra = sorted(set(got_map) - set(ref_map))
    bad = {k: (ref_map[k], got_map[k]) for k in ref_map.keys() & got_map.keys()
           if tuple(ref_map[k]) != tuple(got_map[k])}
    if missing or extra or bad:
        raise ValueError(
            f"import mismatch: missing={missing[:5]} extra={extra[:5]} "
            f"shape_mismatch={dict(list(bad.items())[:5])}")
