"""Descriptor extraction pipeline: frontend -> backbone -> pooling -> whitening.

The whole pipeline is one jitted XLA program per (batch, scale-set) shape
(SURVEY.md §3.1): uint8 batch in, unit-norm descriptors out. Multi-scale
extraction (SURVEY.md C8, arXiv:1711.02512) runs the backbone per scale
inside the same program and averages the per-scale L2-normalized
descriptors.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ExtractConfig
from .data import frontend
from .models import get_backbone
from .ops import l2_normalize, pool
from .ops.whitening import WhiteningParams, apply_whitening

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}


def build_extract_fn(cfg: ExtractConfig):
    """Returns ``(model, extract_fn)`` where
    ``extract_fn(variables, images, whitening=None) -> [N, D] f32`` is
    jit-compatible. ``images`` is uint8 or float [N, S, S, 3] (pre-crop);
    normalization, multi-scale resize, backbone, pooling and whitening all
    fuse into one XLA program.
    """
    dtype = _DTYPES[cfg.dtype]
    model, spec = get_backbone(cfg.backbone, dtype=dtype)

    def extract(variables, images, whitening: Optional[WhiteningParams] = None):
        x = frontend.normalize(images, dtype=dtype)
        descs = []
        for scale in cfg.scales:
            xs = frontend.rescale(x, scale)
            fmap = model.apply(variables, xs)
            d = pool(fmap, cfg)
            descs.append(l2_normalize(d.astype(jnp.float32), axis=-1))
        desc = jnp.mean(jnp.stack(descs, 0), axis=0) if len(descs) > 1 else descs[0]
        desc = l2_normalize(desc, axis=-1)
        if whitening is not None:
            desc = apply_whitening(desc, whitening)   # includes re-L2
        return desc

    return model, extract


def build_regional_fn(cfg: ExtractConfig):
    """Per-region R-MAC descriptors for the re-ranking store (SURVEY.md C13):
    ``(variables, images, whitening) -> [N, R, D]`` unit-norm per region."""
    from .ops.pooling import rmac_regional_descriptors

    dtype = _DTYPES[cfg.dtype]
    model, spec = get_backbone(cfg.backbone, dtype=dtype)

    def extract_regional(variables, images,
                         whitening: Optional[WhiteningParams] = None):
        x = frontend.normalize(images, dtype=dtype)
        fmap = model.apply(variables, x)
        reg = rmac_regional_descriptors(fmap, cfg.rmac_levels)   # [N, R, C]
        reg = l2_normalize(reg.astype(jnp.float32), axis=-1)
        if whitening is not None:
            reg = apply_whitening(reg, whitening)                # re-L2s
        return reg

    return model, extract_regional


class Extractor:
    """Convenience stateful wrapper holding variables + jitted extract fn."""

    def __init__(self, cfg: ExtractConfig,
                 variables: dict | None = None,
                 whitening: WhiteningParams | None = None,
                 seed: int = 0):
        self.cfg = cfg
        self.model, self._fn = build_extract_fn(cfg)
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(seed),
                np.zeros((1, cfg.image_size, cfg.image_size, 3), np.float32))
        self.variables = variables
        self.whitening = whitening
        self._jit = jax.jit(self._fn)
        self._regional_jit = None

    def __call__(self, images) -> jax.Array:
        return self._jit(self.variables, images, self.whitening)

    def extract_regional(self, images) -> jax.Array:
        """[B, S, S, 3] -> [B, R, D] per-region descriptors (same weights,
        same whitening as the global pipeline)."""
        if self._regional_jit is None:
            _, fn = build_regional_fn(self.cfg)
            self._regional_jit = jax.jit(fn)
        return self._regional_jit(self.variables, images, self.whitening)

    def extract_paths_regional(self, paths) -> np.ndarray:
        out = []
        for batch, idxs in frontend.batch_paths(
                paths, self.cfg.image_size, self.cfg.batch_size):
            r = np.asarray(self.extract_regional(jnp.asarray(batch)))
            out.append(r[idxs >= 0])
        return np.concatenate(out) if out else np.zeros((0, 0, 0), np.float32)

    def extract_paths(self, paths, quarantine: list | None = None):
        """Host loop: decode/batch on host, extract on device.
        Returns ``(descriptors [N,D] f32 numpy, kept_indices [N])``."""
        out, kept = [], []
        for batch, idxs in frontend.batch_paths(
                paths, self.cfg.image_size, self.cfg.batch_size, quarantine):
            d = np.asarray(self(jnp.asarray(batch)))
            valid = idxs >= 0
            out.append(d[valid])
            kept.append(idxs[valid])
        if not out:
            return np.zeros((0, self.cfg.descriptor_dim), np.float32), np.zeros((0,), np.int64)
        return np.concatenate(out), np.concatenate(kept)
