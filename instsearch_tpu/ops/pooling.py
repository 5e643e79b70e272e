"""Descriptor pooling over CNN feature maps — TPU-native (NHWC) layout.

Capabilities rebuilt (SURVEY.md §2.1):
  C4  global average pooling (SPoC-style, arXiv:1510.07493)
  C5  MAC pooling            (arXiv:1511.05879)
  C6  R-MAC region pooling   (arXiv:1511.05879 §3)
  C7  GeM pooling            (arXiv:1711.02512 §3.2)
  C10 L2 normalization

All functions are pure, jit-compatible, and operate on ``x: [N, H, W, C]``
feature maps (channels-last is the layout XLA prefers on TPU; the reference's
torch analogs are NCHW). The R-MAC region grid is computed host-side at trace
time from the *static* (H, W), so per-region reductions compile to static
slices — no dynamic shapes inside jit (SURVEY.md §1.2).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-6


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = EPS) -> jax.Array:
    """Unit-normalize so that dot product == cosine similarity (C10)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x / jnp.maximum(norm, eps).astype(x.dtype)).astype(x.dtype)


def avg_pool(x: jax.Array) -> jax.Array:
    """Global average pooling: [N,H,W,C] -> [N,C] (C4)."""
    return jnp.mean(x, axis=(1, 2))


def mac_pool(x: jax.Array) -> jax.Array:
    """Maximum activation of convolutions: per-channel spatial max (C5)."""
    return jnp.max(x, axis=(1, 2))


def gem_pool(x: jax.Array, p: float | jax.Array = 3.0, eps: float = EPS) -> jax.Array:
    """Generalized-mean pooling (C7): ``(mean(clip(x)^p))^(1/p)``.

    p -> inf recovers MAC, p = 1 recovers average pooling. ``p`` may be a
    traced scalar (learnable during fine-tuning). Computed in f32 for
    stability under bf16 activations.
    """
    xf = jnp.clip(x.astype(jnp.float32), eps, None)
    pooled = jnp.mean(xf ** p, axis=(1, 2)) ** (1.0 / p)
    return pooled.astype(x.dtype)


# ---------------------------------------------------------------------------
# R-MAC (arXiv:1511.05879 §3)
# ---------------------------------------------------------------------------

def rmac_region_grid(h: int, w: int, levels: int = 3, overlap: float = 0.4
                     ) -> list[tuple[int, int, int, int]]:
    """R-MAC region boxes ``(y, x, size_y, size_x)`` on an h x w feature map.

    At scale ``l`` (1-based), square regions of side ``2*min(h,w)/(l+1)`` are
    placed on a uniform grid with consecutive-region overlap as close to
    ``overlap`` as possible; the longer axis gets extra steps chosen to match
    that overlap. Pure host-side integer math — runs at trace time.
    """
    short = min(h, w)
    # Extra steps along the long axis so overlap of the l=1 pair ≈ `overlap`.
    steps = np.arange(2, 8)
    if h != w:
        b = (max(h, w) - short) / (steps - 1)
        idx = int(np.argmin(np.abs((short ** 2 - short * b) / short ** 2 - overlap)))
        extra = idx + 1
    else:
        extra = 0
    wd = extra if w > h else 0
    hd = extra if h > w else 0

    regions: list[tuple[int, int, int, int]] = []
    for l in range(1, levels + 1):
        side = int(math.floor(2 * short / (l + 1)))
        if side <= 0:
            continue
        nx, ny = l + wd, l + hd
        bx = (w - side) / (nx - 1) if nx > 1 else 0.0
        by = (h - side) / (ny - 1) if ny > 1 else 0.0
        for i in range(ny):
            for j in range(nx):
                y = int(math.floor(i * by))
                x = int(math.floor(j * bx))
                y = min(y, h - side)
                x = min(x, w - side)
                regions.append((y, x, side, side))
    return regions


def rmac_region_geometry(h: int, w: int, levels: int = 3) -> np.ndarray:
    """Geometry of the R-MAC grid regions as ``[R, 3]`` f32 rows
    ``(cx, cy, log side)`` in feature-map coordinates — the trace-time
    constant the spatial-verification stage (search/spatial.py) quantizes
    region-pair transform hypotheses against. Derived from the SAME
    ``rmac_region_grid`` as the descriptors, so geometry and store rows
    are index-aligned by construction."""
    regions = rmac_region_grid(h, w, levels)
    return np.asarray([(x + sx / 2.0, y + sy / 2.0, math.log(sy))
                       for (y, x, sy, sx) in regions], np.float32)


def rmac_regional_descriptors(x: jax.Array, levels: int = 3) -> jax.Array:
    """Per-region MAC descriptors: [N,H,W,C] -> [N, R, C] (C6, first half).

    Each region is a static slice (grid derives from static H, W), so the
    whole thing is an unrolled set of max-reductions that XLA fuses.
    """
    _, h, w, _ = x.shape
    regions = rmac_region_grid(h, w, levels)
    per_region = [
        jnp.max(x[:, y:y + sy, xx:xx + sx, :], axis=(1, 2))
        for (y, xx, sy, sx) in regions
    ]
    return jnp.stack(per_region, axis=1)  # [N, R, C]


def rmac_pool(x: jax.Array, levels: int = 3,
              whiten: "WhiteningParams | None" = None) -> jax.Array:
    """Full R-MAC descriptor (C6): per-region MAC -> l2 -> (PCA-whiten) -> l2
    -> sum over regions -> l2 (arXiv:1511.05879 §3). Per-region whitening
    delegates to ops/whitening.apply_whitening — ONE projection
    implementation (an earlier inline copy had drifted to normalizing in
    the compute dtype instead of f32; review r2)."""
    regional = rmac_regional_descriptors(x, levels)       # [N, R, C]
    regional = l2_normalize(regional, axis=-1)
    if whiten is not None:
        from .whitening import apply_whitening
        regional = apply_whitening(regional, whiten).astype(x.dtype)
    agg = jnp.sum(regional, axis=1)                        # [N, C]
    return l2_normalize(agg, axis=-1)


_POOLERS = {
    "avg": lambda x, cfg: avg_pool(x),
    "mac": lambda x, cfg: mac_pool(x),
    "gem": lambda x, cfg: gem_pool(x, cfg.gem_p),
    "rmac": lambda x, cfg: rmac_pool(x, cfg.rmac_levels),
}


def pool(x: jax.Array, cfg) -> jax.Array:
    """Dispatch on ``ExtractConfig.pooling``; returns [N, C] descriptors."""
    try:
        return _POOLERS[cfg.pooling](x, cfg)
    except KeyError:
        raise ValueError(f"unknown pooling {cfg.pooling!r}; expected one of {sorted(_POOLERS)}")
