"""Independent torch/numpy reimplementation of the FULL descriptor pipeline
(SURVEY.md §7 hard part 3: with the reference tree empty, a second
implementation from the published algorithms is the designated parity
oracle). NCHW torch conventions throughout — deliberately not a port of
the jax code.

Covers: ImageNet normalize, multi-scale bilinear resize, GeM pooling
(arXiv:1711.02512 §3.2), R-MAC region grid + aggregation
(arXiv:1511.05879 §3), PCA-whitening via SVD (Jégou & Chum ECCV'12),
junk-aware AP (Philbin CVPR'07).
"""
import math

import numpy as np
import torch
import torch.nn.functional as F

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_nchw(imgs_uint8_nhwc: np.ndarray) -> torch.Tensor:
    """uint8 [N,H,W,3] -> normalized float32 NCHW torch tensor."""
    x = torch.from_numpy(imgs_uint8_nhwc.astype(np.float32) / 255.0)
    x = x.permute(0, 3, 1, 2)
    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    return (x - mean) / std


def gem_pool_t(fmap: torch.Tensor, p: float = 3.0, eps: float = 1e-6
               ) -> torch.Tensor:
    """[N,C,H,W] -> [N,C]."""
    return fmap.clamp(min=eps).pow(p).mean(dim=(2, 3)).pow(1.0 / p)


def rmac_grid_t(h: int, w: int, levels: int = 3, overlap: float = 0.4):
    """R-MAC boxes (y, x, sy, sx) — written from the paper's recipe,
    independently of ops/pooling.rmac_region_grid."""
    short, long_ = min(h, w), max(h, w)
    if h == w:
        extra = 0
    else:
        # choose the extra step count whose consecutive-region overlap on
        # the long axis is closest to `overlap`
        cands = np.arange(2, 8, dtype=np.float64)
        b = (long_ - short) / (cands - 1)
        score = np.abs((short * short - short * b) / (short * short) - overlap)
        extra = int(np.argmin(score)) + 1
    per_axis = {"y": (lambda l: l + (extra if h > w else 0)),
                "x": (lambda l: l + (extra if w > h else 0))}
    boxes = []
    for l in range(1, levels + 1):
        side = int(math.floor(2 * short / (l + 1)))
        if side <= 0:
            continue
        ny, nx = per_axis["y"](l), per_axis["x"](l)
        sy = (h - side) / (ny - 1) if ny > 1 else 0.0
        sx = (w - side) / (nx - 1) if nx > 1 else 0.0
        for iy in range(ny):
            for ix in range(nx):
                y = min(int(math.floor(iy * sy)), h - side)
                x = min(int(math.floor(ix * sx)), w - side)
                boxes.append((y, x, side, side))
    return boxes


def rmac_pool_t(fmap: torch.Tensor, levels: int = 3) -> torch.Tensor:
    """[N,C,H,W] -> [N,C]: per-region MAC -> l2 -> sum -> l2."""
    n, c, h, w = fmap.shape
    regs = []
    for (y, x, sy, sx) in rmac_grid_t(h, w, levels):
        regs.append(fmap[:, :, y:y + sy, x:x + sx].amax(dim=(2, 3)))
    stacked = torch.stack(regs, dim=1)                     # [N, R, C]
    stacked = F.normalize(stacked, dim=-1, eps=1e-12)
    return F.normalize(stacked.sum(dim=1), dim=-1, eps=1e-12)


def extract_t(model: torch.nn.Module, imgs_uint8: np.ndarray,
              pooling: str = "gem", gem_p: float = 3.0,
              scales=(1.0,), levels: int = 3) -> np.ndarray:
    """Full torch-side extraction: [N,S,S,3] uint8 -> [N,D] f32 unit-norm."""
    model.eval()
    x = normalize_nchw(imgs_uint8)
    descs = []
    with torch.no_grad():
        for s in scales:
            h = max(1, round(x.shape[2] * s))
            w = max(1, round(x.shape[3] * s))
            xs = x if (h, w) == x.shape[2:] else F.interpolate(
                x, size=(h, w), mode="bilinear", align_corners=False,
                antialias=True)
            fmap = model(xs)
            if pooling == "gem":
                d = gem_pool_t(fmap, gem_p)
            elif pooling == "rmac":
                d = rmac_pool_t(fmap, levels)
            elif pooling == "mac":
                d = fmap.amax(dim=(2, 3))
            else:
                d = fmap.mean(dim=(2, 3))
            descs.append(F.normalize(d, dim=-1, eps=1e-12))
    out = torch.stack(descs).mean(dim=0)
    return F.normalize(out, dim=-1, eps=1e-12).numpy()


def fit_whitening_np(X: np.ndarray, dim: int | None = None,
                     eps: float = 1e-9):
    """PCA-whitening via SVD (independent of the jax eigh path):
    returns (P [dim, D], mu [D])."""
    X = X.astype(np.float64)
    n, d = X.shape
    dim = d if not dim else min(dim, d)
    dim = min(dim, max(n - 1, 1))          # rank clamp, same discipline
    mu = X.mean(axis=0)
    Xc = X - mu
    _, s, vt = np.linalg.svd(Xc, full_matrices=False)
    lam = (s * s) / max(n - 1, 1)
    P = vt[:dim] / np.sqrt(np.maximum(lam[:dim], eps))[:, None]
    return P.astype(np.float32), mu.astype(np.float32)


def apply_whitening_np(x: np.ndarray, P: np.ndarray, mu: np.ndarray
                       ) -> np.ndarray:
    out = (x.astype(np.float32) - mu) @ P.T
    n = np.linalg.norm(out, axis=-1, keepdims=True)
    return out / np.maximum(n, 1e-6)


def average_precision_np(ranked: np.ndarray, positives: set, junk: set
                         ) -> float:
    """Junk-aware AP, vectorized — independent of eval/revisited.compute_ap."""
    r = ranked[~np.isin(ranked, np.fromiter(junk, dtype=ranked.dtype,
                                            count=len(junk)))] \
        if junk else ranked
    hit_pos = np.flatnonzero(np.isin(r, np.fromiter(
        positives, dtype=r.dtype, count=len(positives))))[:len(positives)]
    if hit_pos.size == 0:
        return 0.0
    k = np.arange(1, hit_pos.size + 1, dtype=np.float64)
    prec_after = k / (hit_pos + 1)
    prec_before = np.where(hit_pos == 0, 1.0, (k - 1) / np.maximum(hit_pos, 1))
    return float(((prec_before + prec_after) / 2).sum() / len(positives))
