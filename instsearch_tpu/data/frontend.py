"""Image frontend (SURVEY.md C1): host decode + device-side preprocessing.

Split TPU-first: the host does only what must be done on host (JPEG decode,
one cheap uint8 resize to a fixed canvas so batches have static shapes); the
float conversion, ImageNet normalization, and any multi-scale resizing are
jitted and fuse into the extraction XLA program (SURVEY.md §3.1) so the
host→device transfer is uint8 (3x smaller than f32) and the chip never
waits on host float math.
"""
from __future__ import annotations

import os
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# Host side
# ---------------------------------------------------------------------------

def decode_image(path: str) -> np.ndarray | None:
    """Decode to RGB uint8 HWC; returns None for corrupt/missing files
    (quarantined by the caller, never fatal — SURVEY.md §5 failure handling)."""
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            return None
        return img[:, :, ::-1]  # BGR -> RGB
    except Exception:
        return None


def resize_shorter_side(img: np.ndarray, target: int) -> np.ndarray:
    """uint8 resize so the shorter side == target (aspect preserved)."""
    import cv2
    h, w = img.shape[:2]
    scale = target / min(h, w)
    nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
    return cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    y0 = max(0, (h - size) // 2)
    x0 = max(0, (w - size) // 2)
    return img[y0:y0 + size, x0:x0 + size]


def load_square(path: str, size: int) -> np.ndarray | None:
    """decode -> shorter-side resize -> center crop: uint8 [size, size, 3]."""
    img = decode_image(path)
    if img is None:
        return None
    return center_crop(resize_shorter_side(img, size), size)


def _iter_images(paths: Sequence[str], size: int,
                 quarantine: list | None) -> Iterable[tuple[np.ndarray, int]]:
    """Stream (decoded uint8 [S,S,3], original index); prefers the native
    C++ threaded loader (data/native_frontend.py), falls back to cv2."""
    from . import native_frontend as nf
    from ..utils.observe import annotate
    if nf.available():
        chunk = 64
        for start in range(0, len(paths), chunk):
            sub = list(paths[start:start + chunk])
            with annotate("host_decode_native"):   # host-stage attribution
                imgs, ok = nf.load_batch_native(sub, size)
            for j, good in enumerate(ok):
                if good:
                    yield imgs[j], start + j
                elif quarantine is not None:
                    quarantine.append(sub[j])
        return
    for i, p in enumerate(paths):
        img = load_square(p, size)
        if img is None:
            if quarantine is not None:
                quarantine.append(p)
            continue
        yield img, i


def batch_paths(paths: Sequence[str], size: int, batch: int,
                quarantine: list | None = None) -> Iterable[tuple[np.ndarray, np.ndarray]]:
    """Yield (uint8 [B,S,S,3], global index [B]) batches; final batch padded
    by repeating the last valid image (callers slice by the index array)."""
    buf, idxs = [], []
    for img, i in _iter_images(paths, size, quarantine):
        buf.append(img)
        idxs.append(i)
        if len(buf) == batch:
            yield np.stack(buf), np.asarray(idxs)
            buf, idxs = [], []
    if buf:
        pad = batch - len(buf)
        yield (np.stack(buf + [buf[-1]] * pad),
               np.asarray(idxs + [-1] * pad))


# ---------------------------------------------------------------------------
# Device side (jit-fused into the extraction program)
# ---------------------------------------------------------------------------

def normalize(images: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """uint8/float [N,H,W,3] -> ImageNet-normalized float [N,H,W,3].

    Input contract: uint8 images are pixel values [0, 255] (divided by 255
    here); float images must ALREADY be scaled to [0, 1] — a float batch in
    [0, 255] would silently produce garbage descriptors, so the user-facing
    entry point (Index.query) rejects out-of-range float images before they
    reach this jitted stage (it cannot branch on values itself)."""
    x = images.astype(jnp.float32) / 255.0 if images.dtype == jnp.uint8 \
        else images.astype(jnp.float32)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def rescale(images: jax.Array, scale: float, method: str = "bilinear") -> jax.Array:
    """Device-side multi-scale resize (arXiv:1711.02512): static shapes since
    ``scale`` is a Python float bound at trace time."""
    n, h, w, c = images.shape
    nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
    if (nh, nw) == (h, w):
        return images
    return jax.image.resize(images, (n, nh, nw, c), method=method)
