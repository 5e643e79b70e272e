"""Fine-tuning orchestration (SURVEY.md C17; arXiv:1711.02512 §4):
epochs of { extract pool descriptors -> mine hard negatives -> train on
(anchor, positive, negatives) tuples }, then hand the tuned variables back
to the extraction/indexing stack.

The reference's training data model is class-labeled image groups (same
instance/landmark); here any ``(paths, labels)`` pairing works, including
the synthetic mini fixture's instances.
"""
from __future__ import annotations

import numpy as np

from ..config import ExtractConfig, TrainConfig
from ..data import frontend
from ..extractor import Extractor
from ..utils import get_logger
from .mining import mine_hard_negatives
from .trainer import Trainer

log = get_logger("instsearch.finetune")


def _load_images(paths, size):
    imgs = []
    for p in paths:
        img = frontend.load_square(p, size)
        if img is None:
            raise FileNotFoundError(p)
        imgs.append(img)
    return np.stack(imgs)


def finetune(paths, labels, cfg: TrainConfig, epochs: int = 1,
             steps_per_epoch: int | None = None, mesh=None,
             seed: int = 0, variables: dict | None = None,
             fit_lw: bool = False, lw_dim: int = 0) -> dict:
    """Returns ``{"variables": tuned flax variables, "losses": [...]}``.

    Each epoch re-extracts pool descriptors with the *current* weights and
    re-mines hard negatives (ibid. §4.3), then iterates contrastive steps
    over anchor/positive pairs drawn from same-label groups.

    ``fit_lw`` adds the published post-training step (arXiv:1711.02512
    §3.4): re-extract with the FINAL weights and fit Lw discriminative
    whitening on the anchor/positive pairs — returned as ``"whitening"``
    (a WhiteningParams) for Index.build(whitening=...). ``lw_dim`` 0 keeps
    full dimensionality.
    """
    labels = np.asarray(labels)
    paths = list(paths)
    trainer = Trainer(cfg, mesh=mesh, seed=seed, variables=variables)
    images = _load_images(paths, cfg.image_size)
    rng = np.random.default_rng(seed)
    losses: list[float] = []

    # anchor/positive candidates: labels with >= 2 images
    by_label: dict = {}
    for i, l in enumerate(labels):
        by_label.setdefault(int(l), []).append(i)
    pairs = [(a, p) for group in by_label.values() if len(group) >= 2
             for a in group for p in group if a != p]
    if not pairs:
        raise ValueError("need at least one label with >= 2 images")

    for epoch in range(epochs):
        # -- re-extract pool with current weights, re-mine negatives --
        ex = Extractor(ExtractConfig(
            backbone=cfg.backbone, pooling=cfg.pooling,
            gem_p=trainer.gem_p,
            image_size=cfg.image_size, batch_size=cfg.batch_size * 4,
            dtype="float32"), variables=trainer.variables)
        pool, kept = ex.extract_paths(paths)
        # pool rows must align 1:1 with labels/pairs: a quarantined image
        # (native loader stricter than the cv2 path _load_images used)
        # would silently shift every later row onto the wrong label and
        # corrupt mining (review r2)
        if len(kept) != len(paths) or not np.array_equal(
                kept, np.arange(len(paths))):
            bad = sorted(set(range(len(paths))) - set(int(i) for i in kept))
            raise ValueError(
                f"finetune pool extraction dropped images at positions "
                f"{bad[:5]}{'...' if len(bad) > 5 else ''}; remove or fix "
                f"them (labels would misalign)")
        anchor_idx = np.asarray([a for a, _ in pairs])
        negs = mine_hard_negatives(pool, labels, pool[anchor_idx],
                                   labels[anchor_idx],
                                   num_negatives=cfg.num_negatives)

        order = rng.permutation(len(pairs))
        n_steps = steps_per_epoch or max(1, len(pairs) // cfg.batch_size)
        for step in range(n_steps):
            take = order[(step * cfg.batch_size) % len(pairs):][:cfg.batch_size]
            if len(take) < cfg.batch_size:   # wrap around
                take = np.concatenate(
                    [take, order[:cfg.batch_size - len(take)]])
            batch_idx = []
            for j in take:
                a, p = pairs[j]
                batch_idx.append([a, p] + list(negs[j]))
            batch = images[np.asarray(batch_idx)]     # [B, 2+n, S, S, 3]
            metrics = trainer.step(batch)
            losses.append(metrics["loss"])
        log.info("epoch %d: loss %.4f -> %.4f", epoch,
                 losses[-n_steps], losses[-1])

    out = {"variables": trainer.variables, "gem_p": trainer.gem_p,
           "losses": losses, "trainer": trainer}
    if fit_lw:
        import jax.numpy as jnp

        from ..ops.whitening import fit_lw_whitening
        ex = Extractor(ExtractConfig(
            backbone=cfg.backbone, pooling=cfg.pooling, gem_p=trainer.gem_p,
            image_size=cfg.image_size, batch_size=cfg.batch_size * 4,
            dtype="float32"), variables=trainer.variables)
        pool, kept = ex.extract_paths(paths)
        assert len(kept) == len(paths), "pool/pair misalignment (see epoch check)"
        a_idx = np.asarray([a for a, _ in pairs])
        p_idx = np.asarray([p for _, p in pairs])
        out["whitening"] = fit_lw_whitening(
            jnp.asarray(pool[a_idx]), jnp.asarray(pool[p_idx]),
            dim=lw_dim or None)
        log.info("fit Lw whitening on %d pairs (dim=%s)", len(pairs),
                 lw_dim or "full")
    return out
