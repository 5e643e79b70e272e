"""Siamese/contrastive fine-tuning for retrieval (SURVEY.md C17,
arXiv:1711.02512 §4): tuples of (anchor, positive, negatives...) pass
through the backbone + GeM, and a contrastive (or triplet) loss pulls
matching pairs together in descriptor space.

TPU-native: the train step is one jitted SPMD program, data-parallel over
the 'data' mesh axis via sharding annotations — XLA inserts the gradient
all-reduce (SURVEY.md §2.2 DP row). BatchNorm runs in inference mode with
frozen statistics, the standard retrieval fine-tuning setup (ibid.), which
keeps the step functional (no mutable batch-stats collection).
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import TrainConfig
from ..models import get_backbone
from ..ops import gem_pool, l2_normalize, mac_pool, avg_pool

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}


class TrainState(NamedTuple):
    params: Any
    frozen: Any            # batch_stats etc. (no gradients)
    opt_state: Any
    step: jax.Array


def _descriptors(model, params, frozen, images, cfg: TrainConfig):
    """images [B, S, S, 3] float -> [B, D] unit descriptors.

    When ``cfg.learn_gem_p``, the GeM exponent lives in ``params['gem_p']``
    and receives gradients (arXiv:1711.02512 learns p jointly)."""
    backbone_params = {k: v for k, v in params.items() if k != "gem_p"}
    variables = {"params": backbone_params, **frozen}
    apply = jax.checkpoint(model.apply) if cfg.remat else model.apply
    fmap = apply(variables, images)
    if cfg.pooling == "gem":
        p = params["gem_p"] if cfg.learn_gem_p else cfg.gem_p
        d = gem_pool(fmap, p)
    elif cfg.pooling == "mac":
        d = mac_pool(fmap)
    else:
        d = avg_pool(fmap)
    return l2_normalize(d.astype(jnp.float32), axis=-1)


def contrastive_loss(desc: jax.Array, cfg: TrainConfig) -> jax.Array:
    """desc: [B, T, D] with T = anchor, positive, negatives...
    L = 0.5*||a-p||^2 + sum_n 0.5*max(0, margin - ||a-n||)^2  (ibid. eq. 1)."""
    a, p, negs = desc[:, 0], desc[:, 1], desc[:, 2:]
    pos = 0.5 * jnp.sum(jnp.square(a - p), axis=-1)
    dneg = jnp.linalg.norm(a[:, None] - negs, axis=-1)          # [B, Nneg]
    neg = 0.5 * jnp.sum(jnp.square(jnp.maximum(0.0, cfg.margin - dneg)), axis=-1)
    return jnp.mean(pos + neg)


def triplet_loss(desc: jax.Array, cfg: TrainConfig) -> jax.Array:
    """max(0, ||a-p||^2 - ||a-n||^2 + margin), averaged over negatives."""
    a, p, negs = desc[:, 0], desc[:, 1], desc[:, 2:]
    dp = jnp.sum(jnp.square(a - p), axis=-1, keepdims=True)
    dn = jnp.sum(jnp.square(a[:, None] - negs), axis=-1)
    return jnp.mean(jnp.maximum(0.0, dp - dn + cfg.margin))


def smoothap_loss(desc: jax.Array, cfg: TrainConfig) -> jax.Array:
    """Smooth-AP (Brown et al., arXiv:2007.12163): a listwise, directly
    rank-based objective — 1 − mean sigmoid-relaxed Average Precision.

    Candidates for each anchor are ALL positives+negatives in the batch
    (its own positive is the one relevant item; other tuples are distinct
    instances, so their members count as extra in-batch negatives — B·(T−1)−1
    of them instead of the tuple's T−2). With a single relevant item the
    relaxed AP reduces to ``1 / (1 + Σ_j σ((s_j − s_pos)/τ))``: the
    sigmoid counts candidates ranked above the positive, so the loss
    optimizes the metric the evaluator reports rather than a fixed
    margin. τ → 0 recovers exact AP; τ = cfg.smoothap_tau trades gradient
    bandwidth for fidelity (0.01 in the paper). One [B, B(T−1)] MXU
    matmul — no pairwise distance tensors.
    """
    b, t, d = desc.shape
    anchors = desc[:, 0]                               # [B, D]
    cands = desc[:, 1:].reshape(b * (t - 1), d)        # [B(T-1), D]
    scores = anchors @ cands.T                         # [B, B(T-1)] cosine
    pos_idx = jnp.arange(b) * (t - 1)                  # own positive column
    s_pos = scores[jnp.arange(b), pos_idx]             # [B]
    diff = (scores - s_pos[:, None]) / cfg.smoothap_tau
    above = jax.nn.sigmoid(diff)                       # soft [s_j > s_pos]
    # mask the positive's own column (its σ(0)=0.5 would bias every AP)
    mask = jnp.ones_like(scores).at[jnp.arange(b), pos_idx].set(0.0)
    rank_above = jnp.sum(above * mask, axis=-1)        # soft # ranked above
    ap = 1.0 / (1.0 + rank_above)
    return 1.0 - jnp.mean(ap)


class Trainer:
    """Builds the jitted, mesh-sharded train step.

    ``mesh`` is a 1-D ('data',) jax.sharding.Mesh (or None for single
    device). Batches are [B, T, S, S, 3] uint8/float, sharded over B.
    """

    def __init__(self, cfg: TrainConfig, mesh=None, seed: int = 0,
                 variables: dict | None = None):
        self.cfg = cfg
        dtype = _DTYPES[cfg.dtype]
        # attention='xla' (ViT only; no-op for CNNs): the fused Pallas
        # attention kernel has no custom VJP, so fine-tuning always takes
        # the differentiable einsum path — which also composes with remat
        self.model, self.spec = get_backbone(cfg.backbone, dtype=dtype,
                                             attention="xla")
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(seed),
                np.zeros((1, cfg.image_size, cfg.image_size, 3), np.float32))
        variables = dict(variables)
        # deep-copy: the step donates its TrainState buffers, and the
        # non-mesh path would otherwise free the CALLER's arrays
        variables = jax.tree_util.tree_map(jnp.array, variables)
        params = dict(variables.pop("params"))
        if cfg.learn_gem_p and cfg.pooling == "gem":
            params["gem_p"] = jnp.asarray(cfg.gem_p, jnp.float32)
        self.tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
        self.state = TrainState(params=params, frozen=variables,
                                opt_state=self.tx.init(params),
                                step=jnp.zeros((), jnp.int32))
        self.mesh = mesh
        losses = {"contrastive": contrastive_loss, "triplet": triplet_loss,
                  "smoothap": smoothap_loss}
        if cfg.loss not in losses:
            raise ValueError(f"unknown loss {cfg.loss!r}; expected one of "
                             f"{sorted(losses)}")
        loss_fn = losses[cfg.loss]

        def step_fn(state: TrainState, images):
            def loss(params):
                b, t = images.shape[:2]
                flat = images.reshape((b * t,) + images.shape[2:])
                # SAME input normalization as the extraction stack
                # (ImageNet mean/std, data/frontend.py): training on bare
                # [0,1] while mining/serving normalize would optimize the
                # backbone for a different input distribution (review r2)
                from ..data import frontend
                flat = frontend.normalize(flat, dtype=_DTYPES[cfg.dtype])
                desc = _descriptors(self.model, params, state.frozen, flat, cfg)
                return loss_fn(desc.reshape(b, t, -1), cfg)

            lval, grads = jax.value_and_grad(loss)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(params, state.frozen, opt_state, state.step + 1)
            return new_state, {"loss": lval}

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            state_sh = jax.tree_util.tree_map(lambda _: repl, self.state)
            self.state = jax.device_put(self.state, repl)
            # donate the previous TrainState: params+opt buffers are
            # rewritten every step, halving peak HBM for the update
            self._step = jax.jit(step_fn,
                                 in_shardings=(state_sh, data),
                                 out_shardings=(state_sh, repl),
                                 donate_argnums=0)
        else:
            self._step = jax.jit(step_fn, donate_argnums=0)

    def step(self, images) -> dict:
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            images = jax.device_put(
                jnp.asarray(images), NamedSharding(self.mesh, P("data")))
        else:
            images = jnp.asarray(images)
        self.state, metrics = self._step(self.state, images)
        return {k: float(v) for k, v in metrics.items()}

    @property
    def variables(self) -> dict:
        """Backbone variables ready for the extraction stack (the learned
        GeM exponent, if any, is exposed via :attr:`gem_p` instead)."""
        params = {k: v for k, v in self.state.params.items() if k != "gem_p"}
        return {"params": params, **self.state.frozen}

    @property
    def gem_p(self) -> float:
        p = self.state.params.get("gem_p")
        return float(p) if p is not None else float(self.cfg.gem_p)
