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
    model, spec = get_backbone(cfg.backbone, dtype=dtype,
                               attention=cfg.vit_attention)

    def extract(variables, images, whitening: Optional[WhiteningParams] = None):
        # named_scope: per-stage attribution in TPU profiler traces
        # (SURVEY.md §5 tracing row); free at runtime, names the HLO.
        with jax.named_scope("frontend"):
            x = frontend.normalize(images, dtype=dtype)
        descs = []
        for scale in cfg.scales:
            with jax.named_scope(f"backbone_s{scale:g}"):
                xs = frontend.rescale(x, scale)
                variants = (xs, jnp.flip(xs, axis=2)) if cfg.flip else (xs,)
                for xv in variants:           # flip TTA: mirrored pass too
                    fmap = model.apply(variables, xv)
                    with jax.named_scope("pool"):
                        d = pool(fmap, cfg)
                    descs.append(l2_normalize(d.astype(jnp.float32), axis=-1))
        desc = jnp.mean(jnp.stack(descs, 0), axis=0) if len(descs) > 1 else descs[0]
        desc = l2_normalize(desc, axis=-1)
        if whitening is not None:
            with jax.named_scope("whiten"):
                desc = apply_whitening(desc, whitening)   # includes re-L2
        return desc

    return model, extract


def build_regional_fn(cfg: ExtractConfig):
    """Per-region R-MAC descriptors for the re-ranking store (SURVEY.md C13):
    ``(variables, images, whitening) -> [N, R, D]`` unit-norm per region."""
    from .ops.pooling import rmac_regional_descriptors

    dtype = _DTYPES[cfg.dtype]
    model, spec = get_backbone(cfg.backbone, dtype=dtype,
                               attention=cfg.vit_attention)

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


def build_combined_fn(cfg: ExtractConfig):
    """ONE jitted program emitting BOTH the global descriptor and the
    regional re-rank rows: ``(variables, images, whitening) ->
    ([N, D], [N, R, D])``. The scale-1.0 backbone pass is shared between
    the global pooling and the regional R-MAC grid, so a rerank-enabled
    index build decodes and runs the backbone over the corpus ONCE —
    the previous two-pass build (extract_paths then
    extract_paths_regional) doubled the most expensive offline step
    (SURVEY.md §3.1: descriptors written once per batch; review r2)."""
    from .ops.pooling import rmac_regional_descriptors

    dtype = _DTYPES[cfg.dtype]
    model, spec = get_backbone(cfg.backbone, dtype=dtype,
                               attention=cfg.vit_attention)

    def extract_combined(variables, images,
                         whitening: Optional[WhiteningParams] = None):
        with jax.named_scope("frontend"):
            x = frontend.normalize(images, dtype=dtype)
        descs = []
        fmap_s1 = None
        for scale in cfg.scales:
            with jax.named_scope(f"backbone_s{scale:g}"):
                xs = frontend.rescale(x, scale)
                fmap = model.apply(variables, xs)
            if scale == 1.0:
                fmap_s1 = fmap                    # shared with regional
            with jax.named_scope("pool"):
                d = pool(fmap, cfg)
            descs.append(l2_normalize(d.astype(jnp.float32), axis=-1))
            if cfg.flip:                          # flip TTA (global only:
                # region geometry is side-dependent, store stays unflipped)
                fm = model.apply(variables, jnp.flip(xs, axis=2))
                df = pool(fm, cfg)
                descs.append(l2_normalize(df.astype(jnp.float32), axis=-1))
        desc = (jnp.mean(jnp.stack(descs, 0), axis=0)
                if len(descs) > 1 else descs[0])
        desc = l2_normalize(desc, axis=-1)
        if fmap_s1 is None:                       # 1.0 not among the scales
            with jax.named_scope("backbone_regional"):
                fmap_s1 = model.apply(variables, x)
        with jax.named_scope("regional_pool"):
            reg = rmac_regional_descriptors(fmap_s1, cfg.rmac_levels)
            reg = l2_normalize(reg.astype(jnp.float32), axis=-1)
        if whitening is not None:
            with jax.named_scope("whiten"):
                desc = apply_whitening(desc, whitening)
                reg = apply_whitening(reg, whitening)
        return desc, reg

    return model, extract_combined


class Extractor:
    """Convenience stateful wrapper holding variables + jitted extract fn.

    ``mesh`` enables data-parallel extraction (SURVEY.md §2.2 DP row):
    the image batch is committed row-sharded over the mesh's first axis and
    the variables replicated, so the ONE jitted program XLA-partitions over
    the batch dimension — each chip runs the full backbone on its slice.
    The 1-device mesh is the identical code path.
    """

    def __init__(self, cfg: ExtractConfig,
                 variables: dict | None = None,
                 whitening: WhiteningParams | None = None,
                 seed: int = 0, mesh=None):
        if (mesh is not None and "model" in mesh.axis_names
                and cfg.vit_attention != "xla"):
            # under TP, GSPMD cannot partition a pallas_call — it would
            # all-gather the head-sharded q/k/v around the kernel; the XLA
            # einsum path partitions cleanly along the head axis. 'auto'
            # would resolve to xla inside the model anyway (models/vit.py);
            # normalizing it here makes the resolved cfg inspectable.
            cfg = cfg.replace(vit_attention="xla")
        self.cfg = cfg
        self.seed = seed
        self.model, self._fn = build_extract_fn(cfg)
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(seed),
                np.zeros((1, cfg.image_size, cfg.image_size, 3), np.float32))
        self.mesh = mesh
        if mesh is not None:
            # a 1-device mesh takes the identical code path (CLAUDE.md
            # convention): same sharding commits, same padding logic
            from jax.sharding import NamedSharding, PartitionSpec as P
            # on a 2-D (data x shard) mesh, DP uses the 'data' axis and the
            # batch is replicated over the others; a 'model' axis is never
            # a batch axis — it carries the Megatron TP split of the ViT
            # attention/MLP weights (parallel/tp.py, SURVEY.md §2.2 TP row)
            batch_axes = [a for a in mesh.axis_names if a != "model"]
            self._axis = ("data" if "data" in mesh.axis_names
                          else (batch_axes[0] if batch_axes else None))
            self._dp_size = mesh.shape[self._axis] if self._axis else 1
            self._img_sharding = NamedSharding(
                mesh, P(self._axis) if self._axis else P())
            if "model" in mesh.axis_names:
                from .parallel.tp import place_tp
                variables = place_tp(mesh, variables, axis="model")
            else:
                variables = jax.device_put(variables,
                                           NamedSharding(mesh, P()))
        else:
            self._img_sharding = None
        self.variables = variables
        self.whitening = whitening
        self._jit = jax.jit(self._fn)
        self._regional_jit = None
        self._combined_jit = None

    def _place(self, images) -> jax.Array:
        """Commit the batch to the DP sharding (pad rows to the device
        count; callers slice the output back)."""
        images = jnp.asarray(images)
        if self._img_sharding is None:
            return images, images.shape[0]
        n = self._dp_size
        b = images.shape[0]
        pad = (-b) % n
        if pad:
            images = jnp.concatenate(
                [images, jnp.zeros((pad,) + images.shape[1:], images.dtype)])
        return jax.device_put(images, self._img_sharding), b

    def __call__(self, images) -> jax.Array:
        images, b = self._place(images)
        out = self._jit(self.variables, images, self.whitening)
        return out if out.shape[0] == b else out[:b]

    def regional_geometry(self) -> "np.ndarray":
        """R-MAC grid geometry ``[R, 3]`` (cx, cy, log side) in feature-map
        coordinates for this config — the trace-time constant the spatial
        verification stage bins transform hypotheses against
        (search/spatial.py). Uses ``jax.eval_shape`` (no compute) to learn
        the backbone's map size at ``image_size``."""
        from .ops.pooling import rmac_region_geometry
        s = self.cfg.image_size
        fmap = jax.eval_shape(
            lambda v, x: self.model.apply(v, x), self.variables,
            jax.ShapeDtypeStruct((1, s, s, 3), jnp.float32))
        return rmac_region_geometry(fmap.shape[1], fmap.shape[2],
                                    self.cfg.rmac_levels)

    def extract_regional(self, images) -> jax.Array:
        """[B, S, S, 3] -> [B, R, D] per-region descriptors (same weights,
        same whitening as the global pipeline)."""
        if self._regional_jit is None:
            _, fn = build_regional_fn(self.cfg)
            self._regional_jit = jax.jit(fn)
        images, b = self._place(images)
        out = self._regional_jit(self.variables, images, self.whitening)
        return out if out.shape[0] == b else out[:b]

    def _batches(self, paths, quarantine=None):
        """Prefetching input pipeline (SURVEY.md §7 hard part 4): a
        background thread decodes batch i+depth (via the native C++ loader
        when built) while the device runs batch i.

        Single-device extraction also pushes each batch to the device FROM
        THE PRODUCER THREAD (device_put releases the GIL, so decode,
        transfer and dispatch pipeline even on one host core): measured
        115 -> 231 img/s e2e on this box at depth 4 — the r2 claim that
        producer-side device_put was slower only held at depth 2, where
        the 2-batch buffer couldn't hide the transfer. DP-mesh extraction
        keeps host batches: _place must pad and commit them to the mesh
        sharding, which a plain producer-side device_put would fight."""
        from .data.loader import iter_batches
        single_device = self._img_sharding is None
        return iter_batches(paths, self.cfg.image_size, self.cfg.batch_size,
                            quarantine, depth=4,
                            device_put=single_device)

    def _extract_loop(self, paths, quarantine, run):
        """Prefetch-overlapped loop shared by every paths-based extraction:
        host decodes batch i+1 in a background thread while the device runs
        batch i (dispatch is async; the np.asarray readback of batch i-1 is
        the only host sync). ``run(batch) -> array | tuple`` of per-row
        outputs. Returns ``(list of np arrays per output, kept_indices)``."""
        outs: "list[list] | None" = None
        kept = []
        pending = None

        def drain(pending):
            res, pidxs = pending
            res = res if isinstance(res, tuple) else (res,)
            keep = pidxs >= 0
            for slot, r in zip(outs, res):
                slot.append(np.asarray(r)[keep])
            kept.append(pidxs[keep])

        for batch, idxs in self._batches(paths, quarantine):
            res = run(batch)                 # async dispatch; no host sync
            if outs is None:
                outs = [[] for _ in (res if isinstance(res, tuple) else (res,))]
            if pending is not None:
                drain(pending)
            pending = (res, idxs)
        if pending is not None:
            drain(pending)
        if outs is None:
            return None, np.zeros((0,), np.int64)
        from .utils import COUNTERS
        kept = np.concatenate(kept)
        COUNTERS.add("images_extracted", len(kept))
        return [np.concatenate(o) for o in outs], kept

    def extract_paths(self, paths, quarantine: list | None = None):
        """Prefetch-overlapped loop: host decodes ahead in a background
        thread, device extracts. Returns
        ``(descriptors [N,D] f32 numpy, kept_indices [N])``."""
        outs, kept = self._extract_loop(paths, quarantine, self)
        if outs is None:
            return (np.zeros((0, self.cfg.descriptor_dim), np.float32),
                    np.zeros((0,), np.int64))
        return outs[0], kept

    def extract_paths_with_regional(self, paths,
                                    quarantine: list | None = None):
        """Single-pass build extraction: ONE decode + ONE backbone pass per
        image yields both the global descriptor and the regional re-rank
        rows (build_combined_fn). Returns ``(descriptors [N, D],
        regional [N, R, Dr], kept_indices [N])`` — rows aligned by
        construction, so no cross-pass misalignment can exist."""
        if self._combined_jit is None:
            _, fn = build_combined_fn(self.cfg)
            self._combined_jit = jax.jit(fn)

        def run(batch):
            images, b = self._place(batch)
            d, r = self._combined_jit(self.variables, images, self.whitening)
            return (d if d.shape[0] == b else d[:b],
                    r if r.shape[0] == b else r[:b])

        outs, kept = self._extract_loop(paths, quarantine, run)
        if outs is None:
            return (np.zeros((0, self.cfg.descriptor_dim), np.float32),
                    np.zeros((0, 0, 0), np.float32), np.zeros((0,), np.int64))
        return outs[0], outs[1], kept
