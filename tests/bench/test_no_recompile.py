"""Bench smoke (SURVEY.md §4.6): hot paths must not recompile across
batches — recompilation in the serving loop would wreck the throughput
targets silently."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu import ExtractConfig, PipelineConfig, SearchConfig
from instsearch_tpu.extractor import Extractor
from instsearch_tpu.index import Index


def _count_compiles(fn_calls):
    with jax.log_compiles(True):
        import logging

        class Grab(logging.Handler):
            def __init__(self):
                super().__init__()
                self.n = 0

            def emit(self, record):
                if "Compiling" in record.getMessage():
                    self.n += 1

        grab = Grab()
        logger = logging.getLogger("jax._src.dispatch")
        logger.addHandler(grab)
        logger.setLevel(logging.WARNING)
        try:
            fn_calls()
        finally:
            logger.removeHandler(grab)
        return grab.n


@pytest.mark.slow
def test_extractor_no_recompile_across_batches(rng):
    cfg = ExtractConfig(backbone="vgg16", pooling="gem", image_size=32,
                        batch_size=4, dtype="float32")
    ex = Extractor(cfg, seed=0)
    batches = [(rng.random((4, 32, 32, 3)) * 255).astype(np.uint8)
               for _ in range(4)]
    ex(jnp.asarray(batches[0]))  # warm

    def run():
        for b in batches[1:]:
            np.asarray(ex(jnp.asarray(b)))

    assert _count_compiles(run) == 0


@pytest.mark.slow
def test_search_no_recompile_across_queries(rng):
    X = rng.standard_normal((128, 32)).astype(np.float32)
    cfg = PipelineConfig(search=SearchConfig(k=5, use_pallas=False))
    idx = Index.from_descriptors(X, [str(i) for i in range(128)], cfg)
    idx.search(X[:2])  # warm

    def run():
        for i in range(3):
            idx.search(X[2 * i:2 * i + 2])

    assert _count_compiles(run) == 0


@pytest.mark.slow
def test_add_no_recompile(rng):
    """Incremental add() within capacity keeps every array shape static,
    so the serving programs (search, ranking) never recompile."""
    X = rng.standard_normal((64, 32)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    from instsearch_tpu import IndexConfig
    cfg = PipelineConfig(index=IndexConfig(row_tile=8, capacity=256),
                         search=SearchConfig(k=5, use_pallas=False))
    idx = Index.from_descriptors(X, [str(i) for i in range(64)], cfg)
    idx.search(X[:2])  # warm
    Y = rng.standard_normal((16, 32)).astype(np.float32)

    def run():
        idx.add(descriptors=Y, names=[f"n{i}" for i in range(16)])
        idx.search(Y[:2])
        idx.search(X[:2])

    assert _count_compiles(run) == 0


@pytest.mark.slow
def test_int4_and_diffusion_no_recompile(rng):
    """The new tiers keep the static-shape discipline: repeated int4
    searches (packed store + scales) and diffusion composites across
    different query batches never recompile."""
    from instsearch_tpu import IndexConfig
    X = rng.standard_normal((128, 32)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    cfg = PipelineConfig(
        index=IndexConfig(dtype="int4", row_tile=8),
        search=SearchConfig(k=5, diffusion_enabled=True, diffusion_depth=16,
                            diffusion_knn=4, use_pallas=False))
    idx = Index.from_descriptors(X, [str(i) for i in range(128)], cfg)
    idx.search(X[:2])  # warm (diffusion composite over int4 store)

    def run():
        for i in range(3):
            idx.search(X[2 * i:2 * i + 2])

    assert _count_compiles(run) == 0


def test_range_and_knn_no_recompile(rng):
    """search_range and knn_graph reuse their compiled programs across
    calls (fixed query widths / the one chunk shape)."""
    from instsearch_tpu import IndexConfig

    X = rng.standard_normal((256, 32)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    cfg = PipelineConfig(extract=ExtractConfig(dtype="float32"),
                         index=IndexConfig(dtype="float32", row_tile=8),
                         search=SearchConfig(k=5, use_pallas=False,
                                             query_chunk=64))
    idx = Index.from_descriptors(X, [f"im{i}" for i in range(256)], cfg)
    idx.search_range(X[:4], 0.3, max_results=32)          # warm
    idx.knn_graph(k=3)                                    # warm
    idx.reconstruct(names=["im0", "im1"])                 # warm (pow2=8)

    def run():
        for q0 in (4, 8, 12):
            s, i, c = idx.search_range(X[q0:q0 + 4], 0.25, max_results=32)
            assert c.shape == (4,)
        idx.knn_graph(k=3)
        idx.reconstruct(names=["im5", "im6", "im7"])      # same pow2 bucket

    assert _count_compiles(run) == 0
