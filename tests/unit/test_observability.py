"""Observability is wired into the production paths (SURVEY.md §5):
counters move when queries/extractions happen, and the profiler trace
context produces an on-disk artifact."""
import glob
import os

import numpy as np

from instsearch_tpu import IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.index import Index
from instsearch_tpu.utils import COUNTERS
from instsearch_tpu.utils.observe import trace


def _small_index():
    rng = np.random.default_rng(81)
    X = rng.standard_normal((64, 32)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    cfg = PipelineConfig(index=IndexConfig(row_tile=8),
                         search=SearchConfig(k=5, use_pallas=False))
    return Index.from_descriptors(X, [str(i) for i in range(64)], cfg), X


def test_queries_served_counter_moves():
    idx, X = _small_index()
    before = COUNTERS.dump().get("queries_served", 0)
    idx.search(X[:3])
    idx.query(X[0])
    after = COUNTERS.dump()["queries_served"]
    assert after == before + 4


def test_images_extracted_counter_moves(tmp_path):
    import cv2
    from instsearch_tpu.config import ExtractConfig
    from instsearch_tpu.extractor import Extractor
    paths = []
    for i in range(3):
        p = str(tmp_path / f"i{i}.png")
        cv2.imwrite(p, np.full((40, 40, 3), i * 40, np.uint8))
        paths.append(p)
    ex = Extractor(ExtractConfig(backbone="resnet18", image_size=32,
                                 dtype="float32", batch_size=4), seed=0)
    before = COUNTERS.dump().get("images_extracted", 0)
    ex.extract_paths(paths)
    assert COUNTERS.dump()["images_extracted"] == before + 3


def test_trace_produces_artifact(tmp_path):
    import jax
    import jax.numpy as jnp
    d = str(tmp_path / "trace")
    with trace(d):
        np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 8))))
    found = glob.glob(os.path.join(d, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in found), found


def test_tensorboard_emission(tmp_path):
    from instsearch_tpu.utils.observe import Counters, emit_tensorboard
    c = Counters()
    c.add("images_extracted", 10)
    d = str(tmp_path / "tb")
    emit_tensorboard(d, scalars={"query": {"p50_ms": 1.5, "path": "pallas"}},
                     counters=c)
    files = glob.glob(os.path.join(d, "events.out.tfevents.*"))
    assert files, os.listdir(d)
