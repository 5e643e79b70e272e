"""Oxford105k-style distractor extension (BASELINE config 4, classic form)."""
import os

import numpy as np
import pytest

from instsearch_tpu import ExtractConfig, IndexConfig, PipelineConfig
from instsearch_tpu.eval import make_mini_dataset
from instsearch_tpu.eval.datasets import with_distractors
from instsearch_tpu.eval.evaluate import build_index_for_dataset, evaluate_index


@pytest.mark.slow
def test_distractors_extend_database(tmp_path):
    import cv2
    mini = make_mini_dataset(str(tmp_path / "mini"), n_instances=3,
                             n_views=3, n_distractors=0, seed=23)
    ddir = tmp_path / "flickr"
    ddir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(12):
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(ddir / f"d{i:03d}.jpg"), img)

    base_n = len(mini.imlist)
    ds = with_distractors(mini, str(ddir))
    assert len(ds.imlist) == base_n + 12
    # gnd indices still point at the original database entries
    assert max(max(e["easy"] + e["hard"] + e["junk"]) for e in ds.gnd) < base_n

    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="gem", image_size=64,
                              batch_size=8, dtype="float32"),
        index=IndexConfig(num_shards=1, row_tile=8))
    idx = build_index_for_dataset(ds, cfg)
    assert idx.num_valid == base_n + 12
    res = evaluate_index(idx, ds, "medium")
    # same-instance near-duplicates must still dominate random distractors
    assert res["mAP"] > 70, res
