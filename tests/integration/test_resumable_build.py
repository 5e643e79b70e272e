"""Resumable build: interrupt mid-way, restart, finalize (SURVEY.md §5)."""
import os

import numpy as np
import pytest

from instsearch_tpu import ExtractConfig, PipelineConfig
from instsearch_tpu.builder import ResumableBuilder
from instsearch_tpu.eval import make_mini_dataset


CFG = PipelineConfig(extract=ExtractConfig(
    backbone="vgg16", pooling="mac", image_size=32, batch_size=4,
    dtype="float32"))


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    return make_mini_dataset(str(tmp_path_factory.mktemp("mini_rb")),
                             n_instances=4, n_views=3, n_distractors=4, seed=4)


@pytest.mark.slow
def test_resume_after_interrupt(mini, tmp_path):
    out = str(tmp_path / "build")
    paths = mini.db_paths

    # first run: simulate crash after 2 groups
    b1 = ResumableBuilder(paths, CFG, out, group_size=1, seed=0)
    orig_run = b1.run
    groups_before_crash = 2

    class Crash(Exception):
        pass

    count = 0
    real_extract = b1.extractor.extract_paths

    def crashing_extract(chunk, quarantine=None):
        nonlocal count
        if count >= groups_before_crash:
            raise Crash()
        count += 1
        return real_extract(chunk, quarantine)

    b1.extractor.extract_paths = crashing_extract
    with pytest.raises(Crash):
        b1.run()
    assert len(b1.manifest["completed"]) == groups_before_crash

    # finalize must refuse while incomplete
    with pytest.raises(RuntimeError):
        b1.finalize()

    # second run: resumes, skips completed groups
    b2 = ResumableBuilder(paths, CFG, out, group_size=1, seed=0)
    assert len(b2.manifest["completed"]) == groups_before_crash
    seen = []
    real2 = b2.extractor.extract_paths

    def tracking_extract(chunk, quarantine=None):
        seen.append(len(chunk))
        return real2(chunk, quarantine)

    b2.extractor.extract_paths = tracking_extract
    b2.run()
    total_groups = -(-len(paths) // b2.group)
    assert len(seen) == total_groups - groups_before_crash

    idx = b2.finalize()
    assert idx.num_valid == len(paths)

    # oracle: one-shot build must produce identical descriptors
    from instsearch_tpu.index import Index
    ref = Index.build(paths, CFG, seed=0)
    np.testing.assert_allclose(
        np.asarray(idx.descriptors, np.float32),
        np.asarray(ref.descriptors, np.float32), atol=1e-5)


def test_resumable_build_attaches_regional_store(tmp_path):
    """A rerank-enabled config must get the same regional store from the
    resumable path as from Index.build (it was silently skipped; review
    r2), and a changed group size restarts cleanly instead of tripping
    finalize's completeness check."""
    import numpy as np
    from instsearch_tpu import ExtractConfig, PipelineConfig, SearchConfig
    from instsearch_tpu.builder import ResumableBuilder
    from instsearch_tpu.eval import make_mini_dataset
    from instsearch_tpu.index import Index

    mini = make_mini_dataset(str(tmp_path / "mini"), n_instances=2,
                             n_views=2, n_distractors=2, seed=21)
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="rmac", image_size=32,
                              batch_size=4, dtype="float32"),
        search=SearchConfig(k=3, rerank_enabled=True, rerank_depth=8,
                            use_pallas=False))
    b = ResumableBuilder(mini.db_paths, cfg, str(tmp_path / "b1"),
                         group_size=1)
    b.run()
    idx = b.finalize()
    assert idx.regional is not None
    ref = Index.build(mini.db_paths, cfg, seed=0)
    np.testing.assert_allclose(np.asarray(idx.regional, np.float32),
                               np.asarray(ref.regional, np.float32),
                               atol=1e-5)

    # restart with a different group size: manifest resets, build completes
    b2 = ResumableBuilder(mini.db_paths, cfg, str(tmp_path / "b1"),
                          group_size=2)
    assert b2.manifest["completed"] == []      # stale ranges discarded
    b2.run()
    idx2 = b2.finalize()
    assert idx2.num_valid == idx.num_valid
