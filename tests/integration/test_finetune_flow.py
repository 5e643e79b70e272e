"""Full C17 flow: mine -> fine-tune -> re-index -> evaluate."""
import numpy as np
import pytest

from instsearch_tpu import ExtractConfig, PipelineConfig, TrainConfig
from instsearch_tpu.eval import make_mini_dataset
from instsearch_tpu.eval.evaluate import evaluate_index
from instsearch_tpu.index import Index
from instsearch_tpu.train.finetune import finetune


@pytest.mark.slow
def test_finetune_then_index(tmp_path):
    mini = make_mini_dataset(str(tmp_path / "mini"), n_instances=4,
                             n_views=3, n_distractors=4, seed=13)
    # labels: instance id for views, unique ids for distractors
    paths, labels = [], []
    next_label = 0
    for name in mini.imlist:
        paths.append(mini.image_path(name))
        if name.startswith("inst"):
            labels.append(int(name[4:6]))
        else:
            labels.append(100 + next_label)
            next_label += 1

    cfg = TrainConfig(backbone="vgg16", pooling="gem", image_size=32,
                      batch_size=4, num_negatives=2, dtype="float32",
                      lr=5e-5, learn_gem_p=True)
    out = finetune(paths, labels, cfg, epochs=2, steps_per_epoch=4, seed=0)
    assert len(out["losses"]) == 8
    assert np.isfinite(out["losses"]).all()
    # tuned GeM p moved and is exported cleanly
    assert out["gem_p"] != 3.0
    assert "gem_p" not in out["variables"]["params"]

    pcfg = PipelineConfig(extract=ExtractConfig(
        backbone="vgg16", pooling="gem", gem_p=out["gem_p"], image_size=32,
        batch_size=8, dtype="float32"))
    idx = Index.build(mini.db_paths, pcfg, variables=out["variables"])
    res = evaluate_index(idx, mini, "medium")
    assert np.isfinite(res["mAP"])
    assert res["mAP"] > 50.0, res   # sanity: tuned weights still retrieve
