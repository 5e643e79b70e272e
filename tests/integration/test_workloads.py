"""All five BASELINE workload presets must run end-to-end (SURVEY.md §6)."""
import numpy as np
import pytest

from instsearch_tpu.eval import make_mini_dataset
from instsearch_tpu.workloads import list_presets, run_workload


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    return make_mini_dataset(str(tmp_path_factory.mktemp("mini_wl")), seed=6)


def test_all_presets_listed():
    names = list_presets()
    # 5 BASELINE workloads + the production-scale int8 preset
    assert len(names) >= 5
    for required in ("oxford5k_resnet50_avgpool", "paris6k_vgg16_rmac_whiten",
                     "roxford_gem_multiscale_qe", "oxford105k_sharded8",
                     "rerank_regional_top100"):
        assert required in names


@pytest.mark.slow
@pytest.mark.parametrize("name", list_presets())
def test_preset_runs(mini, name):
    res = run_workload(name, mini, scale_down=True)
    assert np.isfinite(res["mAP"]) and 0 <= res["mAP"] <= 100
    assert res["num_images"] == len(mini.imlist)
    if res["num_shards"] > 1:
        # sharded workloads compute the protocol RANKING through
        # ShardedIndex and must agree with the single-device run exactly
        # (rank-level, not just mAP — workloads.run_workload compares both)
        assert res["sharded_matches_single"], res
    if name == "oxford105k_sharded8":
        assert res["num_shards"] == 8   # CPU test rig has 8 virtual devices
        assert "mAP_sharded" in res
    # every stage the preset enables must appear in evaluate's execution
    # record — the guard that would have caught the r3 bug where evaluate
    # silently dropped the lw stage and the lw preset's reported mAP was
    # a plain-cosine number
    assert res["stages_missing"] == [], res
    if res.get("rerank") or res.get("lw"):
        # rank-moving stages must also CHANGE the protocol ranking vs the
        # all-stages-off config (diffusion is legitimately order-
        # preserving on the tight near-duplicate mini clusters —
        # test_quality_lift.py pins its effect on manifold data instead)
        assert res["rescoring_changed_ranking"], res
