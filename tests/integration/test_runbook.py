"""The anchor-reproduction runbook (docs/RUNBOOK.md) must work TODAY on the
synthetic fixture: preset load, eval-block fallback, --weights conversion,
anchor lookup, JSON emission — the exact `cli evaluate` path that prints
measured-vs-anchor the day real data/weights appear (VERDICT r3 item 8)."""
import json
import os

import numpy as np
import pytest

from instsearch_tpu.cli import main
from instsearch_tpu.config import PipelineConfig
from instsearch_tpu.eval import make_mini_dataset
from instsearch_tpu.eval.anchors import ANCHORS, compare, lookup_anchor
from instsearch_tpu.workloads import load_preset

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "configs")


@pytest.fixture(scope="module")
def mini_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("runbook_data")
    make_mini_dataset(str(root / "mini"), seed=6)
    return str(root)


def _scaled_preset(tmp_path, name: str, **extract_overrides) -> str:
    """The runbook command with CI-scale extraction (64px / batch 8),
    preserving everything the anchor lookup keys on."""
    cfg = load_preset(name)
    cfg = PipelineConfig(
        extract=cfg.extract.replace(image_size=64, batch_size=8,
                                    **extract_overrides),
        index=cfg.index, search=cfg.search, eval=cfg.eval)
    path = str(tmp_path / f"{name}_ci.json")
    cfg.save(path)
    return path


# ---------------------------------------------------------------- anchors
def test_anchor_lookup_matches_runbook_commands():
    """Each documented runbook command resolves to its documented anchor."""
    # workload 1: ResNet-50 avg-pool on Oxford5k (classic protocol)
    cfg = load_preset("oxford5k_resnet50_avgpool")
    a = lookup_anchor(cfg, "oxford5k", "classic")
    assert a is not None and a.map_pct == 47.0

    # workload 2: VGG16 R-MAC on Paris6k, preset ships QE off -> 83.0
    cfg = load_preset("paris6k_vgg16_rmac_whiten")
    a = lookup_anchor(cfg, "paris6k", "classic")
    assert a is not None and a.map_pct == 83.0 and a.qe is False

    # workload 3 at the anchor's backbone (runbook: --backbone resnet101)
    cfg = load_preset("roxford_gem_multiscale_qe")
    cfg101 = PipelineConfig(
        extract=cfg.extract.replace(backbone="resnet101"),
        index=cfg.index, search=cfg.search, eval=cfg.eval)
    for dataset, protocol, expect in (("roxford5k", "medium", 64.7),
                                      ("roxford5k", "hard", 38.5),
                                      ("rparis6k", "medium", 77.2),
                                      ("rparis6k", "hard", 56.3)):
        a = lookup_anchor(cfg101, dataset, protocol)
        assert a is not None and a.map_pct == expect

    # the preset's own resnet50 does NOT fake-match the resnet101 anchor
    assert lookup_anchor(cfg, "roxford5k", "medium") is None
    # the mini fixture matches nothing by construction
    assert lookup_anchor(cfg, "mini", "medium") is None


def test_anchor_compare_fields():
    a = ANCHORS[0]
    rep = compare(a.map_pct + a.tolerance / 2, a)
    assert rep["within_tolerance"] and rep["delta_vs_anchor_pct"] > 0
    rep = compare(a.map_pct - 2 * a.tolerance, a)
    assert not rep["within_tolerance"]
    assert rep["anchor_source"] == a.source


def test_every_anchor_has_a_dataset_loader_name():
    from instsearch_tpu.eval.datasets import load_dataset  # noqa: F401
    known = {"oxford5k", "paris6k", "roxford5k", "rparis6k"}
    for a in ANCHORS:
        assert a.dataset in known
        assert a.protocol in ("classic", "easy", "medium", "hard")


# ------------------------------------------------------------ CLI command
def _run_evaluate(capsys, argv) -> dict:
    rc = main(["evaluate"] + argv)
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.strip().splitlines() if ln]
    return json.loads(lines[-1])


@pytest.mark.slow
def test_runbook_command_on_fixture(tmp_path, mini_root, capsys):
    """The verbatim runbook invocation shape (preset + dataset overrides)
    prints finite metrics; no anchor block on the fixture."""
    cfg_path = _scaled_preset(tmp_path, "oxford5k_resnet50_avgpool")
    res = _run_evaluate(capsys, ["--config", cfg_path,
                                 "--dataset", "mini",
                                 "--data-root", mini_root])
    assert np.isfinite(res["mAP"]) and 0 <= res["mAP"] <= 100
    # eval-block fallback applied: the preset's own protocol, not the
    # bare-invocation default "medium"
    cfg = load_preset("oxford5k_resnet50_avgpool")
    assert res["protocol"] == cfg.eval.protocol
    assert "anchor" not in res


@pytest.mark.slow
def test_runbook_weights_pth_conversion(tmp_path, mini_root, capsys):
    """--weights with a raw torch state_dict checkpoint: converted on load
    and producing the same descriptors as the identical-weights build (the
    parity suite covers numerics; this pins the CLI plumbing)."""
    import torch

    from tests.parity.torch_models import BasicBlock, TruncatedResNet
    tm = TruncatedResNet(layers=(2, 2, 2, 2), block=BasicBlock)
    pth = str(tmp_path / "resnet18_random.pth")
    torch.save(tm.state_dict(), pth)

    cfg_path = _scaled_preset(tmp_path, "oxford5k_resnet50_avgpool",
                              backbone="resnet18")
    res = _run_evaluate(capsys, ["--config", cfg_path,
                                 "--dataset", "mini",
                                 "--data-root", mini_root,
                                 "--weights", pth])
    assert np.isfinite(res["mAP"]) and 0 <= res["mAP"] <= 100


def test_anchor_attached_for_matching_dataset(tmp_path, mini_root, capsys,
                                              monkeypatch):
    """When dataset+config matches an anchor, evaluate prints the
    measured-vs-anchor block — proven by aliasing the anchor's dataset
    name onto the fixture (the real-data run differs only in data)."""
    from instsearch_tpu.eval import datasets as ds_mod
    real_load = ds_mod.load_dataset

    def fake_load(name, data_root):
        if name == "oxford5k":
            d = real_load("mini", data_root)
            return d.__class__(name="oxford5k", image_root=d.image_root,
                               imlist=d.imlist, qimlist=d.qimlist, gnd=d.gnd)
        return real_load(name, data_root)

    monkeypatch.setattr(ds_mod, "load_dataset", fake_load)
    cfg_path = _scaled_preset(tmp_path, "oxford5k_resnet50_avgpool")
    res = _run_evaluate(capsys, ["--config", cfg_path,
                                 "--data-root", mini_root,
                                 "--protocol", "classic"])
    assert "anchor" in res, res
    assert res["anchor"]["anchor_map_pct"] == 47.0
    assert res["anchor"]["measured_map_pct"] == round(res["mAP"], 2)
    assert "delta_vs_anchor_pct" in res["anchor"]
