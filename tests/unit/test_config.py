"""Config dataclasses: JSON round-trip, nested reconstruction, typo guard."""
import glob
import os

import pytest

from instsearch_tpu import ExtractConfig, PipelineConfig, SearchConfig
from instsearch_tpu.config import IndexConfig


def test_nested_from_dict_reconstructs_dataclasses():
    """`from __future__ import annotations` stringifies field types; the
    mixin must resolve them so sub-configs come back as dataclasses, not
    raw dicts (review r2 — attribute access used to crash)."""
    cfg = PipelineConfig.from_dict({"extract": {"backbone": "vgg16"},
                                    "search": {"k": 7}})
    assert isinstance(cfg.extract, ExtractConfig)
    assert cfg.extract.backbone == "vgg16"
    assert cfg.search.k == 7
    assert cfg.index == IndexConfig()          # defaulted


def test_round_trip_and_replace():
    cfg = PipelineConfig(
        extract=ExtractConfig(scales=(1.0, 0.5), whiten=True),
        search=SearchConfig(qe_enabled=True))
    rt = PipelineConfig.from_json(cfg.to_json())
    assert rt == cfg
    assert rt.extract.scales == (1.0, 0.5)     # list -> tuple on load
    assert rt.replace(search=rt.search.replace(k=3)).search.k == 3


def test_unknown_key_raises():
    """A typo'd preset field must error, not silently run the default."""
    with pytest.raises(ValueError, match="rerank_enable"):
        SearchConfig.from_dict({"rerank_enable": True})
    with pytest.raises(ValueError, match="unknown config key"):
        PipelineConfig.from_dict({"extractt": {}})


def test_all_committed_presets_load():
    preset_dir = os.path.join(os.path.dirname(__file__), "..", "..",
                              "configs")
    presets = glob.glob(os.path.join(preset_dir, "*.json"))
    # Assert on the list, not a magic count (VERDICT r4 item 2): a new
    # preset must be added HERE, and a vanished one fails loudly by name.
    expected = {
        "capacity_int4.json", "capacity_ivfpq.json", "compact128_int4.json",
        "local_whiten_rerank.json", "million_scale_int8.json",
        "oxford105k_sharded8.json", "oxford5k_resnet50_avgpool.json",
        "paris6k_vgg16_rmac_whiten.json", "quality_ladder.json",
        "rerank_regional_top100.json", "roxford_gem_multiscale_qe.json",
        "spatial_rerank_top100.json",
    }
    assert {os.path.basename(p) for p in presets} == expected
    for p in presets:
        cfg = PipelineConfig.load(p)
        assert isinstance(cfg.extract, ExtractConfig)
