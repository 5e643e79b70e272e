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
    assert len(presets) == 11, sorted(os.path.basename(p) for p in presets)
    for p in presets:
        cfg = PipelineConfig.load(p)
        assert isinstance(cfg.extract, ExtractConfig)
