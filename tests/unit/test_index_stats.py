"""Index.stats() / cli info: operator introspection snapshot."""
import json

import numpy as np

from instsearch_tpu import (ExtractConfig, IndexConfig, PipelineConfig,
                            SearchConfig)
from instsearch_tpu.index import Index


def _build(rng, n=256, d=32, dtype="float32"):
    X = rng.standard_normal((n, d)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    cfg = PipelineConfig(extract=ExtractConfig(dtype="float32"),
                         index=IndexConfig(dtype=dtype, row_tile=8),
                         search=SearchConfig(k=5, use_pallas=False))
    return Index.from_descriptors(X, [f"im{i}" for i in range(n)], cfg)


def test_stats_plain(rng):
    idx = _build(rng)
    s = idx.stats()
    assert s["rows"] == 256 and s["dim"] == 32
    assert s["dtype"] == "float32" and not s["has_extractor"]
    assert s["bytes"]["descriptors"] == idx.descriptors.shape[0] * 32 * 4
    assert s["bytes"]["total"] >= s["bytes"]["descriptors"]
    assert "ivf" not in s and "pq" not in s
    json.dumps(s)                              # JSON-serializable


def test_stats_views_and_quantized(rng):
    idx = _build(rng, dtype="int8")
    idx.build_ivf(n_clusters=4, nprobe=2)
    idx.fit_local_whitening(n_clusters=4, seed=0)
    s = idx.stats()
    assert s["dtype"] == "int8" and s["bytes"]["scales"] > 0
    assert s["ivf"]["n_clusters"] == 4 and s["ivf"]["nprobe"] == 2
    assert 0 < s["ivf"]["scan_fraction"] <= 1
    assert s["lw"]["n_clusters"] == 4
    assert s["bytes"]["ivf"] > 0 and s["bytes"]["lw"] > 0
    json.dumps(s)


def test_stats_pq_and_remove_bumps_gen(rng):
    idx = _build(rng)
    idx.build_pq(m=8, sample=None)
    s = idx.stats()
    assert s["pq"]["m"] == 8 and s["pq"]["bytes_per_row"] == 4
    g0 = s["layout_gen"]
    idx.remove(["im0"])
    assert idx.stats()["layout_gen"] > g0
    assert idx.stats()["rows"] == 255


def test_cli_info(rng, tmp_path, capsys):
    from instsearch_tpu.cli import main
    idx = _build(rng)
    idx_dir = str(tmp_path / "idx")
    idx.save(idx_dir)
    assert main(["info", "--index", idx_dir]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 256 and out["dim"] == 32
