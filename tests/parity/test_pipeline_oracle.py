"""Full-pipeline cross-implementation oracle (SURVEY.md §7 hard part 3).

The jax stack (frontend -> backbone -> pooling -> multi-scale -> whitening
-> ranking -> mAP) is checked end-to-end against tests/parity/torch_pipeline
— an independent NCHW torch/numpy implementation built from the published
algorithms. A transpose, grid off-by-one, or protocol bug anywhere in the
pipeline breaks these tests.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.config import ExtractConfig
from instsearch_tpu.data import frontend
from instsearch_tpu.eval import make_mini_dataset
from instsearch_tpu.eval.revisited import evaluate_ranks, compute_ap
from instsearch_tpu.extractor import build_extract_fn
from instsearch_tpu.models import load_torch_resnet
from instsearch_tpu.ops.whitening import (apply_whitening, fit_whitening,
                                          WhiteningParams)

from . import torch_pipeline as tp
from .torch_models import BasicBlock, TruncatedResNet, randomize_bn_stats

SIZE = 64


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    ds = make_mini_dataset(str(tmp_path_factory.mktemp("oracle")), seed=9,
                           size=SIZE)
    db = np.stack([frontend.load_square(p, SIZE) for p in ds.db_paths])
    qs = np.stack([frontend.load_square(p, SIZE) for p in ds.query_paths])
    tm = randomize_bn_stats(TruncatedResNet(layers=(2, 2, 2, 2),
                                            block=BasicBlock))
    variables = load_torch_resnet(tm.state_dict())
    return ds, db, qs, tm, variables


def _jax_extract(variables, imgs, **cfg_kw):
    cfg = ExtractConfig(backbone="resnet18", image_size=SIZE,
                        dtype="float32", **cfg_kw)
    _, fn = build_extract_fn(cfg)
    return np.asarray(jax.jit(fn)(variables, jnp.asarray(imgs)))


def _cos(a, b):
    return np.sum(a * b, axis=-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))


@pytest.mark.parametrize("pooling", ["gem", "rmac", "mac", "avg"])
def test_descriptor_parity_single_scale(rig, pooling):
    ds, db, qs, tm, variables = rig
    d_jax = _jax_extract(variables, db[:8], pooling=pooling)
    d_t = tp.extract_t(tm, db[:8], pooling=pooling)
    assert d_jax.shape == d_t.shape
    cos = _cos(d_jax, d_t)
    assert cos.min() > 0.9999, (pooling, cos)


def test_descriptor_parity_multiscale(rig):
    """Multi-scale averages per-scale descriptors; resize kernels differ
    slightly between jax.image.resize and torch antialiased interpolate,
    so the bar is cosine, not bitwise."""
    ds, db, qs, tm, variables = rig
    scales = (1.0, 0.7071067811865476)
    d_jax = _jax_extract(variables, db[:8], pooling="gem", scales=scales)
    d_t = tp.extract_t(tm, db[:8], pooling="gem", scales=scales)
    cos = _cos(d_jax, d_t)
    assert cos.min() > 0.999, cos


def test_rmac_grid_cross_check():
    """The two independently-written grid generators must agree exactly."""
    from instsearch_tpu.ops.pooling import rmac_region_grid
    for (h, w) in [(4, 4), (7, 7), (4, 7), (9, 5), (3, 8), (13, 13)]:
        assert rmac_region_grid(h, w, 3) == tp.rmac_grid_t(h, w, 3), (h, w)


def test_whitening_scores_parity(rig):
    """jax eigh-whitening vs numpy SVD-whitening: whitened spaces may
    differ by per-axis sign, but all inner products (the thing retrieval
    consumes) must match."""
    ds, db, qs, tm, variables = rig
    d_db = _jax_extract(variables, db, pooling="gem")
    d_q = _jax_extract(variables, qs, pooling="gem")
    wp = fit_whitening(jnp.asarray(d_db))
    j_db = np.asarray(apply_whitening(jnp.asarray(d_db), wp))
    j_q = np.asarray(apply_whitening(jnp.asarray(d_q), wp))
    P, mu = tp.fit_whitening_np(d_db)
    t_db = tp.apply_whitening_np(d_db, P, mu)
    t_q = tp.apply_whitening_np(d_q, P, mu)
    np.testing.assert_allclose(j_q @ j_db.T, t_q @ t_db.T,
                               rtol=2e-2, atol=2e-3)


def test_end_to_end_map_parity(rig):
    """Both stacks, each with its own whitening fit, must produce the SAME
    mAP on the mini fixture — and the protocol math itself is cross-checked
    against an independent vectorized AP."""
    ds, db, qs, tm, variables = rig
    scales = (1.0, 0.7071067811865476)

    d_db = _jax_extract(variables, db, pooling="gem", scales=scales)
    d_q = _jax_extract(variables, qs, pooling="gem", scales=scales)
    wp = fit_whitening(jnp.asarray(d_db))
    ranks_jax = np.argsort(
        -(np.asarray(apply_whitening(jnp.asarray(d_q), wp))
          @ np.asarray(apply_whitening(jnp.asarray(d_db), wp)).T), axis=1)

    t_db = tp.extract_t(tm, db, pooling="gem", scales=scales)
    t_q = tp.extract_t(tm, qs, pooling="gem", scales=scales)
    P, mu = tp.fit_whitening_np(t_db)
    ranks_t = np.argsort(-(tp.apply_whitening_np(t_q, P, mu)
                           @ tp.apply_whitening_np(t_db, P, mu).T), axis=1)

    res_jax = evaluate_ranks(ranks_jax, ds.gnd, "medium")
    res_t = evaluate_ranks(ranks_t, ds.gnd, "medium")
    # 0.1 mAP point: float-noise near-ties may swap a rank between stacks
    # (reduction order differs); a real transpose/grid/protocol bug costs
    # tens of points
    assert res_jax["mAP"] == pytest.approx(res_t["mAP"], abs=0.1), \
        (res_jax["mAP"], res_t["mAP"])

    # protocol cross-check: compute_ap vs the independent vectorized AP
    for q, entry in enumerate(ds.gnd):
        pos = set(entry.get("easy", [])) | set(entry.get("hard", []))
        junk = set(entry.get("junk", []))
        ours = compute_ap(ranks_jax[q], pos, junk)
        theirs = tp.average_precision_np(ranks_jax[q], pos, junk)
        assert ours == pytest.approx(theirs, abs=1e-9)
