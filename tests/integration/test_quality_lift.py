"""The beyond-reference quality stages must actually LIFT retrieval
quality on manifold-structured data — not just run.

Synthetic manifold corpus: relevant sets are smooth 1-D chains (small
rotations of a seed), so a query at one end of its chain sees the far
end at LOW direct cosine — exactly the structure αQE, αDBA and
diffusion exploit (and random data does not have). mAP is computed with
the repo's own junk-aware AP over full rankings.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.config import IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.index import Index


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _chain(rng, d, length, spread):
    """A smooth manifold chain: rotations of a seed toward an orthogonal
    direction, angle 0..spread."""
    a = _unit(rng.standard_normal(d).astype(np.float32))
    b = rng.standard_normal(d).astype(np.float32)
    b = _unit(b - (b @ a) * a)
    ts = np.linspace(0.0, spread, length)
    return np.stack([np.cos(t) * a + np.sin(t) * b for t in ts]
                    ).astype(np.float32)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(17)
    # spread past pi/2: the chain's far half has NEGATIVE cosine to the
    # query, ranking BELOW random cross-chain distractors (~0 +- 0.2 at
    # d=32) — plain cosine provably cannot retrieve it, manifold methods
    # can (this is the arXiv:1611.05113 motivation in miniature)
    d, n_chains, length = 32, 12, 9
    chains = [_chain(rng, d, length, spread=2.3) for _ in range(n_chains)]
    X = np.concatenate(chains)                       # [108, d]
    # queries: one per chain, perturbed from the chain's FIRST element;
    # relevant set = the rest of that chain (the far end is the hard part)
    q = _unit(np.stack([c[0] for c in chains])
              + 0.05 * rng.standard_normal((n_chains, d)).astype(np.float32))
    gt = [set(range(i * length, (i + 1) * length)) for i in range(n_chains)]
    return X.astype(np.float32), q.astype(np.float32), gt


def _map_of(ranks, gt):
    """Mean AP over queries; ranks [Q, N] of row ids best-first."""
    aps = []
    for qi, rel in enumerate(gt):
        hits, ap = 0, 0.0
        for r, rid in enumerate(ranks[qi]):
            if int(rid) in rel:
                hits += 1
                ap += hits / (r + 1)
        aps.append(ap / len(rel))
    return float(np.mean(aps))


def _ranks_from_topk(ids):
    """Treat a [Q, k] top-k as a truncated ranking (missing rows count as
    never retrieved — AP contribution 0)."""
    return np.asarray(ids)


def test_dba_lifts_map(corpus):
    X, q, gt = corpus
    cfg = PipelineConfig(index=IndexConfig(row_tile=8),
                         search=SearchConfig(k=len(X), use_pallas=False))
    names = [f"i{i}" for i in range(len(X))]
    base = Index.from_descriptors(X, names, cfg)
    map_plain = _map_of(base.full_ranking(q), gt)
    aug = Index.from_descriptors(X, names, cfg)
    # flat (alpha=1, the CVPR'12 average-DBA) weighting, applied twice:
    # each round is one-hop neighborhood expansion, two rounds reach two
    # hops along the chain (sweep: n=7/a=1/x2 lifted 0.593 -> 0.681 here;
    # single-round alpha=3 moves rows too little to bridge the manifold)
    aug.augment_database(n=7, alpha=1.0)
    aug.augment_database(n=7, alpha=1.0)
    map_dba = _map_of(aug.full_ranking(q), gt)
    assert map_dba > map_plain + 0.05, (map_plain, map_dba)


def test_diffusion_lifts_map(corpus):
    X, q, gt = corpus
    names = [f"i{i}" for i in range(len(X))]
    k = 40                                   # deep enough to hold a chain
    plain_cfg = PipelineConfig(index=IndexConfig(row_tile=8),
                               search=SearchConfig(k=k, use_pallas=False))
    idx = Index.from_descriptors(X, names, plain_cfg)
    _, ids_plain = idx.search(q)
    diff_cfg = plain_cfg.replace(search=plain_cfg.search.replace(
        diffusion_enabled=True, diffusion_depth=64, diffusion_knn=4,
        diffusion_alpha=0.95, diffusion_seeds=3))
    idx2 = Index.from_descriptors(X, names, diff_cfg)
    _, ids_diff = idx2.search(q)
    map_plain = _map_of(_ranks_from_topk(ids_plain), gt)
    map_diff = _map_of(_ranks_from_topk(ids_diff), gt)
    assert map_diff > map_plain + 0.02, (map_plain, map_diff)


def test_qe_and_diffusion_compose_for_best_map(corpus):
    """QE + diffusion together should not be worse than plain ranking
    (the classic result: each stage adds recall on manifold data)."""
    X, q, gt = corpus
    names = [f"i{i}" for i in range(len(X))]
    k = 40
    plain_cfg = PipelineConfig(index=IndexConfig(row_tile=8),
                               search=SearchConfig(k=k, use_pallas=False))
    idx = Index.from_descriptors(X, names, plain_cfg)
    _, ids_plain = idx.search(q)
    both_cfg = plain_cfg.replace(search=plain_cfg.search.replace(
        qe_enabled=True, qe_n=3, diffusion_enabled=True,
        diffusion_depth=64, diffusion_knn=4, diffusion_alpha=0.95,
        diffusion_seeds=3))
    idx3 = Index.from_descriptors(X, names, both_cfg)
    _, ids_both = idx3.search(q)
    map_plain = _map_of(_ranks_from_topk(ids_plain), gt)
    map_both = _map_of(_ranks_from_topk(ids_both), gt)
    assert map_both > map_plain, (map_plain, map_both)
