"""Seeded fuzz: ShardedIndex.search vs the host oracle across random
(rows, dim, shards, k, num_valid-padding, int8) combinations.

Complements the targeted distributed tests: random shard/row/k geometry
catches gather-width and per-shard-clamp edge interactions nobody wrote a
named test for. Seeds fixed — failures reproduce exactly.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.parallel import ShardedIndex, make_mesh


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_sharded_search_matches_oracle(seed):
    rng = np.random.default_rng(3000 + seed)
    shards = int(rng.choice([1, 2, 4, 8]))
    rows_per = int(rng.integers(2, 40))
    n = shards * rows_per
    d = int(rng.choice([16, 64]))
    q_n = int(rng.integers(1, 6))
    k = int(rng.integers(1, 13))          # may exceed rows-per-shard AND n
    n_pad_tail = int(rng.integers(0, rows_per))   # padding rows (id -1)
    int8 = bool(rng.integers(0, 2))

    X = rng.standard_normal((n, d)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    ids = np.arange(n, dtype=np.int32)
    if n_pad_tail:
        ids[-n_pad_tail:] = -1
    Q = rng.standard_normal((q_n, d)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)

    mesh = make_mesh(shards)
    if int8:
        from instsearch_tpu.ops.quantize import quantize_rows
        qr = quantize_rows(jnp.asarray(X))
        sidx = ShardedIndex(qr.values, jnp.asarray(ids), mesh=mesh,
                            scales=qr.scales)
        Xeff = np.asarray(qr.values, np.float32) * \
            np.asarray(qr.scales).reshape(-1, 1)
    else:
        sidx = ShardedIndex(jnp.asarray(X), jnp.asarray(ids), mesh=mesh)
        Xeff = X
    s, gids = sidx.search(jnp.asarray(Q), k=k)
    s, gids = np.asarray(s), np.asarray(gids)

    scores = Q @ Xeff.T
    scores[:, ids < 0] = -np.inf
    order = np.lexsort((np.arange(n)[None, :].repeat(q_n, 0), -scores),
                       axis=1)[:, :k] if k <= n else None
    ctx = f"seed={seed} shards={shards} n={n} k={k} pad={n_pad_tail} int8={int8}"
    n_valid = n - n_pad_tail
    for qi in range(q_n):
        m = min(k, n_valid)
        exp = np.argsort(-scores[qi], kind="stable")[:m]
        # valid slots match the oracle set with oracle scores
        np.testing.assert_allclose(
            s[qi, :m], np.sort(scores[qi][exp])[::-1], rtol=2e-4,
            atol=1e-5, err_msg=ctx)
        assert set(gids[qi, :m]) == set(ids[exp]), ctx
        # overflow slots are empty
        assert (gids[qi, m:] == -1).all(), ctx
        assert (s[qi, m:] == -np.inf).all(), ctx
