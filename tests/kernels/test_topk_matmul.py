"""Pallas topk_matmul vs lax.top_k oracle (SURVEY.md §4.3).

CPU backend -> interpret mode; on real TPU the same tests compile via
Mosaic (exercised in the verify drives / bench).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.kernels import default_tile_n, topk_matmul

INTERP = dict(interpret=True)  # CPU test backend


def _oracle(X, Q, k):
    scores = (Q.astype(np.float32) @ X.astype(np.float32).T)
    s, i = jax.lax.top_k(jnp.asarray(scores), k)
    return np.asarray(s), np.asarray(i)


@pytest.mark.parametrize("n,d,b,k,tile", [
    (256, 64, 1, 10, 64),
    (512, 128, 4, 10, 128),
    (1024, 128, 3, 1, 256),      # k=1
    (128, 256, 2, 128, 128),     # k == tile_n
    (264, 128, 2, 5, 8),         # N multiple of 8 only
])
def test_matches_oracle(rng, n, d, b, k, tile):
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((b, d)).astype(np.float32)
    s, i = topk_matmul(jnp.asarray(X), jnp.asarray(Q), k=k, tile_n=tile, **INTERP)
    ws, wi = _oracle(X, Q, k)
    np.testing.assert_array_equal(np.asarray(i), wi)
    # f32 accumulation order differs between the kernel and the oracle
    np.testing.assert_allclose(np.asarray(s), ws, rtol=1e-4, atol=1e-4)


def test_ties_lowest_id_first(rng):
    # duplicate rows -> equal scores; both kernel and lax.top_k must order
    # ties by ascending id
    base = rng.standard_normal((8, 64)).astype(np.float32)
    X = np.concatenate([base] * 8)          # every row duplicated 8x
    Q = rng.standard_normal((2, 64)).astype(np.float32)
    s, i = topk_matmul(jnp.asarray(X), jnp.asarray(Q), k=16, tile_n=16, **INTERP)
    ws, wi = _oracle(X, Q, 16)
    np.testing.assert_allclose(np.asarray(s), ws, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), wi)


def test_num_valid_masks_padding(rng):
    X = rng.standard_normal((256, 64)).astype(np.float32)
    X[200:] = 100.0   # poison padding region: must never be returned
    Q = rng.standard_normal((2, 64)).astype(np.float32)
    s, i = topk_matmul(jnp.asarray(X), jnp.asarray(Q), k=10, num_valid=200,
                       tile_n=64, **INTERP)
    assert np.asarray(i).max() < 200
    ws, wi = _oracle(X[:200], Q, 10)
    np.testing.assert_array_equal(np.asarray(i), wi)


def test_fewer_valid_than_k(rng):
    X = rng.standard_normal((64, 32)).astype(np.float32)
    Q = rng.standard_normal((1, 32)).astype(np.float32)
    s, i = topk_matmul(jnp.asarray(X), jnp.asarray(Q), k=10, num_valid=4,
                       tile_n=32, **INTERP)
    i = np.asarray(i)[0]
    assert set(i[:4]) == {0, 1, 2, 3}
    assert (i[4:] == -1).all()
    assert (np.asarray(s)[0][4:] == -np.inf).all()


def test_rejects_bad_shapes(rng):
    X = jnp.asarray(rng.standard_normal((100, 32)).astype(np.float32))
    Q = jnp.asarray(rng.standard_normal((1, 32)).astype(np.float32))
    with pytest.raises(ValueError):
        topk_matmul(X, Q, k=10, tile_n=64, **INTERP)   # 100 % 64 != 0
    with pytest.raises(ValueError):
        topk_matmul(X[:64], Q, k=128, tile_n=64, **INTERP)  # k > tile


def test_default_tile_n():
    import jax.numpy as jnp
    assert default_tile_n(1_048_576, 512) == 2048
    assert default_tile_n(1_048_576, 2048) == 512    # 6 MB VMEM cap
    assert default_tile_n(1_048_576, 512, jnp.int8) == 4096  # int8: half bytes
    assert default_tile_n(264, 128) == 8
    with pytest.raises(ValueError):
        default_tile_n(999, 128)   # not a multiple of 8


def test_default_tile_n_int8_scales_lowering():
    """int8/int4 kernels stream a [1, N] scales operand in (1, tile)
    blocks; the Mosaic lowering needs tile % 128 == 0 or tile == N, so
    scaled dtypes must never get a small partial tile (found by running
    a 56-row int8 index on the real chip: tile 8 failed to lower)."""
    import jax.numpy as jnp
    # tiny index -> one full-width block
    assert default_tile_n(56, 512, jnp.int8) == 56
    # 2056 = 8 * 257: no 128-multiple divides it -> full-width block
    assert default_tile_n(2056, 512, jnp.int8) == 2056
    # large indexes keep their 128-multiple tiles
    assert default_tile_n(1_048_576, 512, jnp.int8, b=128) % 128 == 0
    # int4 halving stops at 128 (never returns an unlowerable tile)
    from instsearch_tpu.kernels.topk_matmul import default_tile_n_int4
    t4 = default_tile_n_int4(1_048_576, 256, b=512)
    assert t4 % 128 == 0 or t4 == 1_048_576
    assert default_tile_n_int4(56, 256) == 56
    # bf16 has no scales operand: small tiles stay legal (unchanged)
    assert default_tile_n(56, 512) == 8


def test_int8_tiny_index_full_width_tile(rng):
    """End-to-end kernel at the full-width-block tile (tile == N)."""
    from instsearch_tpu.kernels import topk_matmul_int8
    from instsearch_tpu.ops.quantize import quantize_rows
    X = rng.standard_normal((56, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    qr = quantize_rows(jnp.asarray(X))
    q = jnp.asarray(X[:3])
    s, i = topk_matmul_int8(qr.values, qr.scales, q, k=5, **INTERP)
    assert (np.asarray(i)[:, 0] == np.arange(3)).all()


def test_bf16_index(rng):
    X = rng.standard_normal((512, 128)).astype(np.float32)
    Q = rng.standard_normal((2, 128)).astype(np.float32)
    Xb = jnp.asarray(X, jnp.bfloat16)
    s, i = topk_matmul(Xb, jnp.asarray(Q), k=5, tile_n=128, **INTERP)
    # oracle in the same precision
    sw, iw = jax.lax.top_k(
        jnp.dot(jnp.asarray(Q, jnp.bfloat16), Xb.T,
                preferred_element_type=jnp.float32), 5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(iw))


def test_num_valid_zero_returns_empty(rng):
    """A fully-padded index (num_valid=0): every tile is empty, the
    tile-skip condition must be NaN-free, and the kernel returns the
    initialized (-inf, -1) top-k untouched."""
    X = rng.standard_normal((128, 64)).astype(np.float32)
    Q = rng.standard_normal((3, 64)).astype(np.float32)
    s, i = topk_matmul(jnp.asarray(X), jnp.asarray(Q), k=5, num_valid=0,
                       tile_n=64, interpret=True)
    assert (np.asarray(i) == -1).all()
    assert np.isneginf(np.asarray(s)).all()


def test_num_valid_zero_int8(rng):
    from instsearch_tpu.kernels import topk_matmul_int8
    from instsearch_tpu.ops.quantize import quantize_rows
    X = rng.standard_normal((128, 64)).astype(np.float32)
    qr = quantize_rows(jnp.asarray(X))
    Q = rng.standard_normal((3, 64)).astype(np.float32)
    s, i = topk_matmul_int8(qr.values, qr.scales, jnp.asarray(Q), k=5,
                            num_valid=0, tile_n=64, interpret=True)
    assert (np.asarray(i) == -1).all()
    assert np.isneginf(np.asarray(s)).all()


def test_fully_padded_shard(rng):
    """Sharded search where 7 of 8 shards hold only padding rows: the
    empty shards contribute (-inf, -1) candidates that must never win."""
    from instsearch_tpu.parallel import ShardedIndex, make_mesh
    X = rng.standard_normal((512, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    ids = np.full((512,), -1, np.int32)
    ids[:40] = np.arange(40)              # only shard 0 has valid rows
    sidx = ShardedIndex(jnp.asarray(X), jnp.asarray(ids), mesh=make_mesh(8),
                        use_pallas=True, interpret=True)
    s, i = sidx.search(jnp.asarray(X[:2]), k=5)
    assert (np.asarray(i)[:, 0] == np.arange(2)).all()
    assert np.asarray(i).max() < 40


def test_default_tile_n_scales_with_query_batch():
    """Large query batches shrink the tile so the [B, T] merge temporaries
    fit VMEM (B=256 at tile 4096 was a 17 MB scoped-vmem compile OOM)."""
    import jax.numpy as jnp
    assert default_tile_n(1_048_576, 512, jnp.int8, b=1) == 4096
    assert default_tile_n(1_048_576, 512, jnp.int8, b=256) == 2048
    assert default_tile_n(1_048_576, 512, jnp.bfloat16, b=256) == 2048
    assert default_tile_n(1_048_576, 512, jnp.bfloat16, b=1024) == 512


def test_multi_candidate_tiles(rng):
    """Force the 2-4-candidate extraction path and the >4 full-merge path:
    tiles packed with clustered high-score rows must still match the
    oracle exactly."""
    q = rng.standard_normal((3, 64)).astype(np.float32)
    X = rng.standard_normal((512, 64)).astype(np.float32) * 0.01
    # tile 3 (rows 192-255): 3 rows highly similar to query 0 -> cmax==3
    X[200:203] = q[0] * 0.9 + rng.standard_normal((3, 64)) * 0.01
    # tile 5 (rows 320-383): 8 rows similar to query 1 -> cmax==8 (> 4)
    X[330:338] = q[1] * 0.9 + rng.standard_normal((8, 64)) * 0.01
    # tile 6: 2 candidates for two different queries at once
    X[400:402] = q[2] * 0.8 + rng.standard_normal((2, 64)) * 0.01
    X[402:404] = q[0] * 0.7 + rng.standard_normal((2, 64)) * 0.01
    s, i = topk_matmul(jnp.asarray(X), jnp.asarray(q), k=10, tile_n=64,
                       **INTERP)
    ws, wi = _oracle(X, q, 10)
    np.testing.assert_array_equal(np.asarray(i), wi)
    np.testing.assert_allclose(np.asarray(s), ws, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ascending", [False, True])
def test_mid_tier_large_k(rng, ascending):
    """k > 16 enables the 16-candidate extraction tier (review r3: the
    k=100 rerank depth made the dense k-round fallback dominate batched
    scans). Random data walks tiles through cmax 5..16 after the first
    dense tile; the ascending variant keeps EVERY tile improving (the
    adversarial worst case, constant merging through all tiers)."""
    n, d, b, k, tile = 512, 64, 8, 24, 128
    X = rng.standard_normal((n, d)).astype(np.float32)
    if ascending:
        Q0 = rng.standard_normal((1, d)).astype(np.float32)
        order = np.argsort((X @ Q0.T)[:, 0])        # worst-case row order
        X = X[order]
    Q = rng.standard_normal((b, d)).astype(np.float32)
    s, i = topk_matmul(jnp.asarray(X), jnp.asarray(Q), k=k, tile_n=tile,
                       **INTERP)
    ws, wi = _oracle(X, Q, k)
    np.testing.assert_array_equal(np.asarray(i), wi)
    np.testing.assert_allclose(np.asarray(s), ws, rtol=1e-4, atol=1e-4)


def test_mid_tier_large_k_int8(rng):
    from instsearch_tpu.kernels import topk_matmul_int8
    from instsearch_tpu.ops.quantize import quantize_rows
    n, d, b, k, tile = 512, 64, 8, 24, 128
    X = rng.standard_normal((n, d)).astype(np.float32)
    qr = quantize_rows(jnp.asarray(X))
    Q = rng.standard_normal((b, d)).astype(np.float32)
    s, i = topk_matmul_int8(qr.values, qr.scales, jnp.asarray(Q), k=k,
                            tile_n=tile, **INTERP)
    # oracle over the DEQUANTIZED matrix (same values the kernel scores)
    Xdq = np.asarray(qr.values, np.float32) * np.asarray(qr.scales)[0][:, None]
    from instsearch_tpu.ops.quantize import quantize_rows as qrows
    qq = qrows(jnp.asarray(Q))
    Qdq = np.asarray(qq.values, np.float32) * np.asarray(qq.scales)[0][:, None]
    ws, wi = _oracle(Xdq, Qdq, k)
    np.testing.assert_array_equal(np.asarray(i), wi)
