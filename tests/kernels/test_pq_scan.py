"""PQ-ADC scan kernel vs the decode-then-matmul oracle (interpret mode)."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.kernels.pq_scan import default_tile_n_pq, pq_topk
from instsearch_tpu.ops.pq import decode_pq, encode_pq, fit_pq


def _fixture(rng, n, d, m, b):
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    cb = fit_pq(jnp.asarray(x), m=m, iters=5)
    packed = encode_pq(jnp.asarray(x), cb)
    return packed, jnp.asarray(q), cb


def _oracle(packed, q, cb, k):
    xh = np.asarray(decode_pq(packed, cb))
    s = np.asarray(q) @ xh.T                     # [B, N]
    ids = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, ids, axis=1), ids


@pytest.mark.parametrize("variant", ["repeat", "matmul"])
@pytest.mark.parametrize("b", [1, 4])
def test_matches_oracle(rng, variant, b):
    packed, q, cb = _fixture(rng, 512, 64, 8, b)
    s, i = pq_topk(packed, q, cb, k=10, interpret=True, variant=variant)
    os_, oi = _oracle(packed, q, cb, 10)
    # ids must agree except where bf16 LUT rounding swaps near-ties;
    # scores agree to bf16 tolerance everywhere
    np.testing.assert_allclose(np.asarray(s), os_, rtol=2e-2, atol=2e-2)
    agree = (np.asarray(i) == oi).mean()
    assert agree > 0.9, f"id agreement {agree}"


def test_multi_tile_and_padding(rng):
    # several tiles + padding rows: ids >= num_valid must never surface
    packed, q, cb = _fixture(rng, 1024, 64, 8, 2)
    s, i = pq_topk(packed, q, cb, k=8, num_valid=200, tile_n=128,
                   interpret=True)
    assert int(np.asarray(i).max()) < 200
    os_, oi = _oracle(packed[:200], q, cb, 8)
    np.testing.assert_allclose(np.asarray(s), os_, rtol=2e-2, atol=2e-2)


def test_large_k_rerank_depth(rng):
    # k=100 exercises the rolled dense merge + 16-round extraction tier
    packed, q, cb = _fixture(rng, 512, 64, 8, 2)
    s, i = pq_topk(packed, q, cb, k=100, tile_n=256, interpret=True)
    os_, oi = _oracle(packed, q, cb, 100)
    np.testing.assert_allclose(np.asarray(s), os_, rtol=2e-2, atol=2e-2)


def test_scores_match_decoded_matmul_everywhere(rng):
    # full-depth check that the kernel's ADC == q @ decode.T for EVERY
    # returned row, not just that the ranking head agrees
    packed, q, cb = _fixture(rng, 256, 32, 4, 3)
    s, i = pq_topk(packed, q, cb, k=16, interpret=True)
    xh = np.asarray(decode_pq(packed, cb))
    full = np.asarray(q) @ xh.T
    got = np.asarray(s)
    want = np.take_along_axis(full, np.asarray(i), axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_validation_errors(rng):
    packed, q, cb = _fixture(rng, 128, 32, 4, 1)
    with pytest.raises(ValueError, match="variant"):
        pq_topk(packed, q, cb, k=4, interpret=True, variant="gather")
    with pytest.raises(ValueError, match="query dim"):
        pq_topk(packed, q[:, :16], cb, k=4, interpret=True)
    with pytest.raises(ValueError, match="not a multiple"):
        pq_topk(packed, q, cb, k=4, tile_n=96, interpret=True)


def test_default_tile_divides():
    assert 1_048_576 % default_tile_n_pq(1_048_576, 32, b=128, k=10) == 0
    assert default_tile_n_pq(256, 32) == 256 or 256 % default_tile_n_pq(
        256, 32) == 0


def test_tile_grows_to_cover_deep_cascades():
    # the merge folds per tile, so tile >= k; depth > 1024 (full-depth
    # exactness checks) must grow the tile, not fail
    assert default_tile_n_pq(4096, 8, b=4, k=4096) == 4096
    assert default_tile_n_pq(8192, 8, b=1, k=2048) == 2048
    with pytest.raises(ValueError, match="no valid PQ row tile"):
        # M=64 at tile 65536: the one-hot chain alone blows scoped VMEM
        default_tile_n_pq(1 << 20, 32, b=1, k=65536)


def test_full_depth_cascade_small(rng):
    # k == N end-to-end through the kernel: every row returned, exactly
    # the ADC ordering (the cascade's degenerate-to-exact contract)
    packed, q, cb = _fixture(rng, 128, 32, 4, 2)
    s, i = pq_topk(packed, q, cb, k=128, interpret=True)
    os_, oi = _oracle(packed, q, cb, 128)
    np.testing.assert_allclose(np.asarray(s), os_, rtol=2e-2, atol=2e-2)
