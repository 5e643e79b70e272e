"""Seeded fuzz: the fused top-k kernel vs the XLA oracle over random
(N, D, B, k, tile_n, num_valid) combinations, interpret mode.

The targeted tests in test_topk_matmul.py cover known edges (ties,
remainders, empty shards); this sweep guards the combinations nobody
thought to write down. Seeds are fixed — failures reproduce exactly.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.kernels import topk_matmul, topk_matmul_int8
from instsearch_tpu.ops.quantize import quantize_rows


def _oracle(X, Q, k, num_valid):
    scores = (Q.astype(np.float32) @ X.astype(np.float32).T)
    scores[:, num_valid:] = -np.inf
    # top-k desc, ties -> lowest id first (kernel contract)
    order = np.lexsort((np.arange(X.shape[0])[None, :].repeat(len(Q), 0),
                        -scores), axis=1)[:, :k]
    s = np.take_along_axis(scores, order, axis=1)
    ids = np.where(s > -np.inf, order, -1)
    return s, ids


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_bf16_matches_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    tile = int(rng.choice([64, 128, 256]))
    n = tile * int(rng.integers(1, 6))
    d = int(rng.choice([32, 128, 512]))
    b = int(rng.integers(1, 9))
    k = int(rng.integers(1, min(17, tile + 1)))
    nv = int(rng.integers(0, n + 1))
    # quantized-lattice values: bf16 rounding cannot reorder near-ties
    X = (rng.integers(-8, 9, (n, d)) / 8.0).astype(np.float32)
    Q = (rng.integers(-8, 9, (b, d)) / 8.0).astype(np.float32)
    s, ids = topk_matmul(jnp.asarray(X, jnp.bfloat16),
                         jnp.asarray(Q, jnp.bfloat16), k=k, num_valid=nv,
                         tile_n=tile, interpret=True)
    es, eids = _oracle(X, Q, k, nv)
    np.testing.assert_array_equal(
        np.asarray(ids), eids,
        err_msg=f"seed={seed} n={n} d={d} b={b} k={k} tile={tile} nv={nv}")
    np.testing.assert_allclose(np.asarray(s), es, rtol=2e-2, atol=1e-6)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_int8_matches_dequant_oracle(seed):
    rng = np.random.default_rng(2000 + seed)
    tile = int(rng.choice([64, 128]))
    n = tile * int(rng.integers(1, 5))
    d = int(rng.choice([64, 256]))
    b = int(rng.integers(1, 5))
    k = int(rng.integers(1, 11))
    nv = int(rng.integers(0, n + 1))
    X = rng.standard_normal((n, d)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Q = rng.standard_normal((b, d)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    qr = quantize_rows(jnp.asarray(X))
    s, ids = topk_matmul_int8(qr.values, qr.scales, jnp.asarray(Q), k=k,
                              num_valid=nv, tile_n=tile, interpret=True)
    # oracle over the kernel's OWN quantized arithmetic (its exact input)
    Xq = np.asarray(qr.values, np.float32) * np.asarray(qr.scales).reshape(-1, 1)
    es, eids = _oracle(Xq, Q, k, nv)
    # int8 query quantization perturbs scores ~1e-2; ids may legitimately
    # swap only where dequant scores are within that noise
    s_np = np.asarray(s)
    match = np.asarray(ids) == eids
    if not match.all():
        gap = np.abs(s_np - es)
        assert (gap[~match] < 5e-2).all(), (
            f"seed={seed}: id mismatch with large score gap\n"
            f"{np.asarray(ids)}\n{eids}\n{gap}")
    np.testing.assert_allclose(s_np, es, rtol=0.05, atol=5e-2)
