"""utils/chunking.run_chunked: the ONE query-chunk policy shared by Index
and ShardedIndex."""
import jax.numpy as jnp
import numpy as np

from instsearch_tpu.utils.chunking import run_chunked


def _run(q):
    # shape-sensitive fake op: returns (sum-per-row, row-count-tagged ids)
    return jnp.sum(q, axis=1), jnp.arange(q.shape[0])


def test_single_pass_when_small():
    calls = []

    def run(q):
        calls.append(q.shape[0])
        return _run(q)

    q = jnp.ones((5, 3))
    s, i = run_chunked(run, 8, q)
    assert calls == [5]                       # no padding, one pass
    assert s.shape == (5,)


def test_chunked_matches_single_pass():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((11, 4)).astype(np.float32))
    s1, _ = run_chunked(_run, 0, q)           # chunk=0 -> unchunked
    s2, _ = run_chunked(_run, 4, q)           # 4+4+3 (padded)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    assert s2.shape == (11,)


def test_exact_multiple_no_padding():
    shapes = []

    def run(q):
        shapes.append(q.shape[0])
        return _run(q)

    q = jnp.ones((8, 2))
    run_chunked(run, 4, q)
    assert shapes == [4, 4]


def test_lockstep_multiple_operands():
    q = jnp.ones((6, 2))
    r = jnp.full((6, 3, 2), 2.0)

    def run(qq, rr):
        assert qq.shape[0] == rr.shape[0]
        return jnp.sum(qq, axis=1) + jnp.sum(rr, axis=(1, 2))

    out = run_chunked(run, 4, q, r)
    np.testing.assert_allclose(np.asarray(out), np.full(6, 2.0 + 12.0))


def test_empty_batch():
    q = jnp.zeros((0, 3))
    s, i = run_chunked(_run, 4, q)
    assert s.shape == (0,)
