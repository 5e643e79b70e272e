"""Fused ViT attention kernel vs jnp oracle (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.kernels.vit_attention import (flash_mha, mha,
                                                  mha_reference)


def _mk(rng, shape, dtype):
    q, k, v = (rng.standard_normal(shape).astype(np.float32) for _ in range(3))
    return (jnp.asarray(q, dtype), jnp.asarray(k, dtype), jnp.asarray(v, dtype))


@pytest.mark.parametrize("n", [197, 128, 5])
def test_matches_reference_f32(rng, n):
    q, k, v = _mk(rng, (2, 3, n, 64), jnp.float32)
    out = mha(q, k, v, interpret=True)
    ref = mha_reference(q, k, v)
    assert out.shape == (2, 3, n, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_matches_reference_bf16(rng):
    q, k, v = _mk(rng, (2, 2, 197, 64), jnp.bfloat16)
    out = np.asarray(mha(q, k, v, interpret=True), np.float32)
    ref = np.asarray(mha_reference(q, k, v), np.float32)
    # bf16 inputs, f32 logits/softmax in both paths
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)


def test_padded_keys_never_attend(rng):
    # two runs that differ only in rows past N must agree exactly after the
    # caller's slice: padding is masked inside the kernel, not ignored by luck
    q, k, v = _mk(rng, (1, 1, 130, 64), jnp.float32)
    out = mha(q, k, v, interpret=True)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_softmax_rows_sum_preserved(rng):
    # with v = all-ones, attention output must be exactly ones regardless of
    # padding (softmax rows sum to 1 over VALID keys only)
    q, k, _ = _mk(rng, (1, 2, 197, 64), jnp.float32)
    v = jnp.ones((1, 2, 197, 64), jnp.float32)
    out = np.asarray(mha(q, k, v, interpret=True))
    np.testing.assert_allclose(out, np.ones_like(out), rtol=1e-6, atol=1e-6)


def test_shape_mismatch_rejected(rng):
    q, k, v = _mk(rng, (1, 1, 8, 64), jnp.float32)
    with pytest.raises(ValueError):
        mha(q, k[:, :, :4], v, interpret=True)


@pytest.mark.parametrize("n", [197, 300, 1025])
def test_flash_matches_reference_f32(rng, n):
    # n straddles the q/kv block sizes: sub-block (197), between kv and q
    # blocks (300), and multi-block with a ragged tail (1025) — the online
    # rescale and the padded-KV mask both cross block boundaries
    q, k, v = _mk(rng, (2, 3, n, 64), jnp.float32)
    out = flash_mha(q, k, v, interpret=True)
    ref = mha_reference(q, k, v)
    assert out.shape == (2, 3, n, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_flash_matches_reference_bf16(rng):
    q, k, v = _mk(rng, (2, 2, 1025, 64), jnp.bfloat16)
    out = np.asarray(flash_mha(q, k, v, interpret=True), np.float32)
    ref = np.asarray(mha_reference(q, k, v), np.float32)
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)


def test_flash_softmax_rows_sum_preserved(rng):
    # v = ones -> output must be exactly ones: the online-softmax l
    # accumulator counts VALID keys only, across every kv block
    q, k, _ = _mk(rng, (1, 2, 300, 64), jnp.float32)
    v = jnp.ones((1, 2, 300, 64), jnp.float32)
    out = np.asarray(flash_mha(q, k, v, interpret=True))
    np.testing.assert_allclose(out, np.ones_like(out), rtol=1e-6, atol=1e-6)


def test_flash_shape_mismatch_rejected(rng):
    q, k, v = _mk(rng, (1, 1, 8, 64), jnp.float32)
    with pytest.raises(ValueError):
        flash_mha(q, k[:, :, :4], v, interpret=True)


def test_vit_module_flash_matches_xla(rng):
    # attention='flash' through the full encoder (interpret on CPU)
    import jax
    from instsearch_tpu.models.vit import ViT

    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    kw = dict(hidden_dim=32, num_layers=2, num_heads=4, mlp_dim=64,
              patch_size=4, image_size=16, dtype=jnp.float32)
    m_x = ViT(attention="xla", **kw)
    m_f = ViT(attention="flash", **kw)
    variables = m_x.init(jax.random.PRNGKey(0), x)
    out_x = np.asarray(m_x.apply(variables, jnp.asarray(x)))
    out_f = np.asarray(m_f.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out_f, out_x, rtol=2e-5, atol=2e-5)


def test_vit_module_pallas_matches_xla(rng):
    # the full encoder with attention='pallas' (interpret) vs 'xla': wiring
    # through EncoderBlock, head reshapes and scale handling all agree
    import jax
    from instsearch_tpu.models.vit import ViT

    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    kw = dict(hidden_dim=32, num_layers=2, num_heads=4, mlp_dim=64,
              patch_size=4, image_size=16, dtype=jnp.float32)
    m_x = ViT(attention="xla", **kw)
    m_p = ViT(attention="pallas", **kw)
    variables = m_x.init(jax.random.PRNGKey(0), x)
    out_x = np.asarray(m_x.apply(variables, jnp.asarray(x)))
    out_p = np.asarray(m_p.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out_p, out_x, rtol=2e-5, atol=2e-5)


def test_vit_module_rejects_bad_attention(rng):
    import jax
    from instsearch_tpu.models.vit import ViT

    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    m = ViT(hidden_dim=32, num_layers=1, num_heads=4, mlp_dim=64,
            patch_size=4, image_size=16, dtype=jnp.float32,
            attention="cuda")
    with pytest.raises(ValueError, match="auto|xla|pallas"):
        m.init(jax.random.PRNGKey(0), x)
