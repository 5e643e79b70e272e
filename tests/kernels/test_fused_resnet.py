"""Fused ResNet stage kernel vs the Flax forward (interpret mode on CPU).

The fused path folds BatchNorm into conv weights and runs identity blocks
in one Pallas kernel; both transformations must preserve the forward's
numerics to bf16-appropriate tolerance at every image size (odd sizes
exercise the roll/mask geometry with non-tile-aligned H*W).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instsearch_tpu.kernels.fused_resnet import (
    fold_bn, fused_identity_blocks, fused_resnet_apply)
from instsearch_tpu.models.resnet import ResNet


def _small_resnet(stage_sizes=(2, 2, 2, 2)):
    model = ResNet(stage_sizes=stage_sizes, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 3), np.float32))
    return model, variables


def _randomize_bn(variables, seed=1):
    """Init leaves BN at scale=1/mean=0/var=1 which would make folding
    trivially correct; give every BN distinct stats so a folding bug
    cannot cancel."""
    rng = np.random.default_rng(seed)

    def visit(tree, is_stats):
        for k, v in tree.items():
            if isinstance(v, dict):
                if "mean" in v and is_stats:
                    v["mean"] = jnp.asarray(
                        rng.normal(0, 0.3, v["mean"].shape), jnp.float32)
                    v["var"] = jnp.asarray(
                        rng.uniform(0.5, 2.0, v["var"].shape), jnp.float32)
                elif "scale" in v and not is_stats:
                    v["scale"] = jnp.asarray(
                        rng.uniform(0.5, 1.5, v["scale"].shape), jnp.float32)
                    v["bias"] = jnp.asarray(
                        rng.normal(0, 0.2, v["bias"].shape), jnp.float32)
                else:
                    visit(v, is_stats)
    variables = jax.tree_util.tree_map(lambda a: a, variables)  # copy refs
    import flax
    variables = flax.core.unfreeze(variables) if hasattr(
        flax.core, "unfreeze") else variables
    visit(variables["params"], False)
    visit(variables["batch_stats"], True)
    return variables


def test_fold_bn_matches_bn_apply():
    import flax.linen as nn
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((1, 1, 8, 16)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 5, 5, 8)), jnp.float32)
    bn_p = {"scale": jnp.asarray(rng.uniform(0.5, 1.5, 16), jnp.float32),
            "bias": jnp.asarray(rng.normal(0, 1, 16), jnp.float32)}
    bn_s = {"mean": jnp.asarray(rng.normal(0, 1, 16), jnp.float32),
            "var": jnp.asarray(rng.uniform(0.5, 2, 16), jnp.float32)}
    y_ref = nn.BatchNorm(use_running_average=True, epsilon=1e-5).apply(
        {"params": bn_p, "batch_stats": bn_s},
        jax.lax.conv_general_dilated(
            x, k, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
    kf, bf = fold_bn(k, bn_p, bn_s)
    y = jax.lax.conv_general_dilated(
        x, kf, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bf
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("size", [64, 96])
def test_fused_apply_matches_flax(size):
    model, variables = _small_resnet()
    variables = _randomize_bn(variables)
    x = jnp.asarray(np.random.default_rng(2).random(
        (2, size, size, 3), np.float32) * 2 - 1)
    ref = np.asarray(model.apply(variables, x), np.float32)
    out = np.asarray(fused_resnet_apply(
        variables, x, stage_sizes=(2, 2, 2, 2),
        fused_layers=(1, 2, 3, 4), interpret=True), np.float32)
    assert out.shape == ref.shape
    # bf16 compute on both sides; folding reorders the per-channel scale
    c = np.sum(out * ref) / (np.linalg.norm(out) * np.linalg.norm(ref) + 1e-9)
    assert c > 0.999, c
    np.testing.assert_allclose(out, ref, rtol=0.1, atol=0.15)


def test_fused_apply_lax_path_matches_flax():
    """use_kernel=False (pure XLA folded path) must match too — it is the
    CPU fallback and the oracle that isolates kernel bugs from fold bugs."""
    model, variables = _small_resnet()
    variables = _randomize_bn(variables)
    x = jnp.asarray(np.random.default_rng(3).random(
        (2, 64, 64, 3), np.float32) * 2 - 1)
    ref = np.asarray(model.apply(variables, x), np.float32)
    out = np.asarray(fused_resnet_apply(
        variables, x, stage_sizes=(2, 2, 2, 2), use_kernel=False), np.float32)
    c = np.sum(out * ref) / (np.linalg.norm(out) * np.linalg.norm(ref) + 1e-9)
    assert c > 0.999, c


@pytest.mark.parametrize("odd_hw", [(7, 9), (5, 5)])
def test_identity_blocks_kernel_vs_lax(odd_hw):
    """The kernel alone vs conv math on odd H,W (mask/roll edge cases),
    including multi-block chaining."""
    H, W = odd_hw
    C, M, n, B = 32, 8, 2, 3
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.5, jnp.bfloat16)

    w1 = jnp.asarray(rng.standard_normal((n, C, M)) * 0.2, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((n, 1, M)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((n, 9, M, M)) * 0.2, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((n, 1, M)) * 0.1, jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((n, M, C)) * 0.2, jnp.bfloat16)
    b3 = jnp.asarray(rng.standard_normal((n, 1, C)) * 0.1, jnp.float32)

    out = fused_identity_blocks(
        x.reshape(B, H * W, C), w1, b1, w2, b2, w3, b3,
        H=H, W=W, interpret=True).reshape(B, H, W, C)

    # reference: same math with lax convs
    h = x
    for i in range(n):
        y = jax.lax.conv_general_dilated(
            h, w1[i].reshape(1, 1, C, M).astype(jnp.bfloat16),
            (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y + b1[i, 0], 0.0).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            y, w2[i].reshape(3, 3, M, M).astype(jnp.bfloat16),
            (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y + b2[i, 0], 0.0).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            y, w3[i].reshape(1, 1, M, C).astype(jnp.bfloat16),
            (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        h = jnp.maximum(y + b3[i, 0] + h.astype(jnp.float32),
                        0.0).astype(jnp.bfloat16)
    ref = np.asarray(h, np.float32)
    got = np.asarray(out, np.float32)
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)
