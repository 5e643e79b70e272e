"""Flax vs torch backbone parity through the weight importer (SURVEY.md §4.2).

Same (random) weights, same input, f32 both sides -> feature maps must agree
to float tolerance. Catches conv transpose conventions, BN stat import,
padding/pooling placement.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from instsearch_tpu.models import (
    ViT, load_torch_resnet, load_torch_vgg, load_torch_vit, resnet18,
    resnet50, vgg16, validate_variables,
)
from .torch_models import (
    BasicBlock, TruncatedResNet, TruncatedVGG16, TruncatedViT,
    randomize_bn_stats,
)


def _run_torch(model, x_nchw):
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(x_nchw))
    return out.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(42)
    return rng.standard_normal((2, 64, 64, 3)).astype(np.float32)


def test_resnet50_parity(image):
    tm = randomize_bn_stats(TruncatedResNet())
    variables = load_torch_resnet(tm.state_dict())
    model = resnet50(dtype=jnp.float32)
    validate_variables(model, variables, input_shape=(1, 64, 64, 3))
    got = np.asarray(model.apply(variables, jnp.asarray(image)))
    want = _run_torch(tm, image.transpose(0, 3, 1, 2))
    assert got.shape == want.shape == (2, 2, 2, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_vgg16_parity(image):
    tm = TruncatedVGG16()
    variables = load_torch_vgg(tm.state_dict())
    model = vgg16(dtype=jnp.float32)
    validate_variables(model, variables, input_shape=(1, 64, 64, 3))
    got = np.asarray(model.apply(variables, jnp.asarray(image)))
    want = _run_torch(tm, image.transpose(0, 3, 1, 2))
    assert got.shape == want.shape == (2, 4, 4, 512)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_resnet18_parity(image):
    tm = randomize_bn_stats(TruncatedResNet(layers=(2, 2, 2, 2),
                                            block=BasicBlock))
    variables = load_torch_resnet(tm.state_dict())
    model = resnet18(dtype=jnp.float32)
    validate_variables(model, variables, input_shape=(1, 64, 64, 3))
    got = np.asarray(model.apply(variables, jnp.asarray(image)))
    want = _run_torch(tm, image.transpose(0, 3, 1, 2))
    assert got.shape == want.shape == (2, 2, 2, 512)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_resnet_odd_input_size():
    """Stride/padding conventions must agree on non-multiple-of-32 sizes."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 97, 65, 3)).astype(np.float32)
    tm = randomize_bn_stats(TruncatedResNet())
    variables = load_torch_resnet(tm.state_dict())
    got = np.asarray(resnet50(dtype=jnp.float32).apply(variables, jnp.asarray(x)))
    want = _run_torch(tm, x.transpose(0, 3, 1, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def _tiny_vit(dtype=jnp.float32, image_size=32):
    return ViT(hidden_dim=64, num_layers=2, num_heads=4, mlp_dim=128,
               patch_size=8, image_size=image_size, dtype=dtype)


def test_vit_parity(image):
    """Same (random) torchvision-layout weights through load_torch_vit ->
    patch-token grids must agree: catches in_proj stacking order, Linear
    transposes, pre-LN residual placement, GELU variant, cls/pos handling."""
    torch.manual_seed(3)
    tm = TruncatedViT(image_size=64, patch_size=8)
    variables = load_torch_vit(tm.state_dict())
    model = _tiny_vit(image_size=64)
    validate_variables(model, variables, input_shape=(1, 64, 64, 3))
    got = np.asarray(model.apply(variables, jnp.asarray(image)))
    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(image.transpose(0, 3, 1, 2))).numpy()
    assert got.shape == want.shape == (2, 8, 8, 64)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_vit_pos_embed_interpolation():
    """Off-canonical input sizes bilinearly resize the position grid at
    trace time. Cross-checked against torch: upsampling the 4x4 checkpoint
    grid to the 8x8 input grid with F.interpolate(align_corners=False)
    and running the torch forward must reproduce the Flax output (both use
    half-pixel-center bilinear; upsampling so antialias is moot)."""
    torch.manual_seed(4)
    tm = TruncatedViT(image_size=32, patch_size=8)
    variables = load_torch_vit(tm.state_dict())
    model = _tiny_vit(image_size=32)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert got.shape == (1, 8, 8, 64)
    with torch.no_grad():
        pos = tm.encoder.pos_embedding            # [1, 17, 64]
        cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
        g = grid_pos.reshape(1, 4, 4, 64).permute(0, 3, 1, 2)
        g = torch.nn.functional.interpolate(
            g, size=(8, 8), mode="bilinear", align_corners=False)
        g = g.permute(0, 2, 3, 1).reshape(1, 64, 64)
        tm.encoder.pos_embedding = torch.nn.Parameter(
            torch.cat([cls_pos, g], dim=1))
        tm.eval()
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    # rectangular off-canonical grids keep static patchify shapes
    xr = rng.standard_normal((1, 48, 40, 3)).astype(np.float32)
    out = np.asarray(model.apply(variables, jnp.asarray(xr)))
    assert out.shape == (1, 6, 5, 64)
    assert np.isfinite(out).all()


def test_vit_remainder_pixels_dropped():
    """Non-multiple-of-patch inputs patchify VALID: 39x39 -> 4x4 grid with
    the 7-pixel remainder ignored, no dynamic shapes."""
    torch.manual_seed(5)
    tm = TruncatedViT(image_size=32, patch_size=8)
    variables = load_torch_vit(tm.state_dict())
    model = _tiny_vit(image_size=32)
    rng = np.random.default_rng(12)
    x = rng.standard_normal((1, 39, 39, 3)).astype(np.float32)
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    full = np.asarray(model.apply(variables, jnp.asarray(x[:, :32, :32])))
    assert out.shape == full.shape == (1, 4, 4, 64)
    np.testing.assert_allclose(out, full, rtol=1e-5, atol=1e-5)


def test_importer_rejects_unknown_keys():
    with pytest.raises(ValueError):
        load_torch_resnet({"layer1.0.mystery.weight": np.zeros((1,))})
    with pytest.raises(ValueError):
        load_torch_vgg({"stem.weight": np.zeros((1,))})
    with pytest.raises(ValueError):
        load_torch_vit({"encoder.layers.encoder_layer_0.oops.weight":
                        np.zeros((1,))})
