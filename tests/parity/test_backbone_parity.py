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
    load_torch_resnet, load_torch_vgg, resnet18, resnet50, vgg16,
    validate_variables,
)
from .torch_models import (
    BasicBlock, TruncatedResNet, TruncatedVGG16, randomize_bn_stats,
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


def test_importer_rejects_unknown_keys():
    with pytest.raises(ValueError):
        load_torch_resnet({"layer1.0.mystery.weight": np.zeros((1,))})
    with pytest.raises(ValueError):
        load_torch_vgg({"stem.weight": np.zeros((1,))})
