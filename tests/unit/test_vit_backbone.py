"""ViT backbone family wiring: registry, descriptor pipeline, R-MAC grid.

The real vit_b_16/vit_l_16 are too slow to run at 224^2 on the CPU rig, so
registry entries are checked shape-only via eval_shape (free) and the
pipeline integration runs a tiny ViT through a monkeypatched registry spec
— the same get_backbone path the extractor uses.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instsearch_tpu.config import ExtractConfig
from instsearch_tpu.extractor import Extractor, build_combined_fn
from instsearch_tpu.models import ViT, get_backbone, load_torch_vit
from instsearch_tpu.models.registry import BACKBONES, BackboneSpec


@pytest.mark.parametrize("name,dim,grid", [("vit_b_16", 768, 14),
                                           ("vit_l_16", 1024, 14)])
def test_registry_output_shapes(name, dim, grid):
    model, spec = get_backbone(name, dtype=jnp.bfloat16)
    assert spec.feature_dim == dim and spec.stride == 16
    assert spec.torch_loader is load_torch_vit
    out = jax.eval_shape(
        lambda v, x: model.apply(v, x),
        jax.eval_shape(lambda: model.init(
            jax.random.PRNGKey(0), np.zeros((1, 224, 224, 3), np.float32))),
        jax.ShapeDtypeStruct((2, 224, 224, 3), jnp.uint8))
    assert out.shape == (2, grid, grid, dim)
    assert ExtractConfig(backbone=name).descriptor_dim == dim


@pytest.fixture()
def tiny_vit_registry(monkeypatch):
    def factory(dtype=jnp.bfloat16, attention="auto"):
        return ViT(hidden_dim=32, num_layers=1, num_heads=4, mlp_dim=64,
                   patch_size=8, image_size=32, dtype=dtype,
                   attention=attention)
    monkeypatch.setitem(
        BACKBONES, "vit_tiny",
        BackboneSpec(factory, 32, 8, load_torch_vit))
    return "vit_tiny"


def test_extractor_pipeline_with_vit(tiny_vit_registry, rng):
    """Full descriptor pipeline over the patch-token grid: GeM pooling,
    multi-scale averaging (exercises the pos-embedding resize under jit),
    unit-norm output."""
    cfg = ExtractConfig(backbone=tiny_vit_registry, pooling="gem",
                        image_size=32, scales=(1.0, 0.75),
                        dtype="float32", batch_size=4)
    ex = Extractor(cfg, seed=0)
    imgs = rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8)
    d = np.asarray(ex(imgs))
    assert d.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, rtol=1e-5)


def test_vit_finetune_step(tiny_vit_registry, rng):
    """C17 fine-tuning composes with the ViT family: one contrastive step
    updates params (no batch_stats collection — the frozen tree is empty,
    same structural case as VGG) and the loss is finite."""
    from instsearch_tpu.config import TrainConfig
    from instsearch_tpu.train.trainer import Trainer

    cfg = TrainConfig(backbone=tiny_vit_registry, pooling="gem",
                      image_size=32, batch_size=2, num_negatives=1,
                      dtype="float32", learn_gem_p=True)
    tr = Trainer(cfg, seed=0)
    before = np.asarray(tr.state.params["gem_p"])
    imgs = rng.integers(0, 256, (2, 3, 32, 32, 3), dtype=np.uint8)
    metrics = tr.step(imgs)
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(tr.state.params["gem_p"])
    assert before.shape == after.shape


def test_vit_regional_store(tiny_vit_registry, rng):
    """R-MAC regional descriptors pool the 4x4 patch grid — the combined
    single-pass build path works for ViTs exactly as for CNNs."""
    cfg = ExtractConfig(backbone=tiny_vit_registry, pooling="gem",
                        image_size=32, rmac_levels=2, dtype="float32")
    model, fn = build_combined_fn(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 3), np.float32))
    imgs = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    desc, reg = jax.jit(fn)(variables, imgs, None)
    desc, reg = np.asarray(desc), np.asarray(reg)
    assert desc.shape == (2, 32)
    assert reg.ndim == 3 and reg.shape[0] == 2 and reg.shape[2] == 32
    np.testing.assert_allclose(
        np.linalg.norm(reg, axis=-1), 1.0, rtol=1e-5)
