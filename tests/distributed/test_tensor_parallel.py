"""Tensor-parallel ViT extraction (SURVEY.md §2.2 TP row).

Megatron-style column/row PartitionSpecs on the attention + MLP weights;
GSPMD inserts the collectives. Asserted: TP output == single-device
output, parameters are REALLY sharded (per-device shard shapes shrink),
and the spec builder no-ops safely on CNN trees.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from instsearch_tpu.models.vit import ViT
from instsearch_tpu.parallel.tp import place_tp, tp_param_spec, tp_param_specs


def _tiny_vit():
    return ViT(hidden_dim=32, num_layers=2, num_heads=4, mlp_dim=64,
               patch_size=4, image_size=16, dtype=jnp.float32)


def _init(model, rng):
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return variables, x


def _mesh(data, model_ax):
    devs = np.array(jax.devices()[: data * model_ax]).reshape(data, model_ax)
    return Mesh(devs, ("data", "model"))


@pytest.mark.parametrize("data,tp", [(1, 4), (2, 2), (1, 8)])
def test_tp_matches_single_device(rng, data, tp):
    model = _tiny_vit()
    variables, x = _init(model, rng)
    ref = np.asarray(model.apply(variables, jnp.asarray(x)))

    mesh = _mesh(data, tp)
    tp_vars = place_tp(mesh, variables, axis="model")
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    out = np.asarray(jax.jit(model.apply)(tp_vars, xs))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_params_really_sharded(rng):
    model = _tiny_vit()
    variables, _ = _init(model, rng)
    mesh = _mesh(1, 4)
    tp_vars = place_tp(mesh, variables, axis="model")
    p = tp_vars["params"]["encoder_layer_0"]
    # column split: qkv kernel [D, 3D] -> per-device [D, 3D/4]
    qkv = p["qkv"]["kernel"]
    assert qkv.addressable_shards[0].data.shape == (32, 96 // 4)
    # row split: out kernel [D, D] -> per-device [D/4, D]
    out = p["out"]["kernel"]
    assert out.addressable_shards[0].data.shape == (32 // 4, 32)
    # LayerNorm replicated
    ln = p["ln_1"]["scale"]
    assert ln.addressable_shards[0].data.shape == (32,)


def test_spec_builder_replicates_unknown_params():
    # a CNN-ish tree: every leaf must come back replicated (TP is a safe
    # no-op for ResNet/VGG — one code path for all backbones)
    assert tp_param_spec(("params", "conv1", "kernel")) == P()
    assert tp_param_spec(("params", "bn1", "scale")) == P()
    assert tp_param_spec(("params",)) == P()
    # recognized layers split as documented
    assert tp_param_spec(("params", "encoder_layer_3", "qkv", "kernel")) == \
        P(None, "model")
    assert tp_param_spec(("params", "encoder_layer_3", "out", "kernel")) == \
        P("model", None)
    assert tp_param_spec(("params", "encoder_layer_3", "linear_1", "bias")) \
        == P("model")
    # row-split bias stays replicated (added after the psum)
    assert tp_param_spec(("params", "encoder_layer_3", "linear_2", "bias")) \
        == P()


def test_indivisible_dim_rejected(rng):
    model = ViT(hidden_dim=24, num_layers=1, num_heads=4, mlp_dim=36,
                patch_size=4, image_size=16, dtype=jnp.float32)
    variables, _ = _init(model, rng)
    mesh = _mesh(1, 8)  # 36 % 8 != 0 on linear_1
    with pytest.raises(ValueError, match="not divisible"):
        place_tp(mesh, variables, axis="model")


def test_specs_tree_matches_structure(rng):
    model = _tiny_vit()
    variables, _ = _init(model, rng)
    specs = tp_param_specs(variables)
    assert (jax.tree_util.tree_structure(specs)
            == jax.tree_util.tree_structure(variables))


def test_extractor_tp_mesh_matches_single_device(rng):
    # the full extraction pipeline (frontend -> ViT -> GeM -> L2) over a
    # DP x TP mesh equals the meshless path; 'auto' attention resolves to
    # the XLA path under TP (a pallas_call would force GSPMD replication)
    from instsearch_tpu.config import ExtractConfig
    from instsearch_tpu.extractor import Extractor
    from instsearch_tpu.parallel import make_mesh_dp_tp

    cfg = ExtractConfig(backbone="vit_b_16", pooling="gem", image_size=32,
                        dtype="float32", batch_size=4)
    imgs = (rng.random((4, 32, 32, 3)) * 255).astype(np.uint8)
    ex0 = Extractor(cfg, seed=0)
    ref = np.asarray(ex0(jnp.asarray(imgs)))

    mesh = make_mesh_dp_tp(2, 4)
    ex = Extractor(cfg, variables=ex0.variables, seed=0, mesh=mesh)
    assert ex.cfg.vit_attention == "xla"
    out = np.asarray(ex(jnp.asarray(imgs)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
    # the qkv weights must REALLY be head-split 4-way
    qkv = ex.variables["params"]["encoder_layer_0"]["qkv"]["kernel"]
    assert qkv.addressable_shards[0].data.shape == (768, 3 * 768 // 4)
