"""Full C17 flow: mine -> fine-tune -> re-index -> evaluate."""
import numpy as np
import pytest

from instsearch_tpu import ExtractConfig, PipelineConfig, TrainConfig
from instsearch_tpu.eval import make_mini_dataset
from instsearch_tpu.eval.evaluate import evaluate_index
from instsearch_tpu.index import Index
from instsearch_tpu.train.finetune import finetune


@pytest.mark.slow
def test_finetune_then_index(tmp_path):
    mini = make_mini_dataset(str(tmp_path / "mini"), n_instances=4,
                             n_views=3, n_distractors=4, seed=13)
    # labels: instance id for views, unique ids for distractors
    paths, labels = [], []
    next_label = 0
    for name in mini.imlist:
        paths.append(mini.image_path(name))
        if name.startswith("inst"):
            labels.append(int(name[4:6]))
        else:
            labels.append(100 + next_label)
            next_label += 1

    cfg = TrainConfig(backbone="vgg16", pooling="gem", image_size=32,
                      batch_size=4, num_negatives=2, dtype="float32",
                      lr=5e-5, learn_gem_p=True)
    out = finetune(paths, labels, cfg, epochs=2, steps_per_epoch=4, seed=0)
    assert len(out["losses"]) == 8
    assert np.isfinite(out["losses"]).all()
    # tuned GeM p moved and is exported cleanly
    assert out["gem_p"] != 3.0
    assert "gem_p" not in out["variables"]["params"]

    pcfg = PipelineConfig(extract=ExtractConfig(
        backbone="vgg16", pooling="gem", gem_p=out["gem_p"], image_size=32,
        batch_size=8, dtype="float32"))
    idx = Index.build(mini.db_paths, pcfg, variables=out["variables"])
    res = evaluate_index(idx, mini, "medium")
    assert np.isfinite(res["mAP"])
    assert res["mAP"] > 50.0, res   # sanity: tuned weights still retrieve


@pytest.mark.slow
@pytest.mark.parametrize("loss", ["contrastive", "smoothap"])
def test_finetune_lift_on_heldout_instances(tmp_path, loss):
    """C17 quality, not just flow: fine-tuning on one set of instances must
    IMPROVE retrieval of *held-out* instances (different seed -> disjoint
    patterns, same generative family) over the frozen initialization.

    The 'hard' protocol is where the lift lives: hard views are shifted/
    noisy/darkened, and the frozen random-init features have no invariance
    to that corruption; training pairs include each instance's hard views,
    so the loss teaches exactly the invariance the held-out queries need.
    Measured (CPU, fixed seeds; stable across 1- and 8-device XLA
    partitionings only at batch_size=8 with 12 train instances — smaller
    batches/pools make the random-init trajectory chaotic): frozen 6.6 mAP
    -> contrastive 55.6, smoothap 36.8 on the suite's 8-device rig."""
    from instsearch_tpu.train.trainer import Trainer

    train_ds = make_mini_dataset(str(tmp_path / "train"), n_instances=12,
                                 n_views=4, n_distractors=6, seed=101)
    held = make_mini_dataset(str(tmp_path / "held"), n_instances=4,
                             n_views=3, n_distractors=6, seed=202)
    paths, labels = [], []
    nxt = 0
    for name in train_ds.imlist:
        paths.append(train_ds.image_path(name))
        if name.startswith("inst"):
            labels.append(int(name[4:6]))
        else:
            labels.append(100 + nxt)
            nxt += 1

    cfg = TrainConfig(backbone="vgg16", pooling="gem", image_size=32,
                      batch_size=8, num_negatives=2, dtype="float32",
                      lr=3e-4, learn_gem_p=True, loss=loss)
    init_vars = Trainer(cfg, seed=0).variables

    def heldout_map(variables, gem_p):
        pcfg = PipelineConfig(extract=ExtractConfig(
            backbone="vgg16", pooling="gem", gem_p=gem_p, image_size=32,
            batch_size=8, dtype="float32"))
        idx = Index.build(held.db_paths, pcfg, variables=variables)
        return evaluate_index(idx, held, "hard")["mAP"]

    frozen = heldout_map(init_vars, 3.0)
    out = finetune(paths, np.asarray(labels), cfg, epochs=4,
                   steps_per_epoch=8, seed=0, variables=init_vars)
    tuned = heldout_map(out["variables"], out["gem_p"])
    # measured lift is > +20 mAP for both losses; 5 absorbs platform noise
    assert tuned > frozen + 5.0, (loss, frozen, tuned)


@pytest.mark.slow
def test_cli_finetune_then_build_index_weights(tmp_path):
    """The CLI round trip (ADVICE r1): `finetune` writes an orbax
    checkpoint + sidecar meta; `build-index --weights` consumes it and
    persists the tuned weights in the index (load reproduces them)."""
    import glob as _glob
    import json
    import os
    import cv2
    from instsearch_tpu.cli import main

    rng = np.random.default_rng(23)
    # labeled tree: 3 classes x 4 views
    for c in range(3):
        d = tmp_path / "train" / f"class{c}"
        os.makedirs(d)
        base = cv2.resize(rng.random((8, 8, 3), np.float32), (32, 32),
                          interpolation=cv2.INTER_CUBIC)
        for v in range(4):
            img = np.clip(base + rng.normal(0, 0.05, base.shape), 0, 1)
            cv2.imwrite(str(d / f"v{v}.png"), (img * 255).astype(np.uint8))

    ckpt = str(tmp_path / "tuned")
    rc = main(["finetune", "--images", str(tmp_path / "train"),
               "--out", ckpt, "--backbone", "resnet18",
               "--image-size", "32", "--epochs", "1",
               "--batch-size", "3", "--num-negatives", "1", "--learn-p",
               "--fit-lw"])
    assert rc == 0
    assert os.path.exists(ckpt + ".meta.json")
    assert os.path.exists(ckpt + ".whitening.npz")   # Lw sidecar written

    db = tmp_path / "db"
    os.makedirs(db)
    for i in range(5):
        img = cv2.resize(rng.random((8, 8, 3), np.float32), (32, 32),
                         interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(str(db / f"img{i}.png"), (img * 255).astype(np.uint8))
    cfgp = tmp_path / "cfg.json"
    from instsearch_tpu import ExtractConfig as EC, PipelineConfig as PC
    PC(extract=EC(backbone="resnet18", image_size=32, dtype="float32",
                  batch_size=4)).save(str(cfgp))
    out_idx = str(tmp_path / "idx")
    rc = main(["build-index", "--images", str(db), "--out", out_idx,
               "--config", str(cfgp), "--weights", ckpt])
    assert rc == 0

    # the index carries the TUNED weights: gem_p from the sidecar applied,
    # and load() reproduces the same query descriptors
    with open(ckpt + ".meta.json") as fh:
        gem_p = json.load(fh)["gem_p"]
    loaded = Index.load(out_idx)
    assert loaded.cfg.extract.gem_p == pytest.approx(gem_p)
    assert loaded.extractor is not None
    # the Lw whitening from the sidecar was applied and round-trips
    assert loaded.extractor.whitening is not None
    img = cv2.imread(str(db / "img0.png"))[:, :, ::-1].copy()
    _, ids = loaded.query_images(img[None])
    assert ids[0, 0] == 0


@pytest.mark.slow
def test_finetune_fit_lw_then_index(tmp_path):
    """finetune(fit_lw=True) returns Lw whitening fit on the training
    pairs (arXiv:1711.02512 §3.4); Index.build(whitening=...) applies it
    instead of fitting PCA, and retrieval still self-matches."""
    from instsearch_tpu.ops.whitening import apply_whitening

    mini = make_mini_dataset(str(tmp_path / "mini"), n_instances=4,
                             n_views=3, n_distractors=4, seed=29)
    paths, labels = [], []
    next_label = 0
    for name in mini.imlist:
        paths.append(mini.image_path(name))
        if name.startswith("inst"):
            labels.append(int(name[4:6]))
        else:
            labels.append(100 + next_label)
            next_label += 1

    cfg = TrainConfig(backbone="vgg16", pooling="gem", image_size=32,
                      batch_size=4, num_negatives=2, dtype="float32",
                      lr=5e-5)
    out = finetune(paths, labels, cfg, epochs=1, steps_per_epoch=3, seed=0,
                   fit_lw=True, lw_dim=64)
    w = out["whitening"]
    assert w.P.shape == (64, 512)        # reduced to lw_dim

    from instsearch_tpu import IndexConfig
    # f32 storage: Lw's inverse-sqrt amplifies bf16 store rounding into
    # percent-level direction error, which would mask a real math bug here
    pcfg = PipelineConfig(extract=ExtractConfig(
        backbone="vgg16", pooling="gem", image_size=32, batch_size=8,
        dtype="float32"), index=IndexConfig(dtype="float32"))
    idx = Index.build(mini.db_paths, pcfg, variables=out["variables"],
                      whitening=w)
    assert idx.dim == 64                 # descriptors live in Lw space
    # self-match through the whitened pipeline
    from instsearch_tpu.data import frontend
    img = frontend.load_square(mini.db_paths[0], 32)
    _, ids = idx.query_images(img[None])
    assert ids[0, 0] == 0
    # index descriptors really are the Lw projection of raw descriptors.
    # Use extract_paths for the raw (same native-decoder path the build
    # used: cv2-vs-native JPEG decode differs at the ±1/255 pixel level,
    # which Lw's inverse-sqrt amplifies well past any useful tolerance).
    import jax.numpy as jnp
    w_attached, idx.extractor.whitening = idx.extractor.whitening, None
    raw, _ = idx.extractor.extract_paths([mini.db_paths[0]])
    idx.extractor.whitening = w_attached
    np.testing.assert_allclose(
        np.asarray(apply_whitening(jnp.asarray(raw), w))[0],
        np.asarray(idx.descriptors[0], np.float32), atol=5e-3)
