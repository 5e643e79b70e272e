"""End-to-end walkthrough — the scripted replacement for the reference's
notebook workflow (SURVEY.md C16).

Runs on the synthetic mini dataset out of the box (no downloads needed);
point ``--data-root``/``--dataset`` at a real Oxford/Paris layout
(eval/datasets.py documents both on-disk formats) for the full protocol.

    python examples/end_to_end.py                 # mini fixture
    python examples/end_to_end.py --dataset roxford5k --data-root /data
"""
import argparse
import json

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="mini")
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--backbone", default="vgg16")
    ap.add_argument("--image-size", type=int, default=64)
    args = ap.parse_args()

    from instsearch_tpu import (
        ExtractConfig, IndexConfig, PipelineConfig, SearchConfig,
    )
    from instsearch_tpu.data import frontend
    from instsearch_tpu.eval import load_dataset
    from instsearch_tpu.index import Index

    # ---- 1. dataset -------------------------------------------------------
    ds = load_dataset(args.dataset, args.data_root)
    print(f"dataset {ds.name}: {len(ds.imlist)} db images, "
          f"{len(ds.qimlist)} queries")

    # ---- 2. build: extract -> whiten -> store (int8, rerank-ready) -------
    cfg = PipelineConfig(
        extract=ExtractConfig(backbone=args.backbone, pooling="rmac",
                              image_size=args.image_size, batch_size=8,
                              whiten=True),
        index=IndexConfig(dtype="int8", row_tile=8),
        search=SearchConfig(k=5, rerank_enabled=True, rerank_depth=16))
    index = Index.build(ds.db_paths, cfg)
    print(f"indexed {index.num_valid} images, dim {index.dim}, "
          f"storage {index.descriptors.dtype}")

    # ---- 3. query one image (global + regional re-rank) ------------------
    img = frontend.load_square(ds.db_paths[0], args.image_size)
    scores, ids = index.query(img, k=5)
    print("query results:", [(index.name_of(int(i)), round(float(s), 4))
                             for s, i in zip(scores[0], ids[0]) if i >= 0])

    # filtered search (search/subset.py): restrict any query to a named
    # collection — a reusable device-resident mask, free at scan time
    # (0.993x the unfiltered kernel on chip, BASELINE.md r5)
    collection = index.make_subset(names=index.names[::2])
    s_f, i_f = index.query(img, k=5, subset=collection)
    print("filtered results:", [(index.name_of(int(i)), round(float(s), 4))
                                for s, i in zip(s_f[0], i_f[0]) if i >= 0])

    # ---- 4. protocol evaluation: the quality ladder ------------------------
    for scfg, tag in ((SearchConfig(), "base"),
                      (SearchConfig(qe_enabled=True, qe_n=5), "alpha-QE"),
                      (SearchConfig(rerank_enabled=True, rerank_depth=16),
                       "regional re-rank"),
                      (SearchConfig(diffusion_enabled=True,
                                    diffusion_depth=16, diffusion_knn=4),
                       "diffusion")):
        res = index.evaluate(ds, "medium", scfg)
        print(f"{tag:18s} mAP {res['mAP']:6.2f}  mP@5 {res.get('mP@5', 0):6.2f}")

    # spatial verification fuses into the re-rank: region-pair Hough
    # voting separates scrambled-layout near-duplicates the arrangement-
    # invariant region match cannot (search/spatial.py)
    res = index.evaluate(ds, "medium", SearchConfig(
        rerank_enabled=True, rerank_depth=16, spatial_weight=0.5))
    print(f"{'re-rank + spatial':18s} mAP {res['mAP']:6.2f}")

    # local-whitening re-ranking: per-cluster metric re-scoring (fit is a
    # one-off, like the IVF view; mutually exclusive with the re-rank)
    index.fit_local_whitening(n_clusters=4)
    res = index.evaluate(ds, "medium", SearchConfig(
        lw_enabled=True, rerank_depth=16))
    print(f"{'local whitening':18s} mAP {res['mAP']:6.2f}")

    # optional offline quality: alpha-DBA augments the STORED rows once
    # (zero query-time cost; mesh=... routes it through the sharded scan)
    index.augment_database(n=5)   # NB: invalidates the lw view (refit if
    res = index.evaluate(ds, "medium", SearchConfig())  # you keep using it)
    print(f"{'alpha-DBA (offline)':18s} mAP {res['mAP']:6.2f}")

    # ---- 5. persist (streaming orbax store + extractor weights) -----------
    index.save("example_index")
    reloaded = Index.load("example_index")     # weights + whitening restored
    print("reloaded:", reloaded.num_valid, "rows,",
          "weights" if reloaded.extractor is not None else "no weights")

    # ---- 6. distributed serving + sharded protocol evaluation -------------
    # default policy: config pins the shard count, else every device
    sharded = index.to_sharded()
    q = np.asarray(index.descriptors[:1].astype("float32"))
    if index.scales is not None:
        q = q * np.asarray(index.scales)[0, :1, None]
    s, i = sharded.search(q, k=3)
    print("sharded search over", sharded.mesh.devices.size, "device(s):",
          np.asarray(i)[0].tolist())
    import jax
    if len(jax.devices()) > 1:
        res = index.evaluate(ds, "medium", sharded=True)
        print(f"sharded evaluation  mAP {res['mAP']:6.2f} "
              f"(ranked through ShardedIndex)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
