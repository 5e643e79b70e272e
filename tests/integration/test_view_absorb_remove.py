"""Removal-absorbed views (VERDICT r4 item 5): ``Index.remove`` used to
invalidate every attached IVF/PQ/IVF-PQ/local-whitening view — at 64M rows
a minutes-long refit per delete batch. Now removal is ABSORBED:

  * position-ALIGNED stores (PQ codes, lw whitened store/assign) replay
    the exact compaction moves of the main store;
  * position-KEYED views (IVF, IVF-PQ buckets/spill) remap positions
    through old->new, tombstoning removed slots to -1 (masked exactly
    like padding).

Exactness contract: after any add -> remove -> add sequence, a FULL probe
(nprobe == n_clusters) / full depth search through the view equals brute
force over the survivors, and removed ids are unreachable.
"""
import numpy as np
import pytest

from instsearch_tpu import IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.index import Index


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _mk(rng, n=192, d=32, dtype="float32", capacity=512):
    x = _unit(rng, n, d)
    cfg = PipelineConfig(index=IndexConfig(dtype=dtype, row_tile=8,
                                           capacity=capacity),
                         search=SearchConfig(k=10, use_pallas=False))
    return Index.from_descriptors(x, [f"a{i}" for i in range(n)], cfg), x


def _survivor_rows(idx):
    return np.asarray(
        idx._rows_f32_chunk(0, idx.descriptors.shape[0]))[:idx.num_valid]


def _exact_top(x_all, q, k=10):
    return np.argsort(-(q @ x_all.T), kind="stable", axis=1)[:, :k]


def _churn(rng, idx, d=32):
    """add -> remove(mixed head/tail/new) -> add; returns the removed
    names' original ids (which must become unreachable)."""
    y = _unit(rng, 16, d)
    idx.add(descriptors=y, names=[f"b{i}" for i in range(16)])
    removed_names = ["a0", "a5", "a100", f"a{idx.num_valid - 40}",
                     "b3", "b15"]
    removed_ids = [idx.ids_of_names(removed_names)] \
        if hasattr(idx, "ids_of_names") else []
    idx.remove(removed_names)
    z = _unit(rng, 8, d)
    idx.add(descriptors=z, names=[f"c{i}" for i in range(8)])
    return y, z


# ---------------------------------------------------------------- IVF --
@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_ivf_absorbs_remove_full_probe_exact(rng, dtype):
    idx, x = _mk(rng, dtype=dtype)
    ivf = idx.build_ivf(n_clusters=8, iters=5)
    _churn(rng, idx)
    assert idx.ivf is ivf, "view must survive remove()"
    x_all = _survivor_rows(idx)
    ids_all = np.asarray(idx.ids)[:idx.num_valid]
    q = _unit(rng, 6, 32)
    _, got = ivf.search(idx, q, k=10, nprobe=8)
    if dtype == "float32":
        want = ids_all[_exact_top(x_all, q)]
        np.testing.assert_array_equal(got, want)
    else:
        assert ivf.measure_recall(idx, q, k=10, nprobe=8) >= 0.95


def test_ivf_removed_rows_unreachable(rng):
    idx, x = _mk(rng)
    ivf = idx.build_ivf(n_clusters=8, iters=5)
    # remove rows, then query each removed row's own vector at FULL
    # probe: the strongest pull toward its tombstoned slot
    removed = ["a0", "a7", "a150", "a191"]
    removed_pos = [int(nm[1:]) for nm in removed]
    removed_ids = {int(np.asarray(idx.ids)[p]) for p in removed_pos}
    q = x[removed_pos]
    idx.remove(removed)
    _, got = ivf.search(idx, q, k=10, nprobe=8)
    assert not (set(np.unique(got)) & removed_ids)
    assert (got >= 0).all()              # full probe still fills top-10


def test_ivf_spill_remove_then_add_append_cursor(rng):
    """Tombstoned spill entries must compact so the next absorb_add's
    append cursor cannot overwrite live entries (the prefix contract)."""
    idx, x = _mk(rng)
    ivf = idx.build_ivf(n_clusters=8, iters=5)
    y = _unit(rng, 24, 32)
    idx.add(descriptors=y, names=[f"b{i}" for i in range(24)])
    # remove SPILL rows (the just-added ones live in spill) from the
    # middle of the spill block, then add again
    idx.remove(["b2", "b3", "b4"])
    z = _unit(rng, 8, 32)
    idx.add(descriptors=z, names=[f"c{i}" for i in range(8)])
    sp = np.asarray(ivf.spill_pos)
    live = sp >= 0
    # valid prefix: no live entry after the first -1
    first_dead = int(np.argmax(~live)) if (~live).any() else len(sp)
    assert not live[first_dead:].any()
    # every surviving add (b*, c*) is still found exactly
    x_all = _survivor_rows(idx)
    ids_all = np.asarray(idx.ids)[:idx.num_valid]
    q = np.concatenate([y[5:8], z[:3]])
    _, got = ivf.search(idx, q, k=10, nprobe=8)
    np.testing.assert_array_equal(got, ids_all[_exact_top(x_all, q)])


def test_ivf_remove_survives_save_load(rng, tmp_path):
    idx, x = _mk(rng)
    idx.build_ivf(n_clusters=8, iters=5)
    _churn(rng, idx)
    idx.save(str(tmp_path / "idx"))
    idx2 = Index.load(str(tmp_path / "idx"))
    assert idx2.ivf is not None
    x_all = _survivor_rows(idx2)
    ids_all = np.asarray(idx2.ids)[:idx2.num_valid]
    q = _unit(rng, 4, 32)
    _, got = idx2.ivf.search(idx2, q, k=10, nprobe=8)
    np.testing.assert_array_equal(got, ids_all[_exact_top(x_all, q)])


# ------------------------------------------------------------- IVF-PQ --
@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_ivfpq_absorbs_remove_full_cascade_exact(rng, dtype):
    idx, x = _mk(rng, dtype=dtype)
    v = idx.build_ivfpq(n_clusters=8, nprobe=8, m=8, depth=256,
                        kmeans_iters=5, pq_iters=5, sample=None)
    _churn(rng, idx)
    assert idx.ivfpq is v, "view must survive remove()"
    x_all = _survivor_rows(idx)
    ids_all = np.asarray(idx.ids)[:idx.num_valid]
    q = _unit(rng, 6, 32)
    # full probe + depth > N: the cascade degenerates to brute force
    _, got = v.search(idx, q, k=10, depth=512, nprobe=8)
    if dtype == "float32":
        np.testing.assert_array_equal(got, ids_all[_exact_top(x_all, q)])
    else:
        assert v.measure_recall(idx, q, k=10, depth=512, nprobe=8) >= 0.95


def test_ivfpq_removed_rows_unreachable(rng):
    idx, x = _mk(rng)
    v = idx.build_ivfpq(n_clusters=8, nprobe=8, m=8, depth=256,
                        kmeans_iters=5, pq_iters=5, sample=None)
    removed = ["a1", "a64", "a190"]
    removed_pos = [int(nm[1:]) for nm in removed]
    removed_ids = {int(np.asarray(idx.ids)[p]) for p in removed_pos}
    q = x[removed_pos]
    idx.remove(removed)
    _, got = v.search(idx, q, k=10, depth=512, nprobe=8)
    assert not (set(np.unique(got)) & removed_ids)


# ----------------------------------------------------------------- PQ --
@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_pq_absorbs_remove_full_depth_exact(rng, dtype):
    idx, x = _mk(rng, dtype=dtype)
    v = idx.build_pq(m=8, depth=256, iters=5, sample=None)
    _churn(rng, idx)
    assert idx.pq is v, "view must survive remove()"
    x_all = _survivor_rows(idx)
    ids_all = np.asarray(idx.ids)[:idx.num_valid]
    q = _unit(rng, 6, 32)
    _, got = v.search(idx, q, k=10, depth=512)
    if dtype == "float32":
        np.testing.assert_array_equal(got, ids_all[_exact_top(x_all, q)])
    else:
        assert v.measure_recall(idx, q, k=10, depth=512) >= 0.95


def test_pq_codes_realigned_after_remove(rng):
    """Direct alignment check: after removal, codes[p] must encode the
    row now LIVING at p (the moved survivor), not the stale one."""
    from instsearch_tpu.ops.pq import encode_pq
    import jax.numpy as jnp
    idx, x = _mk(rng)
    v = idx.build_pq(m=8, depth=64, iters=5, sample=None)
    idx.remove(["a0", "a1", "a2"])       # tail survivors move to 0..2
    rows = _survivor_rows(idx)
    want = np.asarray(encode_pq(jnp.asarray(rows[:8]), v.codebook))
    np.testing.assert_array_equal(np.asarray(v.codes)[:8], want)


# ----------------------------------------------------- local whitening --
def test_lw_absorbs_remove_store_realigned(rng):
    from instsearch_tpu.ops.local_whiten import apply_local_whitening, route
    import jax.numpy as jnp
    idx, x = _mk(rng)
    lw = idx.fit_local_whitening(n_clusters=4, iters=5)
    _churn(rng, idx)
    assert idx.lw is lw, "view must survive remove()"
    rows = _survivor_rows(idx)
    want = np.asarray(apply_local_whitening(jnp.asarray(rows), lw.params))
    got = np.asarray(lw.store)[:idx.num_valid].astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)  # bf16
    np.testing.assert_array_equal(
        np.asarray(lw.assign)[:idx.num_valid],
        np.asarray(route(jnp.asarray(rows), lw.params)))
    # lw-routed search still works over the churned corpus
    s, ids = idx.search(rows[:3], idx.cfg.search.replace(
        lw_enabled=True, rerank_depth=16, k=5))
    ids_all = np.asarray(idx.ids)[:idx.num_valid]
    assert (ids[:, 0] == ids_all[:3]).all()


# ------------------------------------------------------------- cycles --
def test_repeated_add_remove_cycles_stay_exact(rng):
    idx, x = _mk(rng)
    ivf = idx.build_ivf(n_clusters=8, iters=5)
    for r in range(3):
        y = _unit(rng, 20, 32)
        idx.add(descriptors=y, names=[f"r{r}_{i}" for i in range(20)])
        idx.remove([f"r{r}_{i}" for i in range(0, 20, 3)]
                   + [f"a{10 * r}", f"a{10 * r + 1}"])
    assert idx.ivf is ivf
    x_all = _survivor_rows(idx)
    ids_all = np.asarray(idx.ids)[:idx.num_valid]
    q = _unit(rng, 6, 32)
    _, got = ivf.search(idx, q, k=10, nprobe=8)
    np.testing.assert_array_equal(got, ids_all[_exact_top(x_all, q)])
