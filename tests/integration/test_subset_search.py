"""Filtered (ID-subset) search across every tier (search/subset.py).

The contract under test: with a subset attached, every tier returns
EXACTLY what the unfiltered tier would return over an index containing
only the subset's rows (for the exact tiers and full-probe/full-depth
ANN tiers), and NEVER returns a non-member anywhere. FAISS IDSelector
analog — SURVEY.md §2.1 C11's scan predicate, rebuilt as a static-shape
mask operand.
"""
import numpy as np
import pytest

from instsearch_tpu import (ExtractConfig, IndexConfig, PipelineConfig,
                            SearchConfig)
from instsearch_tpu.index import Index, attach_regional_store


def _unit(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _build(rng, n=240, d=32, dtype="float32", **search_kw):
    X = _unit(rng, (n, d))
    cfg = PipelineConfig(
        extract=ExtractConfig(dtype="float32"),
        index=IndexConfig(dtype=dtype, row_tile=8),
        search=SearchConfig(k=7, use_pallas=False, **search_kw))
    idx = Index.from_descriptors(X, [f"im{i}" for i in range(n)], cfg)
    return idx, X


def _members(idx, step=3):
    return [f"im{i}" for i in range(0, idx.num_valid, step)]


def _assert_members_only(idx, ids, member_names):
    ok = {-1}
    pos_by_name = {nm: p for p, nm in enumerate(idx.names)}
    ids_np = np.asarray(idx.ids)
    ok |= {int(ids_np[pos_by_name[nm]]) for nm in member_names}
    got = set(int(v) for v in np.asarray(ids).ravel())
    assert got <= ok, got - ok


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8", "int4"])
def test_exact_tier_equals_filtered_oracle(rng, dtype):
    """Across every storage dtype, a filtered exact search equals a
    fresh unfiltered index built from only the member rows (ranking by
    name — ids differ between the two indexes)."""
    idx, X = _build(rng, dtype=dtype)
    members = _members(idx)
    Q = _unit(rng, (4, X.shape[1]))
    s, i = idx.search(Q, subset=idx.make_subset(names=members))
    _assert_members_only(idx, i, members)

    keep = sorted(int(nm[2:]) for nm in members)
    ref, _ = _build(rng, dtype=dtype)  # same cfg; rebuild over members only
    ref = Index.from_descriptors(X[keep], [f"im{j}" for j in keep], ref.cfg)
    s2, i2 = ref.search(Q)
    names_got = [[idx.name_of(v) for v in row if v >= 0]
                 for row in np.asarray(i)]
    names_want = [[ref.name_of(v) for v in row if v >= 0]
                  for row in np.asarray(i2)]
    assert names_got == names_want
    np.testing.assert_allclose(np.asarray(s)[:, :5], np.asarray(s2)[:, :5],
                               rtol=5e-2, atol=5e-2)   # bf16/int4 rounding


def test_qe_composite_respects_subset(rng):
    idx, X = _build(rng, qe_enabled=True, qe_n=5)
    members = _members(idx)
    _, i = idx.search(_unit(rng, (3, X.shape[1])),
                      subset=idx.make_subset(names=members))
    _assert_members_only(idx, i, members)


def test_rerank_composite_respects_subset(rng):
    idx, X = _build(rng, rerank_enabled=True, rerank_depth=32)
    R = 4
    attach_regional_store(idx, _unit(rng, (idx.num_valid, R, X.shape[1])))
    members = _members(idx)
    qreg = _unit(rng, (3, R, X.shape[1]))
    _, i = idx.search(_unit(rng, (3, X.shape[1])), query_regional=qreg,
                      subset=idx.make_subset(names=members))
    _assert_members_only(idx, i, members)


def test_refine_composite_respects_subset(rng):
    X = _unit(rng, (240, 32))
    cfg = PipelineConfig(
        extract=ExtractConfig(dtype="float32"),
        index=IndexConfig(dtype="int4", row_tile=8, refine_dtype="int8"),
        search=SearchConfig(k=7, use_pallas=False, refine_enabled=True,
                            rerank_depth=32))
    idx = Index.from_descriptors(X, [f"im{i}" for i in range(240)], cfg)
    members = _members(idx)
    _, i = idx.search(_unit(rng, (3, 32)),
                      subset=idx.make_subset(names=members))
    _assert_members_only(idx, i, members)


def test_diffusion_composite_respects_subset(rng):
    idx, X = _build(rng, diffusion_enabled=True, diffusion_depth=32,
                    diffusion_knn=4)
    members = _members(idx)
    _, i = idx.search(_unit(rng, (3, X.shape[1])),
                      subset=idx.make_subset(names=members))
    _assert_members_only(idx, i, members)


def test_lw_composite_respects_subset(rng):
    idx, X = _build(rng, lw_enabled=True, rerank_depth=32)
    idx.fit_local_whitening(n_clusters=4, tau=8.0, seed=0)
    members = _members(idx)
    _, i = idx.search(_unit(rng, (3, X.shape[1])),
                      subset=idx.make_subset(names=members))
    _assert_members_only(idx, i, members)


def test_ivf_full_probe_equals_exact_subset(rng):
    idx, X = _build(rng)
    idx.build_ivf(n_clusters=8, nprobe=8)     # full probe == brute force
    members = _members(idx)
    sub = idx.make_subset(names=members)
    Q = _unit(rng, (4, X.shape[1]))
    _, got = idx.search(Q, subset=sub)
    _assert_members_only(idx, got, members)
    _, want = idx.search(Q, idx.cfg.search.replace(ivf_nprobe=0), subset=sub)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pq_full_depth_equals_exact_subset(rng):
    idx, X = _build(rng)
    idx.build_pq(m=8, depth=idx.num_valid)
    members = _members(idx)
    sub = idx.make_subset(names=members)
    Q = _unit(rng, (4, X.shape[1]))
    _, got = idx.search(Q, subset=sub)
    _assert_members_only(idx, got, members)
    _, want = idx.search(Q, idx.cfg.search.replace(pq_depth=0), subset=sub)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ivfpq_full_probe_equals_exact_subset(rng):
    idx, X = _build(rng)
    idx.build_ivfpq(n_clusters=8, nprobe=8, m=8, depth=idx.num_valid)
    members = _members(idx)
    sub = idx.make_subset(names=members)
    Q = _unit(rng, (4, X.shape[1]))
    _, got = idx.search(Q, subset=sub)
    _assert_members_only(idx, got, members)
    _, want = idx.search(Q, idx.cfg.search.replace(ivfpq_nprobe=0),
                         subset=sub)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_selective_filter_keeps_depth_budget(rng):
    """A 5% subset through the IVF-PQ cascade must still return k full
    results at full probe — the mask applies at ADC SELECTION, so
    disallowed rows cannot eat the depth budget (post-filtering would
    return mostly -1 here: depth=16 < 20x oversampling)."""
    idx, X = _build(rng, n=320)
    idx.build_ivfpq(n_clusters=8, nprobe=8, m=8, depth=16)
    members = [f"im{i}" for i in range(0, 320, 20)]     # 16 members
    sub = idx.make_subset(names=members)
    _, i = idx.search(Q := _unit(rng, (3, X.shape[1])), subset=sub)
    i = np.asarray(i)
    assert (i >= 0).all(), i          # k=7 <= 16 members: all slots filled
    _assert_members_only(idx, i, members)


def test_query_image_route_threads_subset(rng):
    """Index.query() with an IMAGE batch must forward subset= through
    query_images — the image branch used to drop **kw, silently serving
    unfiltered results for filtered image queries."""
    from instsearch_tpu.extractor import Extractor

    cfg = PipelineConfig(
        extract=ExtractConfig(backbone="vgg16", pooling="mac",
                              image_size=32, batch_size=4,
                              dtype="float32"),
        index=IndexConfig(dtype="float32", row_tile=8),
        search=SearchConfig(k=4, use_pallas=False))
    ex = Extractor(cfg.extract, seed=0)
    imgs = (rng.random((12, 32, 32, 3)) * 255).astype(np.uint8)
    descs = np.asarray(ex(imgs))
    idx = Index.from_descriptors(descs, [f"im{i}" for i in range(12)], cfg)
    idx.extractor = ex
    members = [f"im{i}" for i in range(6, 12)]
    # query with image 0: unfiltered self-matches im0; filtered must not
    _, i_all = idx.query(imgs[0], k=4)
    assert idx.name_of(int(np.asarray(i_all)[0, 0])) == "im0"
    _, i_f = idx.query(imgs[0], k=4, subset=idx.make_subset(names=members))
    _assert_members_only(idx, i_f, members)


def test_search_adc_and_host_respect_mask(rng, tmp_path):
    """Capacity serving: the on-chip ADC-only mode and the host-gather
    cascade both honor a position mask."""
    from instsearch_tpu.search.ivfpq import HostRowStore, IVFPQView
    X = _unit(rng, (256, 32))
    store = HostRowStore.create(str(tmp_path / "rows"), X, dtype="float32")
    view = IVFPQView.from_host_store(store, n_clusters=8, nprobe=8, m=8,
                                     depth=64, sample=None)
    allow = np.zeros(256, bool)
    allow[::4] = True
    mask = np.asarray(allow[None, :], np.int8)
    import jax.numpy as jnp
    s, pos = view.search_adc(X[:3], k=5, mask=jnp.asarray(mask))
    assert allow[pos[pos >= 0]].all()
    s2, ids2 = view.search_host(store, X[:3], k=5, mask=jnp.asarray(mask))
    assert allow[ids2[ids2 >= 0]].all()
    # self-match: query 0 IS row 0, a member — must come back first
    assert ids2[0, 0] == 0
