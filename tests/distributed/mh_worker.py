"""Worker for the REAL multi-host test (test_multihost.py): one of P
processes, each with 4 virtual CPU devices, jointly serving a ShardedIndex
whose rows span processes (Gloo-backed collectives over the loopback).

Run: python mh_worker.py <process_id> <num_processes> <port>
Prints "MH_OK <pid>" on success; any assertion kills the exit code.
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax

jax.config.update("jax_platforms", "cpu")

from instsearch_tpu.parallel import (build_multihost_index, initialize,
                                     local_row_range)

initialize(coordinator_address=f"localhost:{port}",
           num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc

import numpy as np

# identical global dataset on every process (seeded); each process only
# COMMITS its own row slice to devices
rng = np.random.default_rng(17)
N, D, k = 256, 64, 5
X = rng.standard_normal((N, D)).astype(np.float32)
X /= np.linalg.norm(X, axis=1, keepdims=True)
ids = np.arange(N, dtype=np.int32)

lo, hi = local_row_range(N)
assert (hi - lo) == N // nproc
sidx = build_multihost_index(X[lo:hi], ids, k=k)
assert not sidx.descriptors.is_fully_addressable   # really spans processes

Q = X[:7] + 0.001
scores, gids = sidx.search(Q, k=k)
gids = np.asarray(gids)

# oracle on the host-global matrix
oracle = np.argsort(-(Q @ X.T), axis=1)[:, :k]
assert np.array_equal(gids, oracle), (gids, oracle)

# distributed alpha-QE across processes (two cross-host allgathers)
_, gq = sidx.search_qe(Q, k=k, qe_n=3)
assert (np.asarray(gq)[:, 0] == np.arange(7)).all()

# subset-filtered search across processes (r5, search/subset.py): the
# [1, N] allow-mask places row-aligned on the cross-process mesh like
# the int8 scales and must equal the masked host oracle exactly
import jax.numpy as jnp

allow = np.zeros(N, bool)
allow[::2] = True
smask = sidx.place_subset(jnp.asarray(allow[None, :].astype(np.int8)))
_, gf = sidx.search(Q, k=k, mask=smask)
gf = np.asarray(gf)
oracle_f = np.argsort(-np.where(allow[None, :], Q @ X.T, -np.inf),
                      axis=1)[:, :k]
assert np.array_equal(gf, oracle_f), (gf, oracle_f)

# full protocol ranking through the cross-process scorer
ranks = sidx.full_ranking(Q[:2])
assert np.array_equal(ranks[:, 0], np.arange(2))
assert ranks.shape == (2, N)

# int8 storage: each process quantizes ITS rows; per-row scales shard
# alongside them across processes
from instsearch_tpu.ops.quantize import quantize_rows

qr = quantize_rows(X[lo:hi])
sidx8 = build_multihost_index(np.asarray(qr.values), ids,
                              local_scales=np.asarray(qr.scales), k=k)
_, g8 = sidx8.search(Q, k=k)
assert (np.asarray(g8)[:, 0] == np.arange(7)).all()

# regional re-ranking across processes: each host commits only its slice
# of the [N, R, D] store
R = 3
reg = rng.standard_normal((N, R, D)).astype(np.float32)
reg /= np.linalg.norm(reg, axis=-1, keepdims=True)
sidxr = build_multihost_index(X[lo:hi], ids, local_regional=reg[lo:hi], k=k)
qreg = reg[:4]
_, gr = sidxr.search_rerank(Q[:4], qreg, k=k, depth=16)
assert np.asarray(gr).shape == (4, k)
assert (np.asarray(gr)[:, 0] == np.arange(4)).all(), np.asarray(gr)

# diffusion re-ranking across processes (cross-host candidate-row
# allgather + replicated graph solve)
_, gd = sidx.search_diffusion(Q[:4], k=k, depth=32, knn=4)
assert np.asarray(gd).shape == (4, k)
assert (np.asarray(gd) != -1).all()

# packed-int4 storage spanning processes: each host packs ITS rows
from instsearch_tpu.ops.quantize import quantize_rows_int4

qr4 = quantize_rows_int4(X[lo:hi])
sidx4 = build_multihost_index(np.asarray(qr4.values), ids,
                              local_scales=np.asarray(qr4.scales), k=k,
                              int4=True)
_, g4 = sidx4.search(Q, k=k)
assert (np.asarray(g4)[:, 0] == np.arange(7)).all()

# ---- r4 re-scoring/candidate tiers across REAL process boundaries
# (VERDICT r4 item 8): the SAME shard_map programs must span processes.
# Each process builds the identical single-device index + fitted views
# (deterministic seeded fits on identical data), to_sharded places them
# onto the cross-process mesh (place() is multi-host-safe: every process
# contributes its addressable shards of the host-global value), and the
# Gloo-backed distributed ranking must equal the single-device composite.
from instsearch_tpu.config import IndexConfig, PipelineConfig, SearchConfig
from instsearch_tpu.index import Index
from instsearch_tpu.parallel import global_shard_mesh

mesh = global_shard_mesh()

# local-whitening re-ranking (search/lw_rerank.py): row-sharded whitened
# store + assignments span processes, bank replicates
cfg_lw = PipelineConfig(
    index=IndexConfig(dtype="float32", row_tile=8),
    search=SearchConfig(k=k, use_pallas=False, rerank_depth=32,
                        lw_enabled=True))
idx_lw = Index.from_descriptors(X, [f"i{i}" for i in range(N)], cfg_lw)
idx_lw.fit_local_whitening(n_clusters=4, tau=8.0, seed=0)
want_lw_s, want_lw_i = idx_lw.search(Q)
sidx_lw = idx_lw.to_sharded(mesh=mesh, use_pallas=False)
assert not sidx_lw.lw_store.is_fully_addressable    # spans processes
got_lw_s, got_lw_i = sidx_lw.search_lw(Q, k=k, depth=32)
assert np.array_equal(np.asarray(got_lw_i), want_lw_i), \
    (np.asarray(got_lw_i), want_lw_i)
np.testing.assert_allclose(np.asarray(got_lw_s), want_lw_s,
                           rtol=2e-5, atol=2e-6)

# IVF-PQ cascade: capacity-axis-sharded codes span processes, probe
# selection replicates, exact re-score rides the row-sharded main store
cfg_pq = PipelineConfig(index=IndexConfig(dtype="float32", row_tile=8),
                        search=SearchConfig(k=k, use_pallas=False))
idx_pq = Index.from_descriptors(X, [f"i{i}" for i in range(N)], cfg_pq)
idx_pq.build_ivfpq(n_clusters=8, nprobe=4, m=8, depth=32, sample=None)
want_pq_s, want_pq_i = idx_pq.search(Q)
sidx_pq = idx_pq.to_sharded(mesh=mesh, use_pallas=False)
assert not sidx_pq.ivfpq.codes.is_fully_addressable  # spans processes
got_pq_s, got_pq_i = sidx_pq.search_ivfpq(Q, k=k)
assert np.array_equal(np.asarray(got_pq_i), want_pq_i), \
    (np.asarray(got_pq_i), want_pq_i)
np.testing.assert_allclose(np.asarray(got_pq_s), want_pq_s,
                           rtol=2e-5, atol=2e-6)

print(f"MH_OK {pid}", flush=True)
