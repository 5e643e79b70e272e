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

print(f"MH_OK {pid}", flush=True)
