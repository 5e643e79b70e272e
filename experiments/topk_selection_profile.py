"""On-chip A/B: does large-k selection explain the rerank/diffusion
roofline gap? Interleaved-marginal so ratios are drift-free."""
import json

import jax
import jax.numpy as jnp
import numpy as np

from instsearch_tpu import bench as B
from instsearch_tpu.kernels.topk_matmul import topk_matmul

N, D = 1_048_576, 512
Xd, q = B._make_index_device(N, D, 1)
q1 = jnp.ones((1, D), jnp.bfloat16)


def mk_topk(k, tile_n=None):
    def make(m):
        def run(X, qq):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(m):
                s, i = topk_matmul(X, qq + acc * 1e-30, k=k, tile_n=tile_n)
                acc = acc + s[0, 0]
            return acc
        return jax.jit(run)
    return make


specs = [
    ("probe", B.make_stream_probe, (Xd, q1)),
    ("k10", mk_topk(10), (Xd, q)),
    ("k100", mk_topk(100), (Xd, q)),
    ("k200", mk_topk(200), (Xd, q)),
    ("k100_t4096", mk_topk(100, 4096), (Xd, q)),
    ("k100_t1024", mk_topk(100, 1024), (Xd, q)),
]
res = B.interleaved_marginal([(mk, a) for _, mk, a in specs],
                             n1=3, n2=9, reps=5)
out = {}
for (nm, _, _), r in zip(specs, res):
    out[nm] = round(float(np.median(r)) * 1e3, 4)
out["bw_gbps_probe"] = round(N * D * 2 / (out["probe"] / 1e3) / 1e9, 1)
print(json.dumps(out))
