import numpy as np, jax.numpy as jnp, jax
jax.config.update("jax_platforms", "cpu")
from instsearch_tpu.ops.pq import (fit_pq, fit_apq, encode_pq, encode_apq,
                                   pq_lut, unpack_pq)

def unit_rows(rng, n, d, centers, sigma):
    c = rng.standard_normal((centers, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    x = c[rng.integers(0, centers, n)] + sigma*rng.standard_normal((n,d)).astype(np.float32)
    return x/np.linalg.norm(x,axis=1,keepdims=True)

def adc(cb, codes, q, m):
    lut = np.asarray(pq_lut(jnp.asarray(q), cb)); c = np.asarray(unpack_pq(codes))
    mi = np.arange(m)[None,:]
    return np.stack([l[mi,c].sum(-1) for l in lut])

m = 16
for seed in (0,1,2):
    rng = np.random.default_rng(seed)
    x = unit_rows(rng, 4096, 128, 64, 0.25)
    # near-duplicate queries: the instance-retrieval query model
    tgt = rng.integers(0, 4096, 64)
    q = x[tgt] + 0.10*rng.standard_normal((64,128)).astype(np.float32)
    q /= np.linalg.norm(q,axis=1,keepdims=True)
    exact1 = np.argmax(q@x.T, axis=1)
    xj = jnp.asarray(x)
    cb = fit_pq(xj, m=m, iters=8); cp = encode_pq(xj, cb)
    cba = fit_apq(xj, m=m, t=0.2, init_iters=8, sweeps=6); ca = encode_apq(xj, cba, t=0.2)
    s_p, s_a = adc(cb,cp,q,m), adc(cba,ca,q,m)
    t1p = np.mean(np.argmax(s_p,1)==exact1); t1a = np.mean(np.argmax(s_a,1)==exact1)
    # mean |adc - exact| score error at the true argmax item (top-1 bias)
    ex = q@x.T
    be_p = np.mean(np.abs(s_p[np.arange(64),exact1]-ex[np.arange(64),exact1]))
    be_a = np.mean(np.abs(s_a[np.arange(64),exact1]-ex[np.arange(64),exact1]))
    print(f"seed={seed} top1 pq={t1p:.3f} apq={t1a:.3f}  top-item score-err pq={be_p:.4f} apq={be_a:.4f}")
