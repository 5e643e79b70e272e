import numpy as np, jax.numpy as jnp, jax
jax.config.update("jax_platforms", "cpu")
from instsearch_tpu.ops.pq import (fit_pq, fit_apq, encode_pq, encode_apq,
                                   pq_lut, unpack_pq, decode_pq)

def unit_rows(rng, n, d, centers, sigma):
    c = rng.standard_normal((centers, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    x = c[rng.integers(0, centers, n)] + sigma*rng.standard_normal((n,d)).astype(np.float32)
    return x/np.linalg.norm(x,axis=1,keepdims=True)

def setup(seed, n=4096, d=128, centers=64, sigma=0.25, nq=64, k=10):
    rng = np.random.default_rng(seed)
    x = unit_rows(rng, n, d, centers, sigma)
    q = unit_rows(rng, nq, d, centers, sigma)
    exact = np.argsort(-(q@x.T),axis=1)[:,:k]
    return x, q, exact

def rec(cb, codes, q, x, exact, m, depth=100, k=10):
    lut = np.asarray(pq_lut(jnp.asarray(q), cb)); c = np.asarray(unpack_pq(codes))
    mi = np.arange(m)[None,:]
    sc = np.stack([l[mi,c].sum(-1) for l in lut])
    top = np.argsort(-sc,axis=1)[:,:depth]
    return np.mean([len(set(a.tolist())&set(b.tolist()))/k for a,b in zip(top,exact)])

m = 16
for seed in (0,1):
    x,q,exact = setup(seed)
    xj = jnp.asarray(x)
    cb = fit_pq(xj, m=m, iters=8); cp = encode_pq(xj, cb)
    r = x - np.asarray(decode_pq(cp, cb)); mse=float(np.mean(np.sum(r*r,1)))
    print(f"seed={seed} PQ rec={rec(cb,cp,q,x,exact,m):.3f} mse={mse:.3f}")
    for t in (0.05, 0.1, 0.15, 0.2):
        cba = fit_apq(xj, m=m, t=t, init_iters=8, sweeps=6)
        ca = encode_apq(xj, cba, t=t)
        r = x - np.asarray(decode_pq(ca, cba)); mse=float(np.mean(np.sum(r*r,1)))
        pe = float(np.mean(np.sum(r*x,1)**2))
        print(f"  t={t} rec={rec(cba,ca,q,x,exact,m):.3f} mse={mse:.3f} parerr={pe:.4f}")
