import time
import numpy as np
import jax, jax.numpy as jnp

A, nIP, P = 1248, 3053, 192
key = jax.random.PRNGKey(0)
p_def = jax.random.uniform(key, (nIP,3), minval=-0.5, maxval=0.5)
pack = jnp.concatenate([p_def, jnp.ones((nIP,13))],1)
origin = jnp.tile(jnp.asarray([[0.,0.,-2.5]]), (A,1))
axis = jnp.tile(jnp.asarray([[0.,0.,1.]]), (A,1))
t0 = jnp.full((A,),1.5); t1 = jnp.full((A,),3.5)

def dev_timed(body, R=16, reps=3):
    @jax.jit
    def loop(r):
        def b(i, x):
            return body(x)
        return jax.lax.fori_loop(0, r, b, jnp.float32(0))
    a = loop(R); a.block_until_ready()
    ts=[]
    for _ in range(reps):
        tq=time.perf_counter(); a = loop(R); _=float(a)
        ts.append((time.perf_counter()-tq)/R)
    return float(np.median(ts))

def beam2(x):
    proj = None; lat2 = None
    for i in range(3):
        rel = p_def[None,:,i] - origin[:,i:i+1] + x*1e-20
        c = rel * axis[:,i:i+1]
        proj = c if proj is None else proj + c
        lat2 = rel*rel if lat2 is None else lat2 + rel*rel
    lat2 = lat2 - proj*proj
    ok = (lat2 < 0.1) & (proj >= t0[:,None]) & (proj <= t1[:,None])
    return x + jnp.sum(ok).astype(jnp.float32)*1e-12
print(f"beam componentwise: {dev_timed(beam2)*1e3:.3f} ms")

proj = jnp.einsum("cnd,cd->cn", p_def[None,:,:] - origin[:,None,:], axis)
ok = (proj >= t0[:,None]) & (proj <= t1[:,None])

def topk(x):
    keyv = jnp.where(ok, -proj + x*1e-20, -jnp.inf)
    v, ids = jax.lax.top_k(keyv, P)
    return x + jnp.sum(ids).astype(jnp.float32)*1e-12
print(f"top_k P=192 over nIP: {dev_timed(topk)*1e3:.3f} ms")

v, ids = jax.lax.top_k(jnp.where(ok, -proj, -jnp.inf), P)
def gather(x):
    cand = pack[ids + jnp.int32(x*1e-20)]
    return x + jnp.sum(cand[:,0,0])*1e-12
print(f"pack row gather [A,P,16]: {dev_timed(gather)*1e3:.3f} ms")

cproj = -v
def bins(x):
    edges = t0[:,None] + jnp.arange(67)[None,:]*0.03 + x*1e-20
    bs = jnp.sum((cproj[:,:,None] < edges[:,None,:]), axis=1)
    return x + jnp.sum(bs).astype(jnp.float32)*1e-12
print(f"bin_start compare+sum: {dev_timed(bins)*1e3:.3f} ms")

def rank_scatter(x):
    rank = jnp.cumsum(ok, axis=1)-1
    take = ok & (rank < P)
    rows = jnp.broadcast_to(jnp.arange(A)[:,None], ok.shape)
    src = jnp.broadcast_to(jnp.arange(nIP,dtype=jnp.int32)[None], ok.shape)
    ids2 = jnp.zeros((A,P), jnp.int32).at[rows, jnp.where(take, rank+jnp.int32(x*1e-20), P)].set(
        jnp.where(take, src, 0), mode="drop")
    return x + jnp.sum(ids2).astype(jnp.float32)*1e-12
print(f"rank-compact scatter (old): {dev_timed(rank_scatter, R=4)*1e3:.3f} ms")
