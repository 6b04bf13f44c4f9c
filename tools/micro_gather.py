"""Hash-grid block-gather spike (VERDICT round-1 item 6 / ROADMAP item 5).

Measures XLA row-gather throughput from embedding-style tables as a
function of row width and index coherence, to decide whether a block-hash
encoder layout can make imported ngp checkpoints interactive.
"""
import sys
import time
import numpy as np
import jax, jax.numpy as jnp

def dev_timed(fn, *args, R=4, reps=2):
    @jax.jit
    def loop(r, *a):
        def b(i, x):
            return fn(x, *a)
        return jax.lax.fori_loop(0, r, b, jnp.float32(0))
    a = loop(R, *args); a.block_until_ready()
    ts=[]
    for _ in range(reps):
        tq=time.perf_counter(); a=loop(R, *args); _=float(a)
        ts.append((time.perf_counter()-tq)/R)
    return float(np.median(ts))

N = 1 << 18
T = 1 << 19
key = jax.random.PRNGKey(0)
idx_rand = jax.random.randint(key, (N,), 0, T, jnp.int32)
idx_sorted = jnp.sort(idx_rand)
idx_local = (jnp.cumsum(jax.random.randint(key, (N,), 0, 3, jnp.int32))
             % T)   # ray-coherent: mostly-increasing small strides

print(f"N={N/1e6:.2f}M gathers, table {T} rows"); sys.stdout.flush()
for name, idx in (("random", idx_rand), ("sorted", idx_sorted),
                  ("coherent", idx_local)):
    for C in (2, 16, 128):
        table = jax.random.normal(jax.random.PRNGKey(1), (T, C))
        def body(x, tb, ix):
            g = jnp.take(tb, ix + jnp.int32(x*1e-20), axis=0)
            return x + jnp.sum(g[:, 0]) * 1e-12
        t = dev_timed(body, table, idx)
        print(f"  {name:8s} width {C:4d}: {t*1e3:8.2f} ms  "
              f"{N/t/1e9:6.3f} G rows/s  {N*C*4/t/1e9:7.1f} GB/s")
        sys.stdout.flush()

# one-hot matmul gather for a SMALL table (per-level dense low-res grids)
for Ts in (2048, 8192):
    table = jax.random.normal(key, (Ts, 16))
    ids = jax.random.randint(key, (N,), 0, Ts, jnp.int32)
    def body(x, tb, ix):
        oh = (ix[:, None] + jnp.int32(x*1e-20)
              == jnp.arange(Ts)[None, :]).astype(jnp.bfloat16)
        g = oh @ tb.astype(jnp.bfloat16)
        return x + jnp.sum(g[:, 0].astype(jnp.float32)) * 1e-12
    t = dev_timed(body, table, ids)
    print(f"  one-hot matmul T={Ts}: {t*1e3:8.2f} ms  {N/t/1e9:6.3f} G rows/s")
    sys.stdout.flush()
