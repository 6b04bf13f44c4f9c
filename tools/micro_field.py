import time
import numpy as np
import jax, jax.numpy as jnp
from pienerf_tpu.models import network
from pienerf_tpu.ops.pallas import field_kernel

spec = network.make_spec(bound=1.0, backbone="mlp", compute_dtype="bfloat16")
params = network.init_params(jax.random.PRNGKey(0), spec)
pw = field_kernel.pack_weights(params, spec)

for N in (8192*64, 8192*256, 8192*1024):
    key = jax.random.PRNGKey(0)
    xs = jax.random.uniform(key, (3, N), minval=-1, maxval=1)
    ds_ = jax.random.normal(key, (3, N))

    @jax.jit
    def loop(x, r):
        def body(i, carry):
            x, acc = carry
            s, rgb = field_kernel.field_eval(pw, spec, (x[0]+acc*1e-20, x[1], x[2]),
                                             (ds_[0], ds_[1], ds_[2]), block_n=8192)
            return (x, acc + jnp.sum(s[:8]))
        x, acc = jax.lax.fori_loop(0, r, body, (x, jnp.float32(0)))
        return acc

    R = 8
    a = loop(xs, R); a.block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        a = loop(xs, R)
        _ = float(a)
        ts.append((time.perf_counter()-t0)/R)
    t = float(np.median(ts))
    flops = N*5*2*64*64
    print(f"N={N/1e6:.2f}M: {t*1e3:.2f} ms/call  {flops/t/1e12:.1f} TFLOP/s  {N/t/1e6:.0f} Msamp/s")
