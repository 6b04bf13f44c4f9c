import time
import numpy as np
import jax, jax.numpy as jnp
from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend
from pienerf_tpu.render import interactive
from pienerf_tpu.sim import solver as sim

def dev_timed(make_loop, R=8, reps=3):
    loop = jax.jit(make_loop)
    a = loop(R); a.block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); a = loop(R); _ = float(a)
        ts.append((time.perf_counter()-t0)/R)
    return float(np.median(ts))

r0, dx = 0.45, 0.05
c = np.arange(-r0, r0+1e-6, dx)
xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
pts = pts[np.linalg.norm(pts, axis=1) <= r0]
n = pts.shape[0]
consts, state, aux = sim.sim_init(
    pts, np.full(n, 0.1), np.full(n, 1e5), np.full(n, 1e5),
    np.zeros(n, bool), dt=1e-2, iters=10,
    bbox=np.array([2.0,2.0,2.0]), kres=7, dx=dx,
    gravity=(0.,0.,0.), stiff=1e5, base=np.array([-1.,-1.,-1.]))
n_ip = consts.ip_pos.shape[0]; n_k = consts.dof_rest.shape[0]
print(f"nIP={n_ip} nK={n_k}")

# full sim step chained
def mk_sim(R):
    def body(i, s):
        return sim.sim_step(consts, s)
    return jax.lax.fori_loop(0, R, body, state).ddof.sum()
print(f"sim_step(10 iters): {dev_timed(mk_sim)*1e3:.2f} ms")

# stage: elastic rhs (the per-iteration body minus matmul)
def mk_elastic(R):
    def body(i, x):
        r = sim.rhs_elastic_delta(consts, state.ddof + x*1e-20)
        return x + r.sum()
    return jax.lax.fori_loop(0, R, body, jnp.float32(0))
print(f"  rhs_elastic_delta x1: {dev_timed(mk_elastic, R=40)*1e3:.3f} ms")

def mk_F(R):
    def body(i, x):
        F = sim.deformation_gradients(consts, state.ddof + x*1e-20)
        return x + F.sum()
    return jax.lax.fori_loop(0, R, body, jnp.float32(0))
print(f"  deformation_gradients x1: {dev_timed(mk_F, R=40)*1e3:.3f} ms")

def mk_svd(R):
    from pienerf_tpu.sim.svd3 import svd3x3
    F0 = sim.deformation_gradients(consts, state.ddof)
    def body(i, x):
        U,S,Vt = svd3x3(F0 + x*1e-20)
        return x + S.sum()
    return jax.lax.fori_loop(0, R, body, jnp.float32(0))
print(f"  svd3x3 x1: {dev_timed(mk_svd, R=40)*1e3:.3f} ms")

def mk_mm(R):
    dim = n_k*10
    def body(i, x):
        r = consts.global_inv @ (state.ddof.reshape(dim,3) + x*1e-20)
        return x + r.sum()
    return jax.lax.fori_loop(0, R, body, jnp.float32(0))
print(f"  global_inv matmul x1: {dev_timed(mk_mm, R=40)*1e3:.3f} ms")

def mk_seg(R):
    contrib = jnp.ones((n_ip*8, 10, 3))
    segs = consts.IP_kernel.reshape(-1)
    def body(i, x):
        r = jax.ops.segment_sum(contrib + x*1e-20, segs, num_segments=n_k)
        return x + r.sum()
    return jax.lax.fori_loop(0, R, body, jnp.float32(0))
print(f"  segment_sum x1: {dev_timed(mk_seg, R=40)*1e3:.3f} ms")

def mk_gather(R):
    def body(i, x):
        g = (state.ddof + x*1e-20)[consts.IP_kernel]
        return x + g.sum()
    return jax.lax.fori_loop(0, R, body, jnp.float32(0))
print(f"  ddof gather x1: {dev_timed(mk_gather, R=40)*1e3:.3f} ms")

# --- bending per chunk
spec = network.make_spec(bound=1.0, backbone="mlp", compute_dtype="bfloat16")
bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1, ip_dx=1.05*dx)
ist = interactive.InteractiveSettings(spec=spec, bend=bst, tile=16, samples=64,
                                      active_frac=0.5, tile_chunk=32, min_near=0.05)
H = W = 800
intr = (1.2*H, 1.2*H, W/2, H/2)
pose = np.eye(4, dtype=np.float32); pose[:3,3] = (0,0,-2.5)
pose_j = jnp.asarray(pose)
p_def, F, dF = jax.jit(sim.get_ip_info)(consts, state)
pack = beam_bend.pack_for(bst, p_def, consts.ip_pos.astype(jnp.float32), F, dF)

C, T2, K = 32, 256, 64
tids = jnp.arange(C, dtype=jnp.int32) + 1250
o_, d = interactive._tile_rays(tids, ist, H, W, pose_j, intr)
t0v = jnp.full((C,), 1.5); t1v = jnp.full((C,), 3.5)
kk = (jnp.arange(K, dtype=jnp.float32)+0.5)/K
tvals = t0v[:,None] + (t1v-t0v)[:,None]*kk[None,:]
xs = tuple(o_[i] + tvals[:,None,:]*d[i][:,:,None] for i in range(3))
axis = jnp.stack([jnp.mean(d[i],axis=1) for i in range(3)],1)
axis = axis/jnp.linalg.norm(axis,axis=1,keepdims=True)
origin = jnp.broadcast_to(o_, (C,3))
tan_half = jnp.full((C,), 16*0.75/intr[0])

cand, proj, m = beam_bend.select_tile_candidates(bst, pack, p_def, origin, axis, tan_half, t0v, t1v)
bins = beam_bend.bin_candidates(bst, cand, proj, m, t0v, (t1v-t0v)/K, K+2)

def mk_sel(R):
    def body(i, x):
        cand, proj, mm = beam_bend.select_tile_candidates(
            bst, pack, p_def + x*1e-20, origin, axis, tan_half, t0v, t1v)
        b = beam_bend.bin_candidates(bst, cand, proj, mm, t0v, (t1v-t0v)/K, K+2)
        return x + b.sum()
    return jax.lax.fori_loop(0, R, body, jnp.float32(0))
print(f"select+bin /chunk32: {dev_timed(mk_sel, R=20)*1e3:.3f} ms")

def mk_bend(R):
    def body(i, x):
        xm, found = beam_bend.bend_tile_samples(
            bst, bins, tuple(xs[j] + x*1e-20 for j in range(3)))
        return x + xm[0].sum() + xm[1].sum() + xm[2].sum()
    return jax.lax.fori_loop(0, R, body, jnp.float32(0))
print(f"bend_tile_samples /chunk32: {dev_timed(mk_bend, R=20)*1e3:.3f} ms")
