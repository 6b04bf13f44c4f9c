import time
import numpy as np
import jax, jax.numpy as jnp
from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend
from pienerf_tpu.ops.pallas import field_kernel, tile_kernel
from pienerf_tpu.render import interactive
from pienerf_tpu.sim import solver as sim

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
spec = network.make_spec(bound=1.0, backbone="mlp", compute_dtype="bfloat16")
params = network.init_params(jax.random.PRNGKey(0), spec)
pw = field_kernel.pack_weights(params, spec)
bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1, ip_dx=1.05*dx)
ist = interactive.InteractiveSettings(spec=spec, bend=bst, tile=16, samples=64,
                                      active_frac=0.5, tile_chunk=32, min_near=0.05)
H = W = 800
intr = (1.2*H, 1.2*H, W/2, H/2)
pose = np.eye(4, dtype=np.float32); pose[:3,3] = (0,0,-2.5)
pose_j = jnp.asarray(pose)
state = sim.sim_step(consts, state)
p_def, F, dF = jax.jit(sim.get_ip_info)(consts, state)
pack = beam_bend.pack_for(bst, p_def, consts.ip_pos.astype(jnp.float32), F, dF)

# reproduce prep inputs
A = 1248
T2 = 256
K = 64
bbmin = jnp.min(p_def,0)-1e-3; bbmax = jnp.max(p_def,0)+1e-3
all_tids = jnp.arange(2500, dtype=jnp.int32)
o, d_all = interactive._tile_rays(all_tids, ist, H, W, pose_j, intr)
near_all, far_all = interactive._near_far(o, d_all, bbmin, bbmax, 0.05)
hit = jnp.any(near_all < 1e30, axis=1)
rank = jnp.cumsum(hit)-1
take = hit & (rank < A)
act_ids = jnp.zeros((A,), jnp.int32).at[jnp.where(take, rank, A)].set(
    jnp.where(take, all_tids, 0), mode="drop")
act_n = int(jnp.sum(take))
o_, d = interactive._tile_rays(act_ids, ist, H, W, pose_j, intr)
near, far = interactive._near_far(o_, d, bbmin, bbmax, 0.05)
thit = near < 1e30
t0v = jnp.min(jnp.where(thit, near, jnp.inf), axis=1)
t1v = jnp.max(jnp.where(thit, far, -jnp.inf), axis=1)
anyh = jnp.isfinite(t0v)
t0v = jnp.where(anyh, t0v, 1.0); t1v = jnp.where(anyh, jnp.maximum(t1v, t0v+1e-3), 1.001)
ax = tuple(jnp.mean(d[i],axis=1) for i in range(3))
an = jnp.sqrt(sum(a*a for a in ax))
axis = jnp.stack([ax[i]/an for i in range(3)],1)
origin = jnp.broadcast_to(o, (A,3))
tan_half = jnp.full((A,), 16*0.75/intr[0])

def dev_timed(fn, R=8, reps=3):
    f = jax.jit(fn)
    a = f(jnp.float32(0)); a.block_until_ready()
    ts=[]
    for _ in range(reps):
        tq=time.perf_counter()
        x = jnp.float32(0)
        for _ in range(R): x = f(x)
        _=float(x); ts.append((time.perf_counter()-tq)/R)
    return float(np.median(ts))

def prep_only(x):
    cand, bs, nd, _, _ = tile_kernel.prep_candidates(
        pack, p_def + x*1e-20, origin, axis, tan_half, t0v, t1v,
        n_cand=192, n_bins=K+2, beam_margin=beam_bend.margin_of(bst))
    return x + jnp.sum(cand[:, 0, 0]) * 1e-12 + jnp.sum(bs[:, 0]).astype(jnp.float32)*1e-12
print(f"prep_candidates (A=1248): {dev_timed(prep_only)*1e3:.2f} ms")

cand, bs, nd, _, _ = jax.jit(lambda: tile_kernel.prep_candidates(
    pack, p_def, origin, axis, tan_half, t0v, t1v,
    n_cand=192, n_bins=K+2, beam_margin=beam_bend.margin_of(bst)))()
dirs = jnp.zeros((A, 8, T2), jnp.float32)
for i in range(3): dirs = dirs.at[:, i, :].set(d[i])
tsc = jnp.zeros((A, 8), jnp.float32).at[:,0].set(t0v).at[:,1].set(t1v).at[:,2].set(anyh.astype(jnp.float32))
pars = jnp.zeros((24,), jnp.float32).at[0:3].set(o).at[3:6].set(bbmin).at[6:9].set(bbmax)\
    .at[9].set(1e-2).at[10].set(1.0).at[11].set(bst.ip_dx).at[12].set(0.05)

def kern_only(x):
    out = tile_kernel.render_tiles(spec, pw, tsc, bs, pars + x*1e-20, dirs, cand,
                                   K=K, Ks=16, Ksb=4, Wn=32, num_seek=3,
                                   deformed=True, cut=False, interpret=False)
    return x + jnp.sum(out[:, 4, :]) * 1e-12
print(f"render_tiles deformed: {dev_timed(kern_only, R=6)*1e3:.2f} ms")

def kern_static(x):
    out = tile_kernel.render_tiles(spec, pw, tsc, bs, pars + x*1e-20, dirs, cand,
                                   K=K, Ks=16, Ksb=4, Wn=32, num_seek=3,
                                   deformed=False, cut=False, interpret=False)
    return x + jnp.sum(out[:, 4, :]) * 1e-12
print(f"render_tiles static: {dev_timed(kern_static, R=6)*1e3:.2f} ms")

# all-inactive (skip test): zero active
tsc0 = tsc.at[:, 2].set(0.0)
def kern_skip(x):
    out = tile_kernel.render_tiles(spec, pw, tsc0, bs, pars + x*1e-20, dirs, cand,
                                   K=K, Ks=16, Ksb=4, Wn=32, num_seek=3,
                                   deformed=True, cut=False, interpret=False)
    return x + jnp.sum(out[:, 4, :]) * 1e-12
print(f"render_tiles all-skipped: {dev_timed(kern_skip, R=6)*1e3:.2f} ms")
print("act_n:", act_n)
