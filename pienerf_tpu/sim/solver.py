"""Q-GMLS meshless hyperelasticity simulator, TPU-native.

Architecture (vs. reference simulator/solver.py:12-617):
- One-time init (`sim_init`) runs in float64 numpy on host: grid/kernel-node
  binning, GMLS shape functions, dense global-matrix assembly via bincount
  (instead of 6400-thread atomic scatter, cuda_utils.py:22-55), masked
  regularized inverse.
- Per-step physics (`sim_step`) is a pure jitted function over a pytree
  state: batched deformation gradients, batched 3x3 SVD with the
  volume-invariant projection, segment-sum right-hand-side assembly, and a
  single precomputed-inverse matmul per local-global iteration
  (reference: solver.py:595-602).

Delta formulation. The reference runs float64 end-to-end and computes
``rhs = M/dt^2 (dof + dt v) + f + g + E(dof) - (E(rest) + M/dt^2 dof_rest)``
which cancels O(1e4) terms — catastrophic in float32. We store the state as
``delta = dof - dof_rest`` and use the algebraically identical

    rhs = M/dt^2 (delta + dt v) + f + g + [E(dof) - E(rest)]

where the elastic difference is formed per integration point as
``dx^3 (mu (R - I) + lam (V - I))`` (exactly zero at rest), so every per-step
quantity is O(deformation) and float32 is sufficient on TPU. Verified against
a float64 oracle in tests/test_solver.py.

Conventions (self-consistent with ops/bending.py):
- dof [K, 10, 3]: 10 generalized coordinates per kernel node per dim.
- F [n, 3, 3] with F[d, c] = d phi_d / d p_c.
- dF [n, 3, 3, 3] with dF[j, d, c] = d^2 phi_d / (d p_c d p_j).
"""

from __future__ import annotations


from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pienerf_tpu.io.ply import read_physics_ply, write_ply
from pienerf_tpu.sim import gmls
from pienerf_tpu.sim.svd3 import corotated_delta, svd3x3

# Physics matmuls must run at true f32. JAX's DEFAULT f32 matmul precision
# on TPU is a single bf16 pass; under it the integrator NaNs within ~40
# steps on configs that are provably stable in f32/f64
# (tools/precision_probe.py: DEFAULT diverges by t=0.2, HIGHEST reproduces
# the CPU trajectory exactly). All jitted contractions below pass this
# explicitly; the renderer's bf16 MLPs are a deliberate, separate choice.
_HI = jax.lax.Precision.HIGHEST

# IP count below which sim_init also builds the dense assembly operator
# (measured crossover, tools/sim_ab_dense.py / runs/sim_ab_dense*.json:
# dense is ~13% faster at 4.6k IPs, ~15% slower at 12k; B is 50 MB at
# 4.6k and grows as nIP * n_k * 30 floats)
DENSE_IP_THRESHOLD = 6000


class SimConstants(NamedTuple):
    """Immutable per-scene data produced by sim_init (device arrays)."""
    global_inv: jax.Array      # [10K, 10K] masked regularized inverse
    mass_invt2: jax.Array      # [10K, 10K] mass matrix / dt^2 (scalar form)
    # Cell-chunked block-sparse F-assembly operator (round 4; replaces the
    # dense B [3*nIP, 10K] whose rows were 97%+ structural zeros — 2 GB and
    # pure HBM-bandwidth at 50k IPs). Every IP in a kernel cell shares the
    # SAME 8 kernel nodes (ip_kernel is a function of ip2k alone), so IPs
    # sorted by cell and split into <=S-row chunks give exact dense blocks:
    #   F_delta[chunk k] = Dc[k] @ ddof[chunk_nodes[k]]   (batched MXU)
    #   rhs += Dc[k]^T @ dP[chunk k]                       (batched MXU +
    #                                                       segment_sum)
    # Storage is nIP*240 floats + one partial chunk per cell — 55 MB at
    # 50k IPs vs 2 GB dense; per-iteration HBM traffic drops ~40x.
    Dc: jax.Array              # [C, S, 3, 80] per-chunk dNx blocks,
    #   Dc[k, s, j, i*10+a] = IP_dNx[ip(k,s), i, j, a]; zero rows pad
    chunk_nodes: jax.Array     # [C, 8] int32 kernel-node ids per chunk
    chunk_mu: jax.Array        # [C, S] mu per chunk row (0 at padding)
    chunk_lam: jax.Array       # [C, S] lam per chunk row (0 at padding)
    rhs_gravity: jax.Array     # [K, 10, 3]
    dof_rest: jax.Array        # [K, 10, 3]
    ip_pos: jax.Array          # [nIP, 3] rest IP positions
    IP_kernel: jax.Array       # [nIP, 8] int32
    IP_Nx: jax.Array           # [nIP, 8, 10]
    IP_dNx: jax.Array          # [nIP, 8, 3, 10]
    IP_ddNx: jax.Array         # [nIP, 8, 3, 3, 10]
    IP_mu: jax.Array           # [nIP]
    IP_lam: jax.Array          # [nIP]
    IP_rho: jax.Array          # [nIP]
    pts_rest: jax.Array        # [npts, 3] rest material-point positions
    pts_kernel: jax.Array      # [npts, 8] int32
    pts_Nx: jax.Array          # [npts, 8, 10]
    dt: float
    dx: float
    iters: int
    # Dense [3*nIP, 10K] F-assembly operator, present only for SMALL scenes
    # (round-5: the chunked form costs ~13% at the 3-5k-IP bench scale —
    # node gather + segment_sum overhead the dense matmul doesn't pay —
    # and wins ~15% by 12k where its 10x-smaller HBM traffic dominates;
    # tools/sim_ab_dense.py, runs/sim_ab_dense*.json). sim_init auto-
    # selects by IP count; rhs_elastic_delta dispatches on presence.
    #   B[j*nIP + v, k*10 + a] = sum_i dNx[v, i, j, a] [IP_kernel[v,i]==k]
    B: Optional[jax.Array] = None


class SimState(NamedTuple):
    """Mutable simulation state. ddof = dof - dof_rest (see module doc)."""
    ddof: jax.Array            # [K, 10, 3]
    dof_vel: jax.Array         # [K, 10, 3]
    dof_f: jax.Array           # [K, 10, 3]


# ---------------------------------------------------------------------------
# init (host, float64 numpy)
# ---------------------------------------------------------------------------

def _corner_offsets() -> np.ndarray:
    """Bit order matches reference: x = S>>2&1, y = S>>1&1, z = S&1
    (solver.py:193-233)."""
    return np.array([[(s >> 2) & 1, (s >> 1) & 1, s & 1] for s in range(8)],
                    dtype=np.int64)


def _assemble_scalar_matrix(
    dim: int, topo: np.ndarray, blocks: np.ndarray
) -> np.ndarray:
    """Scatter-add [n, 8, 10, 8, 10] blocks into a dense [dim, dim] matrix.

    Replaces the reference's atomicAdd assembly (cuda_utils.py:22-55) with a
    deterministic bincount.
    """
    n = topo.shape[0]
    rows = (topo[:, :, None] * 10 + np.arange(10)[None, None, :]).reshape(n, 80)
    flat = rows[:, :, None] * dim + rows[:, None, :]           # [n, 80, 80]
    mat = np.bincount(
        flat.reshape(-1), weights=blocks.reshape(-1), minlength=dim * dim
    )
    return mat.reshape(dim, dim)


def _elastic_blocks(dx: float, dt: float, mu: np.ndarray, lam: np.ndarray,
                    rho: np.ndarray, Nx: np.ndarray, dNx: np.ndarray,
                    ddNx: np.ndarray) -> np.ndarray:
    """Per-IP [80, 80] stiffness/mass blocks (cuda_utils.py:22-55).

    term0: rho dx^3 / dt^2 * N_i[x] N_j[y]
    term1: dx^3 (rho dx^2 / 12 dt^2 + mu + lam) * sum_p dN_p,i[x] dN_p,j[y]
    term2: dx^5 (mu + lam) / 12 * sum_pq ddN_pq,i[x] ddN_pq,j[y]
    """
    n = Nx.shape[0]
    N = Nx.reshape(n, 1, 80)                     # [n, 1, 8*10]
    dN = dNx.transpose(0, 2, 1, 3).reshape(n, 3, 80)
    ddN = ddNx.transpose(0, 2, 3, 1, 4).reshape(n, 9, 80)

    c0 = rho * dx**3 / dt**2
    c1 = dx**3 * (rho * dx**2 / 12.0 / dt**2 + mu + lam)
    c2 = dx**5 * (mu + lam) / 12.0

    # ONE batched BLAS dgemm instead of three n x 80 x 80 einsum passes:
    # all three terms are Gram matrices S^T S of per-IP row stacks, and
    # the coefficients are non-negative, so sqrt(c) folds into the rows.
    # Measured (tools/profile_sim_init.py, 25k IPs): the einsum version
    # was 950 s of the 1134 s init; this is seconds.
    S = np.concatenate([
        np.sqrt(c0)[:, None, None] * N,
        np.sqrt(c1)[:, None, None] * dN,
        np.sqrt(c2)[:, None, None] * ddN,
    ], axis=1)                                   # [n, 13, 80]
    return np.matmul(S.transpose(0, 2, 1), S)    # [n, 80, 80]


def _pin_blocks(stiff: float, Nx_pin: np.ndarray) -> np.ndarray:
    """Dirichlet penalty blocks for pinned points (cuda_utils.py:58-81)."""
    n = Nx_pin.shape[0]
    N = Nx_pin.reshape(n, 1, 80)
    return stiff * np.matmul(N.transpose(0, 2, 1), N)


def volume_invariant_project_np(sig: np.ndarray) -> np.ndarray:
    """3 fixed Gauss-Newton steps projecting singular values to det = 1
    (reference: simulator/func_utils.py:22-40)."""
    D = np.zeros_like(sig)
    for _ in range(3):
        s = sig + D
        C = s[..., 0] * s[..., 1] * s[..., 2] - 1.0
        dC = np.stack(
            [s[..., 1] * s[..., 2], s[..., 0] * s[..., 2], s[..., 0] * s[..., 1]],
            axis=-1,
        )
        coef = (np.sum(dC * D, -1) - C) / np.sum(dC * dC, -1)
        D = coef[..., None] * dC
    return sig + D


def _rhs_elastic_np(dx, IP_kernel, IP_mu, IP_lam, IP_dNx, dof, n_nodes):
    """float64 oracle of the (absolute) elastic rhs, for tests."""
    dof_g = dof[IP_kernel]                                     # [n,8,10,3]
    F = np.einsum("vija,viad->vdj", IP_dNx, dof_g)             # [n,3,3]
    U, S, Vt = np.linalg.svd(F)
    R = U @ Vt
    Sp = volume_invariant_project_np(S)
    V = U @ (Sp[..., None] * Vt)
    P = dx**3 * (IP_mu[:, None, None] * R + IP_lam[:, None, None] * V)
    contrib = np.einsum("vdj,vijx->vixd", P, IP_dNx)           # [n,8,10,3]
    out = np.zeros((n_nodes, 10, 3))
    np.add.at(out, IP_kernel.reshape(-1), contrib.reshape(-1, 10, 3))
    return out


def sim_init(
    pos: np.ndarray,
    mass: np.ndarray,
    mu: np.ndarray,
    lam: np.ndarray,
    is_pin: np.ndarray,
    dt: float = 1e-2,
    iters: int = 20,
    bbox: Optional[np.ndarray] = None,
    kres: int = 7,
    dx: float = 1.0,
    gravity: Tuple[float, float, float] = (0.0, -9.8, 0.0),
    stiff: float = 1e5,
    base: Optional[np.ndarray] = None,
    dtype=jnp.float32,
    dense_operator: Optional[bool] = None,
) -> Tuple[SimConstants, SimState, dict]:
    """Build all per-scene constants. Mirrors reference solver.py:139-331.

    Returns (constants, initial state, aux dict with host-side metadata).
    """
    pos = np.asarray(pos, np.float64)
    mass = np.asarray(mass, np.float64)
    mu = np.asarray(mu, np.float64)
    lam = np.asarray(lam, np.float64)
    is_pin = np.asarray(is_pin, bool)
    bbox = np.asarray(bbox if bbox is not None else [1.0, 1.0, 1.0], np.float64) * 1.02
    base = np.asarray(base if base is not None else [-0.5, -0.5, -0.5], np.float64) * 1.01
    gravity = np.asarray(gravity, np.float64)

    res = (bbox // dx).astype(np.int64)                         # solver.py:32

    # --- IP grid: occupied cells of the (bbox/dx) lattice (solver.py:141-177)
    grid_idx = np.clip(((pos - base) // dx).astype(np.int64), 0, res - 1)
    ip_mask = np.zeros(tuple(res), bool)
    ip_mask[grid_idx[:, 0], grid_idx[:, 1], grid_idx[:, 2]] = True
    n_ip = int(ip_mask.sum())
    ip_idx = -np.ones(tuple(res), np.int64)
    ip_idx[ip_mask] = np.arange(n_ip)
    pts_ip = ip_idx[grid_idx[:, 0], grid_idx[:, 1], grid_idx[:, 2]]
    ip_grid = np.argwhere(ip_mask)                              # [nIP, 3]
    ip_pos = (ip_grid + 0.5) * dx + base

    # --- kernel-node grid (solver.py:179-248)
    kdx = float(res.max() * dx) / (kres - 1)
    corners = _corner_offsets()
    ip2k = np.clip(((ip_pos - base) // kdx).astype(np.int64), 0, kres - 2)
    pts2k = np.clip(((pos - base) // kdx).astype(np.int64), 0, kres - 2)

    kmask = np.zeros((kres, kres, kres), bool)
    cells = ip2k[:, None, :] + corners[None]                    # [nIP, 8, 3]
    kmask[cells[..., 0], cells[..., 1], cells[..., 2]] = True
    n_k = int(kmask.sum())
    kidx = np.zeros((kres, kres, kres), np.int64)
    kidx[kmask] = np.arange(n_k)

    ip_kernel = kidx[cells[..., 0], cells[..., 1], cells[..., 2]].astype(np.int32)
    pcells = pts2k[:, None, :] + corners[None]
    pts_kernel = kidx[pcells[..., 0], pcells[..., 1], pcells[..., 2]].astype(np.int32)

    kernel_grid = np.argwhere(kmask)
    kernel_pos = kernel_grid * kdx + base

    # --- GMLS shape functions (solver.py:250-252, init_GMLS)
    pts_Nx, pts_dNx, pts_ddNx = gmls.shape_functions(pos, pts_kernel, kernel_pos, kdx)
    IP_Nx, IP_dNx, IP_ddNx = gmls.shape_functions(ip_pos, ip_kernel, kernel_pos, kdx)

    # --- mass-weighted per-IP material params (solver.py:427-450)
    w_mass = np.bincount(pts_ip, weights=mass, minlength=n_ip)
    IP_mu = np.bincount(pts_ip, weights=mu * mass, minlength=n_ip) / w_mass
    IP_lam = np.bincount(pts_ip, weights=lam * mass, minlength=n_ip) / w_mass
    IP_rho = w_mass / dx**3

    # --- global matrix: assemble, mask to active rows, regularize, invert
    #     (solver.py:453-511)
    dim = n_k * 10
    blocks = _elastic_blocks(dx, dt, IP_mu, IP_lam, IP_rho, IP_Nx, IP_dNx, IP_ddNx)
    mat = _assemble_scalar_matrix(dim, ip_kernel, blocks)
    if is_pin.any():
        mat += _assemble_scalar_matrix(
            dim, pts_kernel[is_pin], _pin_blocks(stiff, pts_Nx[is_pin])
        )

    active_nodes = np.diag(mat)[0::10] > 0.0
    act = np.repeat(active_nodes, 10)
    sub = mat[np.ix_(act, act)]
    sub[np.diag_indices_from(sub)] += 1e-3
    sub_inv = np.linalg.inv(sub)
    global_inv = np.zeros((dim, dim))
    global_inv[np.ix_(act, act)] = sub_inv

    # --- mass matrix / dt^2 (mu = lam = 0) (solver.py:513-538)
    mblocks = _elastic_blocks(
        dx, dt, np.zeros(n_ip), np.zeros(n_ip), IP_rho, IP_Nx, IP_dNx, IP_ddNx
    )
    mass_invt2 = _assemble_scalar_matrix(dim, ip_kernel, mblocks)

    # --- rest dof: identity map (solver.py:258-267)
    dof_rest = np.zeros((n_k, 10, 3))
    dof_rest[:, 0, :] = kernel_pos
    for j in range(3):
        dof_rest[:, 1 + j, j] = 1.0

    # --- gravity rhs (solver.py:316-331)
    m_ip = IP_rho * dx**3
    grav_contrib = (m_ip[:, None, None, None] * IP_Nx[..., None]
                    * gravity[None, None, None, :])             # [nIP,8,10,3]
    rhs_gravity = np.zeros((n_k, 10, 3))
    np.add.at(rhs_gravity, ip_kernel.reshape(-1), grav_contrib.reshape(-1, 10, 3))

    # --- cell-chunked F-assembly operator (see SimConstants.Dc)
    cell_id = (ip2k[:, 0] * (kres - 1) + ip2k[:, 1]) * (kres - 1) + ip2k[:, 2]
    order = np.argsort(cell_id, kind="stable")
    _, cell_counts = np.unique(cell_id, return_counts=True)
    # chunk row count: pick the S (multiple of 8, <=128) minimizing total
    # padded rows — sizing from the single densest cell pads every chunk
    # to that cell's count (ADVICE r4); dense outliers instead split into
    # multiple chunks, which the assembly below already supports.
    cmax = int(cell_counts.max())
    cands = [s for s in range(8, 136, 8) if s <= max(8, -(-cmax // 8) * 8)]
    padded = {s: int((-(-cell_counts // s)).sum() * s) for s in cands}
    best = min(padded.values())
    S = max(s for s in cands if padded[s] <= 1.1 * best)
    chunk_rows = []                 # list of [<=S] IP-index arrays
    lo = 0
    for c in cell_counts:
        members = order[lo:lo + c]
        lo += c
        for s0 in range(0, c, S):
            chunk_rows.append(members[s0:s0 + S])
    C = len(chunk_rows)
    Dc = np.zeros((C, S, 3, 80))
    chunk_nodes = np.zeros((C, 8), np.int32)
    chunk_mu = np.zeros((C, S))
    chunk_lam = np.zeros((C, S))
    for k, v in enumerate(chunk_rows):
        n = len(v)
        chunk_nodes[k] = ip_kernel[v[0]]        # shared across the cell
        # [n, 8, 3, 10] -> [n, 3, 8, 10] -> [n, 3, 80]; flat col = i*10+a
        Dc[k, :n] = IP_dNx[v].transpose(0, 2, 1, 3).reshape(n, 3, 80)
        chunk_mu[k, :n] = IP_mu[v]
        chunk_lam[k, :n] = IP_lam[v]

    # --- dense operator for small scenes (see SimConstants.B): below the
    # measured crossover the two batched chunk matmuls + node gather +
    # segment_sum cost more than one dense bandwidth-trivial matmul
    # (tools/sim_ab_dense.py: dense +13% at 4.6k IPs, -15% at 12k)
    if dense_operator is None:
        dense_operator = n_ip <= DENSE_IP_THRESHOLD
    Bop = None
    if dense_operator:
        Bop = np.zeros((3 * n_ip, dim))
        bcols = (ip_kernel[:, :, None] * 10
                 + np.arange(10)[None, None, :]).reshape(n_ip, 80)
        bvrows = np.repeat(np.arange(n_ip)[:, None], 80, axis=1)
        for j in range(3):
            np.add.at(Bop, (j * n_ip + bvrows, bcols),
                      IP_dNx[:, :, j, :].reshape(n_ip, 80))

    # rest positions reconstructed through the shape functions (float64) so
    # that p_def = pts_rest + sum(Nx * ddof) is exact at rest
    dof_rest_g = dof_rest[ip_kernel]
    ip_rest = np.einsum("via,viad->vd", IP_Nx, dof_rest_g)
    pts_rest = np.einsum("via,viad->vd", pts_Nx, dof_rest[pts_kernel])

    consts = SimConstants(
        global_inv=jnp.asarray(global_inv, dtype),
        mass_invt2=jnp.asarray(mass_invt2, dtype),
        Dc=jnp.asarray(Dc, dtype),
        chunk_nodes=jnp.asarray(chunk_nodes),
        chunk_mu=jnp.asarray(chunk_mu, dtype),
        chunk_lam=jnp.asarray(chunk_lam, dtype),
        rhs_gravity=jnp.asarray(rhs_gravity, dtype),
        dof_rest=jnp.asarray(dof_rest, dtype),
        ip_pos=jnp.asarray(ip_rest, dtype),
        IP_kernel=jnp.asarray(ip_kernel),
        IP_Nx=jnp.asarray(IP_Nx, dtype),
        IP_dNx=jnp.asarray(IP_dNx, dtype),
        IP_ddNx=jnp.asarray(IP_ddNx, dtype),
        IP_mu=jnp.asarray(IP_mu, dtype),
        IP_lam=jnp.asarray(IP_lam, dtype),
        IP_rho=jnp.asarray(IP_rho, dtype),
        pts_rest=jnp.asarray(pts_rest, dtype),
        pts_kernel=jnp.asarray(pts_kernel),
        pts_Nx=jnp.asarray(pts_Nx, dtype),
        dt=float(dt),
        dx=float(dx),
        iters=int(iters),
        B=None if Bop is None else jnp.asarray(Bop, dtype),
    )
    state = SimState(
        ddof=jnp.zeros_like(consts.dof_rest),
        dof_vel=jnp.zeros_like(consts.dof_rest),
        dof_f=jnp.zeros_like(consts.dof_rest),
    )
    aux = dict(
        ip_pos=ip_pos, kernel_pos=kernel_pos, pts_ip=pts_ip, res=res,
        kdx=kdx, n_ip=n_ip, n_k=n_k, active_nodes=active_nodes,
        pts_dNx=pts_dNx, pts_ddNx=pts_ddNx, is_pin=is_pin, pos=pos,
    )
    return consts, state, aux


_CACHE_VERSION = 3    # v3: optional dense B back for small scenes (auto)


def _sim_cache_key(pos, mass, mu, lam, is_pin, kw) -> str:
    """Content hash of every sim_init input (round-3 item 5: the one-time
    f64 precompute costs 140-410 s at 24k IPs; cache it per scene)."""
    import hashlib

    h = hashlib.sha256()
    h.update(str(_CACHE_VERSION).encode())
    for a in (pos, mass, mu, lam, is_pin):
        arr = np.ascontiguousarray(np.asarray(a))
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    for k in sorted(kw):
        v = kw[k]
        if isinstance(v, np.ndarray):
            h.update(f"{k}={v.tolist()}".encode())
        else:
            h.update(f"{k}={v}".encode())
    return h.hexdigest()[:24]


def sim_init_cached(pos, mass, mu, lam, is_pin, cache_dir: str,
                    **kw) -> Tuple[SimConstants, SimState, dict]:
    """sim_init with a content-addressed npz cache.

    A cache hit rebuilds SimConstants/SimState/aux from disk in seconds
    instead of re-running the f64 GMLS + assembly + dense inverse. The key
    covers every input (point data and all scalars), so edited PLYs or
    changed solver params never collide.
    """
    import os

    dtype = kw.get("dtype", jnp.float32)
    key_kw = dict(kw)
    key_kw["dtype"] = np.dtype(dtype).name
    key = _sim_cache_key(pos, mass, mu, lam, is_pin, key_kw)
    path = os.path.join(cache_dir, f"simconsts_{key}.npz")
    if os.path.exists(path):
        z = np.load(path, allow_pickle=False)
        fields = {}
        for name in SimConstants._fields:
            v = z[f"c_{name}"]
            if name == "B" and v.size == 0:
                fields[name] = None          # size-0 sentinel = no dense op
            else:
                fields[name] = (v.item() if v.ndim == 0
                                else jnp.asarray(v))
        consts = SimConstants(**fields)
        state = SimState(
            ddof=jnp.zeros_like(consts.dof_rest),
            dof_vel=jnp.zeros_like(consts.dof_rest),
            dof_f=jnp.zeros_like(consts.dof_rest),
        )
        aux = {k[2:]: z[k] for k in z.files if k.startswith("a_")}
        return consts, state, aux

    consts, state, aux = sim_init(pos, mass, mu, lam, is_pin, **kw)
    os.makedirs(cache_dir, exist_ok=True)
    payload = {}
    for name in SimConstants._fields:
        v = getattr(consts, name)
        if v is None:                        # absent dense B
            v = np.zeros((0,), np.float32)
        payload[f"c_{name}"] = np.asarray(v)
    for k, v in aux.items():
        payload[f"a_{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"   # np.savez appends .npz unless present
    np.savez(tmp, **payload)
    os.replace(tmp, path)
    return consts, state, aux


def cast_B_bf16(consts: SimConstants) -> SimConstants:
    """Opt-in bf16 storage of the chunked assembly operator: halves its
    HBM traffic; see rhs_elastic_delta for the accuracy argument and
    tests/test_solver.py for the trajectory check. (With the chunked
    operator the traffic is ~40x smaller to begin with, so this is now a
    memory knob more than a speed knob.)"""
    consts = consts._replace(Dc=consts.Dc.astype(jnp.bfloat16))
    if consts.B is not None:
        consts = consts._replace(B=consts.B.astype(jnp.bfloat16))
    return consts


# ---------------------------------------------------------------------------
# per-step physics (jitted)
# ---------------------------------------------------------------------------

def volume_invariant_project(sig: jax.Array) -> jax.Array:
    """JAX twin of volume_invariant_project_np (func_utils.py:22-40)."""
    D = jnp.zeros_like(sig)
    for _ in range(3):
        s = sig + D
        C = s[..., 0] * s[..., 1] * s[..., 2] - 1.0
        dC = jnp.stack(
            [s[..., 1] * s[..., 2], s[..., 0] * s[..., 2], s[..., 0] * s[..., 1]],
            axis=-1,
        )
        coef = (jnp.sum(dC * D, -1) - C) / jnp.sum(dC * dC, -1)
        D = coef[..., None] * dC
    return sig + D


def deformation_gradients(consts: SimConstants, ddof: jax.Array) -> jax.Array:
    """Batched F at every IP: F[v, d, j] = d phi_d / d p_j = I + dNx . ddof."""
    ddof_g = ddof[consts.IP_kernel]                            # [n,8,10,3]
    dF = jnp.einsum("vija,viad->vdj", consts.IP_dNx, ddof_g, precision=_HI)
    return dF + jnp.eye(3, dtype=ddof.dtype)


def _rhs_elastic_delta_dense(consts: SimConstants,
                             ddof: jax.Array) -> jax.Array:
    """Small-scene variant of rhs_elastic_delta through the dense B
    operator (identical math; see SimConstants.B). Parity vs the chunked
    form is 2e-7 relative (tools/sim_ab_dense.py) and oracle-tested in
    tests/test_solver.py."""
    n_k = ddof.shape[0]
    B = consts.B
    n_ip = consts.IP_mu.shape[0]
    if B.dtype == jnp.bfloat16:
        Fd = jax.lax.dot_general(
            B, ddof.reshape(n_k * 10, 3).astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        Fd = jnp.matmul(B, ddof.reshape(n_k * 10, 3), precision=_HI)
    # Fd[j*nIP + v, d] = F_delta[v, d, j]
    F = tuple(
        tuple(Fd[j * n_ip:(j + 1) * n_ip, d] + (1.0 if d == j else 0.0)
              for j in range(3))
        for d in range(3))
    dR, dV = corotated_delta(F)
    dx3 = consts.dx ** 3
    mu, lam = consts.IP_mu, consts.IP_lam
    dP = jnp.concatenate([
        jnp.stack([dx3 * (mu * dR[d][j] + lam * dV[d][j])
                   for d in range(3)], axis=-1)
        for j in range(3)], axis=0)                      # [3*nIP, 3]
    if B.dtype == jnp.bfloat16:
        rhs = jax.lax.dot_general(
            B, dP.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        rhs = jnp.matmul(B.T, dP, precision=_HI)
    return rhs.reshape(n_k, 10, 3)


def rhs_elastic_delta(consts: SimConstants, ddof: jax.Array) -> jax.Array:
    """E(dof) - E(rest): per-IP dx^3 (mu (R-I) + lam (V-I)) contracted with
    dNx. Exactly zero at rest (cuda_utils.py:83-151, delta form — see module
    doc).

    TPU structure (round 4): F_delta and the rhs are the SAME cell-chunked
    block operator applied forward/transposed — two batched MXU matmuls
    over [C, 3S, 80] blocks plus a tiny node gather/segment-sum (C*8 rows;
    see SimConstants.Dc). The polar factors come from the componentwise
    Jacobi SVD (svd3.corotated_delta). History: round-1's per-IP gather +
    einsum + segment_sum cost 3.5 ms/iter of padded-layout HBM traffic;
    round-2's dense B fixed that but scaled as nIP * n_k * 30 floats of
    pure bandwidth (2 GB, ~25 ms/step at 50k IPs); the chunked form reads
    nIP * 240 floats (~50 MB at 50k IPs).
    """
    n_k = ddof.shape[0]
    if consts.B is not None:
        return _rhs_elastic_delta_dense(consts, ddof)
    C, S = consts.chunk_mu.shape
    dofc = ddof[consts.chunk_nodes].reshape(C, 80, 3)    # [C,8] row gather
    Dc = consts.Dc.reshape(C, S * 3, 80)
    if Dc.dtype == jnp.bfloat16:
        # bf16 blocks with f32 accumulation: the delta formulation keeps
        # every contracted quantity O(deformation), so the 2^-8 relative
        # error perturbs forces by ~0.4% (trajectory-verified against the
        # f64 oracle in tests/test_solver.py). global_inv and the mass
        # matmul stay true-f32: the precision_probe NaN failure mode lives
        # in the global solve, not the force assembly.
        Fd = jax.lax.dot_general(
            Dc, dofc.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [C, 3S, 3]
    else:
        Fd = jax.lax.dot_general(
            Dc, dofc, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=_HI)                               # [C, 3S, 3]

    # F[d][j] = delta_dj + Fd[v, j, d] as flattened [C*S] component arrays
    Fd = Fd.reshape(C * S, 3, 3)
    F = tuple(
        tuple(Fd[:, j, d] + (1.0 if d == j else 0.0) for j in range(3))
        for d in range(3))
    dR, dV = corotated_delta(F)

    dx3 = consts.dx**3
    mu = consts.chunk_mu.reshape(C * S)
    lam = consts.chunk_lam.reshape(C * S)
    # dP[v, j, d] = dx^3 (mu dR[d][j] + lam dV[d][j]); padded rows have
    # mu = lam = 0 so they contribute exactly nothing
    dP = jnp.stack([
        jnp.stack([dx3 * (mu * dR[d][j] + lam * dV[d][j])
                   for d in range(3)], axis=-1)
        for j in range(3)], axis=1).reshape(C, S * 3, 3)

    # transpose contraction of the same blocks, then node scatter
    if Dc.dtype == jnp.bfloat16:
        rhs_c = jax.lax.dot_general(
            Dc, dP.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [C, 80, 3]
    else:
        rhs_c = jax.lax.dot_general(
            Dc, dP, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            precision=_HI)                               # [C, 80, 3]
    contrib = rhs_c.reshape(C * 8, 10, 3)
    return jax.ops.segment_sum(
        contrib, consts.chunk_nodes.reshape(-1), num_segments=n_k)


@jax.jit
def sim_step(consts: SimConstants, state: SimState) -> SimState:
    """One implicit local-global step (reference solver.py:595-602).

    Algebraically identical to the reference's
    dof = dof_rest + G^-1 (momentum + E(dof) - rhs_rest), reformulated in
    delta variables for float32 robustness.
    """
    n_k = state.ddof.shape[0]
    dim = n_k * 10

    ddof_tilde = state.ddof + consts.dt * state.dof_vel
    momentum = (
        jnp.matmul(consts.mass_invt2, ddof_tilde.reshape(dim, 3),
                   precision=_HI).reshape(n_k, 10, 3)
        + state.dof_f
        + consts.rhs_gravity
    )

    def body(_, ddof):
        rhs = momentum + rhs_elastic_delta(consts, ddof)
        return jnp.matmul(consts.global_inv, rhs.reshape(dim, 3),
                          precision=_HI).reshape(n_k, 10, 3)

    ddof = jax.lax.fori_loop(0, consts.iters, body, state.ddof)
    vel = (ddof - state.ddof) / consts.dt * 0.998
    return SimState(ddof=ddof, dof_vel=vel, dof_f=state.dof_f)


@jax.jit
def get_ip_info(consts: SimConstants, state: SimState
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-IP deformed position, F, and grad-F for the bending renderer
    (reference solver.py:402-424; our structured layout, see module doc).

    Returns (p_def [n,3], F [n,3,3], dF [n,3,3,3]) float32, where
    F[d,c] = d phi_d/d p_c and dF[j,d,c] = d^2 phi_d/(d p_c d p_j).
    """
    ddof_g = state.ddof[consts.IP_kernel]                      # [n,8,10,3]
    p = consts.ip_pos + jnp.einsum("via,viad->vd", consts.IP_Nx, ddof_g,
                                   precision=_HI)
    F = jnp.eye(3, dtype=p.dtype) + jnp.einsum(
        "vica,viad->vdc", consts.IP_dNx, ddof_g, precision=_HI
    )
    dF = jnp.einsum("vijca,viad->vjdc", consts.IP_ddNx, ddof_g,
                    precision=_HI)
    return p.astype(jnp.float32), F.astype(jnp.float32), dF.astype(jnp.float32)


@jax.jit
def update_force(consts: SimConstants, state: SimState, vid: jax.Array,
                 f: jax.Array) -> SimState:
    """Scatter a picked-IP force into dof space (reference solver.py:578-588)."""
    m = consts.IP_rho[vid] * consts.dx**3
    contrib = m * consts.IP_Nx[vid][:, :, None] * f[None, None, :]  # [8,10,3]
    dof_f = jnp.zeros_like(state.ddof)
    dof_f = dof_f.at[consts.IP_kernel[vid]].add(contrib)
    return state._replace(dof_f=dof_f)


@jax.jit
def clear_force(state: SimState) -> SimState:
    return state._replace(dof_f=jnp.zeros_like(state.dof_f))


@jax.jit
def point_positions(consts: SimConstants, state: SimState) -> jax.Array:
    """Deformed material-point positions (reference solver.py:604-617)."""
    ddof_g = state.ddof[consts.pts_kernel]
    return consts.pts_rest + jnp.einsum("via,viad->vd", consts.pts_Nx,
                                        ddof_g, precision=_HI)


# ---------------------------------------------------------------------------
# convenience wrapper with the reference's stateful interface
# ---------------------------------------------------------------------------

class Simulator:
    """Stateful facade mirroring the reference Simulator (solver.py:12-617)."""

    def __init__(self, dt=1e-2, iters=20, bbox=(1.0, 1.0, 1.0), kres=7,
                 dx=1.0, gravity=(0.0, -9.8, 0.0), stiff=1e5,
                 base=(-0.5, -0.5, -0.5), dtype=jnp.float32, substeps=1,
                 bf16_b=False, cache_dir: Optional[str] = None):
        # substeps: run `substeps` inner steps of dt/substeps per
        # stepforward() call — finer time resolution for fast dynamics
        # (measured envelope: tools/diverge_probe.py). 1 = reference
        # behavior.
        # bf16_b: store the B assembly operator in bfloat16 (f32
        # accumulation) — halves its HBM traffic for >25k-IP scenes.
        # cache_dir: persist the one-time f64 precompute per scene
        # (content-addressed; 140-410 s -> seconds on a warm start).
        self.substeps = int(substeps)
        self._cfg = dict(dt=dt / self.substeps, iters=iters,
                         bbox=np.asarray(bbox, np.float64),
                         kres=kres, dx=dx, gravity=gravity, stiff=stiff,
                         base=np.asarray(base, np.float64), dtype=dtype)
        self.bf16_b = bool(bf16_b)
        self.cache_dir = cache_dir
        self.consts: Optional[SimConstants] = None
        self.state: Optional[SimState] = None
        self.aux: Optional[dict] = None
        self.dx = dx
        self.dt = dt

    def InitializeFromPly(self, path: str) -> None:
        d = read_physics_ply(path)
        self.initialize(d["pos"], d["mass"], d["mu"], d["lam"], d["pin"])

    def initialize(self, pos, mass, mu, lam, is_pin) -> None:
        if self.cache_dir:
            self.consts, self.state, self.aux = sim_init_cached(
                pos, mass, mu, lam, is_pin, cache_dir=self.cache_dir,
                **self._cfg)
        else:
            self.consts, self.state, self.aux = sim_init(
                pos, mass, mu, lam, is_pin, **self._cfg
            )
        if self.bf16_b:
            self.consts = cast_B_bf16(self.consts)

    def stepforward(self) -> None:
        for _ in range(self.substeps):
            self.state = sim_step(self.consts, self.state)

    def get_IP_info(self):
        return get_ip_info(self.consts, self.state)

    def update_force(self, vid: int, f) -> None:
        self.state = update_force(self.consts, self.state,
                                  jnp.asarray(vid), jnp.asarray(f, jnp.float32))

    def clear_force(self) -> None:
        self.state = clear_force(self.state)

    def update_pos(self) -> np.ndarray:
        return np.asarray(point_positions(self.consts, self.state))

    def OutputToPly(self, path: str) -> None:
        write_ply(path, self.update_pos())
