import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pienerf_tpu.io import checkpoint as ckpt_io
from pienerf_tpu.models import hash_encoder, network
from pienerf_tpu.models.sh_encoder import sh_encode


# ---------------------------------------------------------------------------
# hash encoder
# ---------------------------------------------------------------------------

def test_hash_spec_layout_matches_reference_constants():
    spec = hash_encoder.make_spec(desired_resolution=2048)
    assert spec.num_levels == 16 and spec.level_dim == 2
    # level 0: res 16 -> (17)^3 = 4913 -> pad to 4920
    assert spec.offsets[1] == 4920
    assert spec.resolutions[0] == 16
    assert spec.resolutions[-1] == 2048
    # coarse levels dense, fine levels capped at 2^19
    assert spec.offsets[-1] - spec.offsets[-2] == 2**19


@pytest.mark.parametrize("bound", [1.0, 2.0])
def test_hash_encode_matches_oracle(bound):
    spec = hash_encoder.make_spec(
        num_levels=4, base_resolution=4, log2_hashmap_size=7,
        desired_resolution=None, per_level_scale=2.0,
    )
    rng = np.random.RandomState(0)
    emb = rng.randn(spec.total_params, spec.level_dim).astype(np.float32)
    x = rng.uniform(-bound, bound, size=(32, 3)).astype(np.float32)
    got = np.asarray(hash_encoder.encode(jnp.asarray(emb), spec,
                                         jnp.asarray(x), bound))
    want = hash_encoder.encode_np(emb, spec, x, bound)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_hash_encode_oob_is_zero():
    spec = hash_encoder.make_spec(num_levels=2, base_resolution=4,
                                  desired_resolution=None)
    emb = jnp.ones((spec.total_params, 2), jnp.float32)
    x = jnp.array([[1.5, 0.0, 0.0], [0.0, 0.0, 0.0]], jnp.float32)
    out = hash_encoder.encode(emb, spec, x, bound=1.0)
    assert np.all(np.asarray(out[0]) == 0.0)
    assert np.all(np.asarray(out[1]) != 0.0)


@pytest.mark.parametrize("levels,base,log2m", [(4, 4, 7), (3, 8, 5)])
def test_tv_grad_matches_cuda_oracle(levels, base, log2m):
    # mixes dense levels (coarse) and hashed levels (fine) so both index
    # branches of kernel_grad_tv (gridencoder.cu:506-611) are exercised
    spec = hash_encoder.make_spec(
        num_levels=levels, base_resolution=base, log2_hashmap_size=log2m,
        desired_resolution=None, per_level_scale=2.0)
    rng = np.random.RandomState(1)
    emb = rng.randn(spec.total_params, spec.level_dim).astype(np.float32)
    x = rng.uniform(-1.2, 1.2, size=(48, 3)).astype(np.float32)  # some OOB
    got = np.asarray(hash_encoder.grad_total_variation(
        jnp.asarray(emb), spec, jnp.asarray(x), weight=1e-3, bound=1.0))
    want = hash_encoder.tv_grad_np(emb, spec, x, weight=1e-3, bound=1.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)


def test_tv_grad_flattens_the_grid():
    # descending along the TV gradient must reduce neighbor differences
    spec = hash_encoder.make_spec(num_levels=2, base_resolution=4,
                                  log2_hashmap_size=10,
                                  desired_resolution=None,
                                  per_level_scale=2.0)
    rng = np.random.RandomState(2)
    emb = jnp.asarray(rng.randn(spec.total_params, 2).astype(np.float32))
    x = jnp.asarray(rng.uniform(-1, 1, size=(256, 3)).astype(np.float32))

    def roughness(e):
        # mean squared difference between x-adjacent dense-level cells
        lvl0 = e[:spec.offsets[1]]
        return float(jnp.mean((lvl0[1:] - lvl0[:-1]) ** 2))

    g = hash_encoder.grad_total_variation(emb, spec, x, weight=1.0)
    emb2 = emb - 0.1 * g
    assert roughness(emb2) < roughness(emb)


def test_hash_encode_input_gradients():
    # the reference exposes analytic input gradients via dy_dx
    # (gridencoder.cu:201-244,343-369); here autodiff through the
    # interpolation weights provides them — verify against central finite
    # differences at points away from lattice planes (where the encode is
    # smooth)
    spec = hash_encoder.make_spec(
        num_levels=3, base_resolution=4, log2_hashmap_size=8,
        desired_resolution=None, per_level_scale=2.0)
    rng = np.random.RandomState(3)
    emb = jnp.asarray(rng.randn(spec.total_params, 2).astype(np.float32))
    # cell interiors: offset from lattice planes at every level
    x0 = np.array([[0.123, -0.317, 0.481], [-0.642, 0.209, -0.055]],
                  np.float32)

    def f(x):
        return jnp.sum(hash_encoder.encode(emb, spec, x, 1.0) ** 2)

    g = np.asarray(jax.grad(f)(jnp.asarray(x0)))
    eps = 1e-3
    for n in range(x0.shape[0]):
        for d in range(3):
            xp = x0.copy(); xp[n, d] += eps
            xm = x0.copy(); xm[n, d] -= eps
            fd = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) \
                / (2 * eps)
            np.testing.assert_allclose(g[n, d], fd, rtol=2e-2, atol=1e-3)


def test_hash_encode_full_scale_runs_and_differentiates():
    spec = hash_encoder.make_spec(desired_resolution=2048)
    key = jax.random.PRNGKey(0)
    emb = hash_encoder.init_params(key, spec)
    x = jax.random.uniform(key, (64, 3), minval=-1, maxval=1)

    def loss(e):
        return jnp.sum(hash_encoder.encode(e, spec, x, 1.0) ** 2)

    g = jax.grad(loss)(emb)
    assert g.shape == emb.shape
    assert float(jnp.abs(g).sum()) > 0


def test_hash_encode_interpolates_continuously():
    """Output is continuous across cell boundaries (trilinear)."""
    spec = hash_encoder.make_spec(num_levels=2, base_resolution=8,
                                  desired_resolution=None, per_level_scale=2.0)
    emb = jax.random.normal(jax.random.PRNGKey(1), (spec.total_params, 2))
    t = jnp.linspace(-0.5, 0.5, 1001)
    x = jnp.stack([t, jnp.zeros_like(t), jnp.zeros_like(t)], -1)
    out = np.asarray(hash_encoder.encode(emb, spec, x, 1.0))
    jumps = np.abs(np.diff(out, axis=0)).max()
    assert jumps < 0.2, f"discontinuity {jumps}"


# ---------------------------------------------------------------------------
# SH encoder
# ---------------------------------------------------------------------------

def _scipy_real_sh(l, m, dirs):
    """Real spherical harmonics with the tcnn sign convention."""
    from scipy.special import sph_harm_y
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    theta = np.arccos(np.clip(z, -1, 1))        # polar
    phi = np.arctan2(y, x)                      # azimuth
    Y = sph_harm_y(l, abs(m), theta, phi)
    if m > 0:
        out = np.sqrt(2) * (-1) ** m * Y.real
    elif m < 0:
        out = np.sqrt(2) * (-1) ** m * Y.imag
    else:
        out = Y.real
    return out


def test_sh_matches_scipy():
    rng = np.random.RandomState(0)
    d = rng.randn(64, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    got = np.asarray(sh_encode(jnp.asarray(d), degree=8))
    idx = 0
    for l in range(8):
        for m in range(-l, l + 1):
            want = _scipy_real_sh(l, m, d)
            # tcnn flips the sign of odd-|m| components vs the
            # Condon-Shortley real basis: match either sign consistently
            s = np.sign(np.dot(got[:, idx], want) + 1e-30)
            np.testing.assert_allclose(
                got[:, idx], s * want, rtol=1e-4, atol=1e-5,
                err_msg=f"l={l} m={m} idx={idx}",
            )
            idx += 1


def test_sh_degree1_constant():
    d = jnp.asarray(np.random.RandomState(1).randn(8, 3))
    out = sh_encode(d, degree=1)
    np.testing.assert_allclose(np.asarray(out), 0.28209479177387814, rtol=1e-6)


# ---------------------------------------------------------------------------
# network
# ---------------------------------------------------------------------------

def test_network_shapes_and_ranges():
    spec = network.make_spec(bound=1.0)
    params = network.init_params(jax.random.PRNGKey(0), spec)
    assert params["sigma_net"][0].shape == (32, 64)
    assert params["sigma_net"][1].shape == (64, 16)
    assert params["color_net"][0].shape == (31, 64)
    assert params["color_net"][2].shape == (64, 3)

    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3), minval=-1, maxval=1)
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    sigma, rgb = network.forward(params, spec, x, d)
    assert sigma.shape == (128,) and rgb.shape == (128, 3)
    assert np.all(np.asarray(sigma) >= 0)
    assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))


def test_network_background():
    spec = network.make_spec(bound=1.0, bg_radius=32.0)
    params = network.init_params(jax.random.PRNGKey(0), spec)
    sph = jax.random.uniform(jax.random.PRNGKey(1), (16, 2), minval=-1, maxval=1)
    d = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rgb = network.background(params, spec, sph, d)
    assert rgb.shape == (16, 3)


def test_trunc_exp_gradient_clamps():
    g = jax.grad(lambda x: network.trunc_exp(x))(20.0)
    assert np.isfinite(g)
    np.testing.assert_allclose(g, np.exp(15.0), rtol=1e-6)


def test_trunc_exp_forward_saturates():
    """Forward must be bounded: raw densities in occluded regions drift
    upward during long runs (measured: a 48-dB 800x800 fit NaN'd at step
    ~9k when exp overflowed f32) — the saturation at exp(15) is invisible
    to rendering (alpha == 1.0 exactly for sigma*dt > 20) but keeps every
    forward value, loss and gradient finite forever."""
    y = network.trunc_exp(jnp.asarray([100.0, 1e4, np.inf]))
    assert np.isfinite(np.asarray(y)).all()
    np.testing.assert_allclose(np.asarray(y), np.exp(15.0), rtol=1e-6)
    # gradient at a runaway input still pulls back (nonzero, finite)
    g = jax.grad(lambda x: network.trunc_exp(x))(100.0)
    assert np.isfinite(g) and g > 0


def test_network_bf16_compute_close_to_f32():
    spec32 = network.make_spec(bound=1.0, compute_dtype="float32")
    spec16 = spec32._replace(compute_dtype="bfloat16")
    params = network.init_params(jax.random.PRNGKey(0), spec32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    s32, c32 = network.forward(params, spec32, x, d)
    s16, c16 = network.forward(params, spec16, x, d)
    np.testing.assert_allclose(np.asarray(c16), np.asarray(c32), atol=0.1)


# ---------------------------------------------------------------------------
# checkpoints
# ---------------------------------------------------------------------------

def test_native_checkpoint_roundtrip(tmp_path):
    spec = network.make_spec(bound=1.0)
    params = network.init_params(jax.random.PRNGKey(0), spec)
    extra = {"density_grid": np.random.rand(1, 128**3).astype(np.float32),
             "epoch": 3}
    p = str(tmp_path / "ckpt.npz")
    ckpt_io.save_native(p, params, extra)
    loaded, ex = ckpt_io.load_native(p)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ex["epoch"] == 3
    np.testing.assert_array_equal(ex["density_grid"], extra["density_grid"])


def test_torch_ngp_roundtrip(tmp_path):
    spec = network.make_spec(bound=1.0, bg_radius=32.0)
    params = network.init_params(jax.random.PRNGKey(0), spec)
    extra = {"density_grid": np.random.rand(1, 128**3).astype(np.float32),
             "mean_density": 0.5, "epoch": 7}
    p = str(tmp_path / "ngp_ep0007.pth")
    ckpt_io.save_torch_ngp(p, params, extra)
    loaded, ex = ckpt_io.load_torch_ngp(p)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ex["density_grid"]),
                                  extra["density_grid"])
    assert ex["epoch"] == 7

    # outputs identical through the roundtrip
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    s0, c0 = network.forward(params, spec, x, d)
    s1, c1 = network.forward(loaded, spec, x, d)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), rtol=1e-6)
