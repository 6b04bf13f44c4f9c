import jax
import jax.numpy as jnp
import numpy as np

from pienerf_tpu.render import fast
from pienerf_tpu.train.metrics import psnr


def test_sample_pdf_concentrates_where_weight_is():
    n, k = 4, 32
    t_mid = jnp.broadcast_to(jnp.linspace(0.0, 1.0, k - 1)[None], (n, k - 1))
    w = jnp.zeros((n, k - 1)).at[:, 20].set(1.0)   # all weight near t~0.65
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, 64))
    t = fast.sample_pdf(t_mid, w, 64, u)
    t = np.asarray(t)
    target = float(t_mid[0, 20])
    assert np.abs(np.median(t) - target) < 0.08


def test_fast_render_matches_analytic_sphere():
    """Fit-free check: build a 'network' whose density/color are analytic by
    training-free construction is impossible, so instead validate the
    machinery end-to-end with the mlp backbone trained quickly in
    test_mlp_backbone; here check geometry: rays that miss the scene box get
    pure background, weights_sum in range, and importance pass is finite."""
    from pienerf_tpu.models import network

    spec = network.make_spec(bound=1.0, backbone="mlp")
    params = network.init_params(jax.random.PRNGKey(0), spec)
    st = fast.FastSettings(bound=1.0, num_coarse=32, num_fine=32)

    n = 128
    key = jax.random.PRNGKey(1)
    ro = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (n, 1))
    d = jax.random.normal(key, (n, 3)) * 0.15 + jnp.asarray([0.0, 0.0, 1.0])
    rd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = fast.render_rays_fast(params, spec, st, ro, rd, jnp.float32(0.3),
                                jax.random.PRNGKey(2))
    img = np.asarray(out["image"])
    assert np.all(np.isfinite(img))
    ws = np.asarray(out["weights_sum"])
    assert np.all((ws >= 0) & (ws <= 1 + 1e-5))

    # rays that miss the box: exact background
    ro2 = jnp.asarray([[5.0, 5.0, 5.0]])
    rd2 = jnp.asarray([[1.0, 0.0, 0.0]])
    out2 = fast.render_rays_fast(params, spec, st, ro2, rd2, jnp.float32(0.3),
                                 jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(out2["image"][0]), 0.3, atol=1e-6)


def test_fast_render_gradients_flow():
    from pienerf_tpu.models import network

    spec = network.make_spec(bound=1.0, backbone="mlp")
    params = network.init_params(jax.random.PRNGKey(0), spec)
    st = fast.FastSettings(bound=1.0, num_coarse=16, num_fine=16)
    ro = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (8, 1))
    rd = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (8, 1))

    def loss(p):
        out = fast.render_rays_fast(p, spec, st, ro, rd, jnp.float32(1.0),
                                    jax.random.PRNGKey(1))
        return jnp.mean(out["image"] ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
