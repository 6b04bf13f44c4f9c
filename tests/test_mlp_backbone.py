import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pienerf_tpu.config import PieNeRFConfig
from pienerf_tpu.data import synthetic
from pienerf_tpu.models import freq_encoder, network
from pienerf_tpu.train.trainer import Trainer


def test_freq_encode_shapes_and_values():
    x = jnp.asarray([[0.5, -0.25, 1.0]])
    out = freq_encoder.freq_encode(x, n_freqs=4, bound=1.0)
    assert out.shape == (1, 3 * 9)
    fm = freq_encoder.freq_encode(x, n_freqs=4, bound=1.0, feature_major=True)
    np.testing.assert_allclose(np.asarray(fm.T), np.asarray(out), rtol=1e-6)
    # first row block: [x, sin(pi x)... ] for axis 0
    np.testing.assert_allclose(float(out[0, 0]), 0.5)
    np.testing.assert_allclose(float(out[0, 1]), np.sin(np.pi * 0.5), rtol=1e-6)


def test_mlp_backbone_forward():
    spec = network.make_spec(bound=1.0, backbone="mlp")
    params = network.init_params(jax.random.PRNGKey(0), spec)
    assert "encoder" not in params
    assert params["sigma_net"][0].shape[0] == freq_encoder.output_dim(3, spec.n_freqs)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    sigma, rgb = network.forward(params, spec, x, d)
    assert sigma.shape == (64,) and rgb.shape == (64, 3)
    assert np.all(np.isfinite(np.asarray(sigma)))


@pytest.mark.slow
def test_mlp_backbone_trains(tmp_path):
    ds = synthetic.make_dataset(n_views=10, H=40, W=40, seed=1)
    cfg = PieNeRFConfig(
        bound=1.0, dt_gamma=0.0, iters=300, num_rays=1024, lr=5e-3,
        max_steps=256, train_max_samples=48, density_thresh=0.5,
        min_near=0.05, workspace=str(tmp_path / "ws"),
        update_extra_interval=32, backbone="mlp",
    ).finalize()
    trainer = Trainer("ngp", cfg, use_checkpoint="scratch", seed=0)
    trainer.train_iterations(ds, 300)
    p = trainer.evaluate(ds, n_views=1)
    assert p > 16.0, f"mlp backbone train-view PSNR too low: {p}"
