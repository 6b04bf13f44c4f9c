"""128-wide (MXU-filling) student path: fused kernels, distill spec,
checkpoint arch adoption (round-3 item 2 / ROADMAP item 2).

The 64-wide student's matmuls use a quarter of the 128x128 systolic array
(PERF.md roofline note); the 128-wide student fills it — ~4x capacity at
the same matmul wall time. These tests pin value parity of the widened
kernels against the XLA network path on the interpret backend.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pienerf_tpu.models import network
from pienerf_tpu.ops import beam_bend
from pienerf_tpu.ops.pallas import field_kernel, tile_kernel
from pienerf_tpu.render import interactive


def _spec(width):
    kw = {} if width == 64 else dict(hidden_dim=128, hidden_dim_color=128,
                                     n_freqs=10)
    return network.make_spec(bound=1.0, backbone="mlp", **kw)


@pytest.mark.parametrize("width", [64, 128])
def test_pack_weights_width(width):
    spec = _spec(width)
    params = network.init_params(jax.random.PRNGKey(0), spec)
    pw = field_kernel.pack_weights(params, spec)
    L = spec.num_layers + spec.num_layers_color
    assert pw.shape == (L, width, width)
    assert field_kernel.kernel_width(spec) == width


@pytest.mark.parametrize("width", [64, 128])
def test_field_eval_matches_network_forward(width):
    spec = _spec(width)
    params = network.init_params(jax.random.PRNGKey(1), spec)
    pw = field_kernel.pack_weights(params, spec)

    n = 2048
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.uniform(k1, (n, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    sig_k, rgb_k = field_kernel.field_eval(
        pw, spec, tuple(x[:, i] for i in range(3)),
        tuple(d[:, i] for i in range(3)), block_n=2048)
    sig_x, rgb_x = network.forward(params, spec, x, d)
    np.testing.assert_allclose(np.asarray(sig_k), np.asarray(sig_x),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(rgb_k).T, np.asarray(rgb_x),
                               rtol=2e-4, atol=2e-4)


def test_fused_frame_wide_matches_xla_path():
    """deformed=False static frame: 128-wide fused tile kernel must
    reproduce the XLA tile path (same invariant as
    test_tile_kernel.test_fused_static_matches_xla_path at width 64)."""
    spec = _spec(128)
    params = network.init_params(jax.random.PRNGKey(3), spec)
    pw = field_kernel.pack_weights(params, spec)
    assert pw.shape[-1] == 128

    c = np.arange(-0.45, 0.451, 0.1, dtype=np.float32)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    p = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    p = p[np.linalg.norm(p, axis=1) <= 0.5]
    n = p.shape[0]
    F = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    dF = np.zeros((n, 3, 3, 3), np.float32)
    p = jnp.asarray(p)
    pack_f = beam_bend.pack_ip_data_fast(p, p, jnp.asarray(F),
                                         jnp.asarray(dF))
    pack_g = beam_bend.pack_ip_data(p, p, jnp.asarray(F), jnp.asarray(dF))

    bst = beam_bend.BeamBendSettings(num_seek_ip=3, max_iter_num=1,
                                     ip_dx=0.105, ips_per_tile=192)
    ist = interactive.InteractiveSettings(
        spec=spec, bend=bst, tile=16, samples=32, active_frac=1.0,
        tile_chunk=4, min_near=0.05, deformed=False)

    H = W = 48
    intr = (48.0, 48.0, W / 2, H / 2)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0.0, 0.0, -2.5)
    pose = jnp.asarray(pose)
    out_old = interactive.render_frame(ist, pw, pack_g, p, pose, intr,
                                       H, W, jnp.float32(1.0))
    out_new = interactive.render_frame_fused(ist, pw, pack_f, p, pose,
                                             intr, H, W, jnp.float32(1.0))
    img_o = interactive.tiles_to_image(np.asarray(out_old["tiles_image"]),
                                       H, W, 16)
    img_n = interactive.tiles_to_image(np.asarray(out_new["tiles_image"]),
                                       H, W, 16)
    np.testing.assert_allclose(img_n, img_o, atol=5e-3)


def test_wide_student_checkpoint_arch_adoption(tmp_path):
    """A 128-wide student checkpoint loads into a Trainer configured with
    the default 64-wide mlp spec: the arch is recovered from the weights
    (trainer._adopt_mlp_arch) and rendering still works."""
    from pienerf_tpu.config import PieNeRFConfig
    from pienerf_tpu.train.trainer import Trainer

    cfg = PieNeRFConfig(bound=1.0, workspace=str(tmp_path / "ws"),
                        backbone="mlp", iters=10).finalize()
    cfg.backbone = "mlp"
    spec = _spec(128)
    t1 = Trainer("ngp", cfg, spec=spec, use_checkpoint="scratch", seed=0)
    path = t1.save_checkpoint()
    assert os.path.exists(path)

    t2 = Trainer("ngp", PieNeRFConfig(
        bound=1.0, workspace=str(tmp_path / "ws2"), backbone="mlp",
        iters=10).finalize(), use_checkpoint="scratch", seed=1)
    t2.cfg.backbone = "mlp"
    assert t2.spec.hidden_dim == 64
    assert t2.load_checkpoint(path)
    assert t2.spec.hidden_dim == 128 and t2.spec.n_freqs == 10
    out = t2.render_pose(np.eye(4, dtype=np.float32), (32.0, 32.0, 16, 16),
                         32, 32, max_samples=32)
    assert np.isfinite(out["image"]).all()


def test_make_student_spec_widths():
    from pienerf_tpu.train import distill

    t_spec = network.make_spec(bound=2.0, backbone="hashgrid")
    s64 = distill.make_student_spec(t_spec, width=64)
    s128 = distill.make_student_spec(t_spec, width=128)
    assert s64.hidden_dim == 64 and s128.hidden_dim == 128
    assert s128.n_freqs == 10 and s128.bound == 2.0
    assert field_kernel.kernel_width(s128) == 128
