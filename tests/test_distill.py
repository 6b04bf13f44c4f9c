"""Backbone distillation (train/distill.py): a hashgrid teacher's field is
reproduced by the mlp student well enough for interactive use."""

import jax
import numpy as np
import pytest

from pienerf_tpu.models import network
from pienerf_tpu.train import distill


@pytest.mark.slow
def test_distill_reduces_field_error():
    t_spec = network.make_spec(bound=1.0, backbone="hashgrid")
    t_params = network.init_params(jax.random.PRNGKey(7), t_spec)

    s0_spec = network.make_spec(bound=1.0, backbone="mlp")
    s0 = network.init_params(jax.random.PRNGKey(0), s0_spec)
    before = distill.field_agreement(t_params, t_spec, s0, s0_spec)

    s_params, s_spec, loss = distill.distill(
        t_params, t_spec, steps=200, batch=1024, log_every=100,
        log_fn=lambda *_: None)
    after = distill.field_agreement(t_params, t_spec, s_params, s_spec)
    assert np.isfinite(loss)
    assert after["sigma_logmse"] < before["sigma_logmse"] * 0.7, (before,
                                                                  after)


@pytest.mark.slow
def test_pth_import_distill_interactive_chain(tmp_path):
    """The full checkpoint-interactivity chain (BASELINE configs 2/3 minus
    the unreleased asset): export a hashgrid field to a REAL torch `.pth`
    file in the reference's layout -> re-import -> distill into the mlp
    backbone -> render a fused interactive frame from the student."""
    import jax.numpy as jnp

    from pienerf_tpu.io import checkpoint as ckpt_io
    from pienerf_tpu.ops import beam_bend
    from pienerf_tpu.ops.pallas import field_kernel
    from pienerf_tpu.render import interactive

    t_spec = network.make_spec(bound=1.0, backbone="hashgrid")
    t_params = network.init_params(jax.random.PRNGKey(3), t_spec)
    p = str(tmp_path / "ngp_ep0300.pth")
    ckpt_io.save_torch_ngp(p, t_params)

    loaded, _ = ckpt_io.load_torch_ngp(p)
    # imported teacher is bit-identical to the exported field
    x = jax.random.uniform(jax.random.PRNGKey(0), (256, 3), minval=-1.0,
                           maxval=1.0)
    d = x / np.linalg.norm(np.asarray(x), axis=1, keepdims=True)
    s0, _ = network.forward(t_params, t_spec, x, d)
    s1, _ = network.forward(loaded, t_spec, x, d)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)

    s_params, s_spec, loss = distill.distill(
        loaded, t_spec, steps=60, batch=512, log_every=60,
        log_fn=lambda *_: None)
    assert np.isfinite(loss)

    # student drives the fused interactive frame
    pw = field_kernel.pack_weights(s_params, s_spec)
    r0, dx = 0.3, 0.15
    c = np.arange(-r0, r0 + 1e-6, dx, dtype=np.float32)
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], 1)
    n = pts.shape[0]
    F = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    dF = np.zeros((n, 3, 3, 3), np.float32)
    pack = beam_bend.pack_ip_data_fast(
        jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(F), jnp.asarray(dF))
    bst = beam_bend.BeamBendSettings(num_seek_ip=2, max_iter_num=1,
                                     ip_dx=1.05 * dx, ips_per_tile=64)
    ist = interactive.InteractiveSettings(
        spec=s_spec, bend=bst, tile=16, samples=16, active_frac=1.0,
        tile_chunk=4, min_near=0.05)
    H = W = 32
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0, 0, -2.5)
    out = interactive.render_frame_fused(
        ist, pw, pack, jnp.asarray(pts), jnp.asarray(pose),
        (32.0, 32.0, 16.0, 16.0), H, W, jnp.float32(1.0))
    img = interactive.tiles_to_image(np.asarray(out["tiles_image"]), H, W)
    assert img.shape == (H, W, 3) and np.all(np.isfinite(img))


def test_distill_step_and_agreement_run():
    t_spec = network.make_spec(bound=1.0, backbone="hashgrid")
    t_params = network.init_params(jax.random.PRNGKey(7), t_spec)
    s_params, s_spec, loss = distill.distill(
        t_params, t_spec, steps=5, batch=256, log_every=5,
        log_fn=lambda *_: None)
    assert np.isfinite(loss)
    d = distill.field_agreement(t_params, t_spec, s_params, s_spec, n=512)
    assert all(np.isfinite(v) for v in d.values())
