"""CLIP guidance: JAX forward equivalence vs a randomly-initialized
transformers.CLIPModel (no download — zero-egress-safe), plus loss
semantics (reference nerf/clip_utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pienerf_tpu.train import clip_guidance as cg


@pytest.fixture(scope="module")
def tiny_clip():
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    cfg = tfm.CLIPConfig(
        projection_dim=20,
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=32, patch_size=8),
        # eos_token_id=2 selects transformers' legacy argmax(ids) pooling —
        # the OpenAI-checkpoint convention the reference's `clip` package
        # uses (EOT has the largest vocab id)
        text_config=dict(hidden_size=16, intermediate_size=32,
                         num_hidden_layers=2, num_attention_heads=2,
                         vocab_size=64, max_position_embeddings=16,
                         eos_token_id=2),
    )
    torch.manual_seed(0)
    model = tfm.CLIPModel(cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = cg.import_hf_state_dict(sd, v_heads=2, t_heads=2)
    return torch, model, params


def test_image_tower_matches_transformers(tiny_clip):
    torch, model, params = tiny_clip
    rng = np.random.RandomState(1)
    px = rng.rand(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = model.get_image_features(
            pixel_values=torch.from_numpy(px)).numpy()
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    got = np.asarray(cg.encode_image(params, jnp.asarray(px)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_text_tower_matches_transformers(tiny_clip):
    torch, model, params = tiny_clip
    rng = np.random.RandomState(2)
    ids = rng.randint(0, 64, size=(3, 12)).astype(np.int64)
    # EOT pooling = argmax(ids) position; make the max unique per row
    ids[np.arange(3), rng.randint(0, 12, 3)] = 63
    with torch.no_grad():
        want = model.get_text_features(
            input_ids=torch.from_numpy(ids)).numpy()
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    got = np.asarray(cg.encode_text(params, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_clip_loss_is_negative_cosine_and_differentiable(tiny_clip):
    _, _, params = tiny_clip
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.rand(2, 24, 24, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 64, size=(1, 8)), jnp.int32)
    tz = cg.encode_text(params, ids)

    # tiny vision tower: 32x32 input (its native image_size)
    loss = cg.clip_loss(params, imgs, tz, size=32)
    assert np.isfinite(float(loss))
    assert -1.0 <= float(loss) <= 1.0    # negative mean cosine similarity

    # the guidance gradient must flow back into the rendered image
    g = jax.grad(lambda im: cg.clip_loss(params, im, tz, size=32))(imgs)
    assert float(jnp.max(jnp.abs(g))) > 0.0

    # an image nudged along -grad must score better (lower loss)
    loss2 = cg.clip_loss(params, imgs - 10.0 * g, tz, size=32)
    assert float(loss2) < float(loss)


def test_guidance_wrapper_api(tiny_clip):
    _, _, params = tiny_clip
    guide = cg.CLIPGuidance(params)
    with pytest.raises(AssertionError):
        guide(jnp.zeros((1, 8, 8, 3)))
    rng = np.random.RandomState(4)
    guide.prepare_text(ids=rng.randint(0, 64, size=(1, 8)))
    loss = guide(jnp.asarray(rng.rand(1, 16, 16, 3), jnp.float32), size=32)
    assert np.isfinite(float(loss))


def test_clip_train_step_descends(tiny_clip):
    # the rand_pose training mode end-to-end on tiny shapes: a jitted
    # orbit-pose render + CLIP-similarity step must run, stay finite, and
    # actually move the field parameters
    import optax

    from pienerf_tpu.models import network
    from pienerf_tpu.train import trainer as tr

    _, _, cparams = tiny_clip
    rng = np.random.RandomState(5)
    ids = jnp.asarray(rng.randint(0, 64, size=(1, 8)), jnp.int32)
    tz = cg.encode_text(cparams, ids)

    spec = network.make_spec(bound=1.0, backbone="mlp", n_freqs=2,
                             num_layers=2)
    params = network.init_params(jax.random.PRNGKey(0), spec)
    opt = optax.adam(1e-3)
    state = tr.TrainState(params, opt.init(params), params,
                          jnp.zeros((), jnp.int32))
    step = tr.make_clip_step(
        spec, opt, cparams, tz, rH=16, rW=16,
        intrinsics=(16.0, 16.0, 8.0, 8.0), radius=2.0,
        num_samples=8, clip_size=32)
    losses = []
    for i in range(3):
        state, loss = step(state, jax.random.PRNGKey(i + 1))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3
    d = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))),
        jax.tree_util.tree_map(lambda a, b: a - b, state.params, params),
        0.0)
    assert d > 0.0


def test_weights_gating():
    # without a weight file the loader raises the actionable error
    import os
    if not cg.available():
        with pytest.raises(FileNotFoundError):
            cg.load_weights(None) if os.environ.get(
                "PIENERF_CLIP_WEIGHTS") else cg.load_weights()
