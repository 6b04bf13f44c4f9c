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


def test_distill_step_and_agreement_run():
    t_spec = network.make_spec(bound=1.0, backbone="hashgrid")
    t_params = network.init_params(jax.random.PRNGKey(7), t_spec)
    s_params, s_spec, loss = distill.distill(
        t_params, t_spec, steps=5, batch=256, log_every=5,
        log_fn=lambda *_: None)
    assert np.isfinite(loss)
    d = distill.field_agreement(t_params, t_spec, s_params, s_spec, n=512)
    assert all(np.isfinite(v) for v in d.values())
