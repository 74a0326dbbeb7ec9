"""Cosine DDPM scheduler + registry tests."""

import jax
import jax.numpy as jnp
import math
import numpy as np
import pytest

from pyramid_flow_tpu.schedulers.cosine_ddpm import (
    DDPMCosineScheduler,
    get_scheduler,
)
from pyramid_flow_tpu.schedulers.flow_matching import (
    PyramidFlowMatchEulerDiscreteScheduler,
)


def test_alpha_cumprod_formula():
    s = DDPMCosineScheduler()
    # t=0 -> ~1 (clipped at 0.9999); t=1 -> ~0 (clipped at 1e-4)
    assert float(s.alpha_cumprod(jnp.asarray([0.0]))[0]) == pytest.approx(0.9999)
    assert float(s.alpha_cumprod(jnp.asarray([1.0]))[0]) == pytest.approx(1e-4)
    # mid value matches the closed form
    t = 0.5
    expect = math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2 / (
        math.cos(0.008 / 1.008 * math.pi / 2) ** 2)
    assert float(s.alpha_cumprod(jnp.asarray([t]))[0]) == pytest.approx(
        expect, rel=1e-5)


def test_add_noise_and_step_shapes():
    s = DDPMCosineScheduler()
    x = jnp.ones((2, 3, 4))
    noise = jnp.zeros_like(x)
    t = jnp.asarray([0.3, 0.7])
    noisy = s.add_noise(x, noise, t)
    ac = np.asarray(s.alpha_cumprod(t))
    np.testing.assert_allclose(
        np.asarray(noisy)[:, 0, 0], np.sqrt(ac), rtol=1e-5)

    ts = s.timesteps(10)
    assert ts.shape == (11,) and ts[0] == 1.0 and ts[-1] == 0.0
    out = s.step(noise, jnp.asarray([ts[0]] * 2), jnp.asarray([ts[1]] * 2),
                 x, jax.random.PRNGKey(0))
    assert out.shape == x.shape


def test_registry():
    assert isinstance(get_scheduler("ddpm_cosine"),
                      DDPMCosineScheduler)
    assert isinstance(get_scheduler("pyramid_flow_match"),
                      PyramidFlowMatchEulerDiscreteScheduler)
    with pytest.raises(KeyError):
        get_scheduler("nope")
