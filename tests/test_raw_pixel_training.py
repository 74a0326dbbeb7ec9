"""Raw-pixel DiT training (online VAE encode inside the jitted step)."""

import jax
import jax.numpy as jnp
import numpy as np

from pyramid_flow_tpu.models.flux.model import FluxConfig, PyramidFluxTransformer
from pyramid_flow_tpu.models.vae.model import CausalVideoVAE, VAEConfig
from pyramid_flow_tpu.pipeline.noising import normalize_latent
from pyramid_flow_tpu.schedulers.flow_matching import (
    PyramidFlowMatchEulerDiscreteScheduler,
)
from pyramid_flow_tpu.training.train_state import TrainConfig, create_train_state
from pyramid_flow_tpu.training.trainer import make_train_step

import pytest

pytestmark = pytest.mark.slow

DIT = FluxConfig(
    in_channels=16, num_layers=1, num_single_layers=1, attention_head_dim=8,
    num_attention_heads=4, joint_attention_dim=32, pooled_projection_dim=24,
    axes_dims_rope=(4, 2, 2))
VAE = VAEConfig(
    latent_channels=4, block_out_channels=(8, 8, 16, 16),
    encoder_layers_per_block=(1, 1, 1, 1), decoder_layers_per_block=(1, 1, 1, 1),
    num_groups=4)


def test_normalize_latent_frame_split():
    x = jnp.ones((1, 3, 2, 2, 4))
    out = normalize_latent(x, "pyramid_flux")
    np.testing.assert_allclose(
        float(out[0, 0, 0, 0, 0]), (1 - (-0.04)) / 1.8726, rtol=1e-5)
    np.testing.assert_allclose(
        float(out[0, 1, 0, 0, 0]), (1 - (-0.2343)) / 3.0986, rtol=1e-5)


def test_train_step_from_raw_video():
    dit = PyramidFluxTransformer(config=DIT)
    vae = CausalVideoVAE(config=VAE)
    sched = PyramidFlowMatchEulerDiscreteScheduler()

    b = 4
    video = jax.random.normal(jax.random.PRNGKey(0), (b, 9, 64, 64, 3)) * 0.5
    vae_params = vae.init(jax.random.PRNGKey(1), video[:1, :1],
                          rng=jax.random.PRNGKey(2))
    params = dit.init(
        jax.random.PRNGKey(3), jnp.zeros((b, 16, 16)), jnp.zeros((b, 16, 3)),
        jnp.zeros((b, 16), jnp.int32), jnp.zeros((b, 8, 32)),
        jnp.ones((b, 8), bool), jnp.zeros((b, 24)), jnp.zeros((b,)))

    batch = {
        "video": video,
        "text_emb": jax.random.normal(jax.random.PRNGKey(4), (b, 8, 32)),
        "text_mask": jnp.ones((b, 8), bool),
        "pooled": jax.random.normal(jax.random.PRNGKey(5), (b, 24)),
        "null_text_emb": jnp.zeros((b, 8, 32)),
        "null_pooled": jnp.zeros((b, 24)),
    }
    state = create_train_state(params, TrainConfig(learning_rate=1e-3))
    step = make_train_step(dit, sched, vae=vae, vae_params=vae_params,
                           donate=False)
    state2, metrics = step(state, batch, jax.random.PRNGKey(6),
                           num_units_per_stage=(1, 1, 2))
    assert np.isfinite(float(metrics["train/loss"]))
    # VAE params untouched (frozen); DiT params updated
    diff = jax.tree.map(lambda a, b_: float(jnp.abs(a - b_).max()),
                        state.params, state2.params)
    assert max(jax.tree.leaves(diff)) > 0
