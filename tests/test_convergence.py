"""Convergence smokes: the trainers must demonstrably OPTIMIZE.

Every other training test asserts single-step finiteness or cross-config
equality — a sign-flipped gradient path that stays finite and
mesh-consistent would pass all of them (VERDICT r3 weak #4). These tests
overfit a tiny model on one synthetic batch for ~100 steps and assert the
loss drops materially.

Reference analogue: none (the reference has no tests); the trainers being
smoked mirror `trainer_misc/fsdp_trainer.py:45-153` (DiT) and the
two-optimizer GAN loop of `train/train_video_vae.py`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _avg(xs):
    return float(np.mean(xs))


def test_dit_training_converges():
    from pyramid_flow_tpu.models.flux.model import (
        FluxConfig, PyramidFluxTransformer)
    from pyramid_flow_tpu.schedulers.flow_matching import (
        PyramidFlowMatchEulerDiscreteScheduler)
    from pyramid_flow_tpu.training.train_state import (
        TrainConfig, create_train_state)
    from pyramid_flow_tpu.training.trainer import make_train_step

    cfg = FluxConfig(
        in_channels=16, num_layers=1, num_single_layers=1,
        attention_head_dim=16, num_attention_heads=4,
        joint_attention_dim=32, pooled_projection_dim=24,
        axes_dims_rope=(8, 4, 4))
    dit = PyramidFluxTransformer(config=cfg)
    sched = PyramidFlowMatchEulerDiscreteScheduler()

    b, t, hl, wl, c = 4, 2, 8, 8, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    batch = {
        "latents": jax.random.normal(ks[0], (b, t, hl, wl, c)),
        "text_emb": jax.random.normal(ks[1], (b, 8, 32)),
        "text_mask": jnp.ones((b, 8), bool),
        "pooled": jax.random.normal(ks[2], (b, 24)),
        "null_text_emb": jnp.zeros((b, 8, 32)),
        "null_pooled": jnp.zeros((b, 24)),
    }
    params = dit.init(
        ks[3], jnp.zeros((b, 16, 16)), jnp.zeros((b, 16, 3)),
        jnp.zeros((b, 16), jnp.int32), batch["text_emb"],
        batch["text_mask"], batch["pooled"], jnp.zeros((b,)))

    # cfg_rate=0 removes the random text-drop so every step trains the same
    # conditional objective; the per-step noise/timestep draws stay random
    # (that's the real objective — the model learns its conditional mean).
    state = create_train_state(params, TrainConfig(learning_rate=2e-3))
    step = make_train_step(dit, sched, use_temporal_pyramid=False,
                           cfg_rate=0.0, donate=False)

    losses = []
    for _ in range(120):
        state, metrics = step(state, batch, jax.random.PRNGKey(7),
                              num_units_per_stage=(2, 2, 2))
        losses.append(float(metrics["train/loss"]))
    first, last = _avg(losses[:10]), _avg(losses[-10:])
    assert np.isfinite(losses).all()
    assert last < 0.7 * first, (
        f"DiT loss did not drop >=30%: first10={first:.4f} last10={last:.4f}")


def test_gan_vae_training_converges():
    from pyramid_flow_tpu.models.vae.discriminator import PatchDiscriminator2D
    from pyramid_flow_tpu.models.vae.lpips import LPIPS
    from pyramid_flow_tpu.models.vae.model import CausalVideoVAE, VAEConfig
    from pyramid_flow_tpu.training.vae_trainer import (
        VAETrainConfig, create_vae_train_state, make_vae_train_step)

    vae = CausalVideoVAE(config=VAEConfig(
        latent_channels=2, block_out_channels=(4, 4, 8, 8),
        encoder_layers_per_block=(1, 1, 1, 1),
        decoder_layers_per_block=(1, 1, 1, 1), num_groups=2))
    lpips = LPIPS()
    disc = PatchDiscriminator2D(ndf=8, n_layers=2)

    # smooth low-frequency target: learnable by a tiny VAE in ~100 steps
    yy, xx = np.mgrid[0:32, 0:32] / 32.0
    frame = np.stack([np.sin(2 * np.pi * xx), np.cos(2 * np.pi * yy),
                      xx * yy], -1).astype(np.float32)
    video = jnp.asarray(np.broadcast_to(frame, (1, 9, 32, 32, 3))) * 0.8

    vp = vae.init(jax.random.PRNGKey(1), video, rng=jax.random.PRNGKey(2))
    lp = lpips.init(jax.random.PRNGKey(3), video[:, 0], video[:, 0])
    dp = disc.init(jax.random.PRNGKey(4), video[:, 0])
    # disc_start=0: BOTH optimizers move from step 0 (the adversarial term is
    # live), proving the whole two-optimizer loop optimizes, not just recon
    state = create_vae_train_state(
        vp, dp, VAETrainConfig(disc_start=0, learning_rate=1e-3,
                               disc_learning_rate=1e-3))
    step = make_vae_train_step(vae, lpips, lp, disc, donate=False)

    rec, disc_losses = [], []
    for i in range(100):
        state, metrics = step(state, video, jax.random.PRNGKey(i))
        rec.append(float(metrics["vae/rec_loss"]))
        disc_losses.append(float(metrics["vae/disc_loss"]))
    first, last = _avg(rec[:10]), _avg(rec[-10:])
    assert np.isfinite(rec).all() and np.isfinite(disc_losses).all()
    assert last < 0.7 * first, (
        f"VAE rec loss did not drop >=30%: first10={first:.4f} "
        f"last10={last:.4f}")
