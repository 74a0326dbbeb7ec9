"""Two-optimizer GAN-VAE training step (generator + discriminator).

Re-expression of the reference VAE training
(`video_vae/modeling_loss.py:46-192`, `trainer_misc/vae_ddp_trainer.py:14-171`)
as ONE jitted step doing both optimizer updates:

* generator loss: per-sample MSE + LPIPS, scaled by a learnable logvar
  (nll = l/exp(logvar) + logvar), + KL (weight 1e-12 in the recipe) +
  adaptive-weight hinge generator loss. The adaptive weight
  ``||d nll/d w_last|| / ||d g/d w_last||`` (reference :87-102) is computed
  by differentiating ONLY through the decoder's final conv — exactly what
  torch's ``retain_graph`` last-layer grads do, at the cost of two cheap
  extra conv/LPIPS backprops.
* discriminator loss: hinge on (real, stop_grad(fake)), gated by
  ``step >= disc_start`` via ``where`` so the whole step stays jittable.

DDP = batch sharding over the (dp, fsdp) mesh axes; the GAN losses are plain
means so gradients all-reduce automatically under GSPMD.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.vae.model import (
    apply_causal_conv_out,
    gaussian_kl,
    gaussian_sample,
)

__all__ = ["VAETrainConfig", "VAETrainState", "create_vae_train_state",
           "make_vae_train_step", "AdaptiveLossWeight"]


class AdaptiveLossWeight:
    """Timestep-bucketed loss reweighter (reference `modeling_loss.py:10-22`;
    defined-but-unused there, kept for parity). Maintains an EMA of per-bucket
    loss magnitudes and weights each sample by the clipped inverse."""

    def __init__(self, timestep_range=(0.0, 1.0), buckets: int = 30,
                 weight_range=(1e-7, 1e7), decay: float = 0.99):
        self.bucket_ranges = jnp.linspace(
            timestep_range[0], timestep_range[1], buckets - 1)
        self.bucket_losses = jnp.ones((buckets,), jnp.float32)
        self.weight_range = weight_range
        self.decay = decay

    def weight(self, timestep):
        idx = jnp.searchsorted(self.bucket_ranges, timestep)
        return jnp.clip(1.0 / self.bucket_losses[idx], *self.weight_range)

    def update(self, timestep, loss):
        idx = jnp.searchsorted(self.bucket_ranges, timestep)
        self.bucket_losses = self.bucket_losses.at[idx].set(
            self.decay * self.bucket_losses[idx] + (1 - self.decay) * loss)


@dataclasses.dataclass(frozen=True)
class VAETrainConfig:
    learning_rate: float = 1e-4
    disc_learning_rate: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.95
    weight_decay: float = 1e-4
    max_grad_norm: float = 1.0
    # loss weights (scripts/train_causal_video_vae.sh:33-37)
    kl_weight: float = 1e-12
    pixel_weight: float = 10.0
    perceptual_weight: float = 1.0
    disc_weight: float = 0.5
    disc_start: int = 250_000
    logvar_init: float = 0.0


class VAETrainState(struct.PyTreeNode):
    step: jnp.ndarray
    gen_params: Any            # {"vae": ..., "logvar": scalar}
    gen_opt_state: Any
    disc_params: Any
    disc_opt_state: Any
    gen_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    disc_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    config: VAETrainConfig = struct.field(pytree_node=False)


def create_vae_train_state(vae_params, disc_params,
                           config: VAETrainConfig = VAETrainConfig()):
    gen_params = {"vae": vae_params["params"],
                  "logvar": jnp.asarray(config.logvar_init, jnp.float32)}
    gen_tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adamw(config.learning_rate, b1=config.beta1, b2=config.beta2,
                    weight_decay=config.weight_decay),
    )
    disc_tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adamw(config.disc_learning_rate, b1=config.beta1,
                    b2=config.beta2, weight_decay=config.weight_decay),
    )
    return VAETrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        gen_opt_state=gen_tx.init(gen_params),
        disc_params=disc_params["params"],
        disc_opt_state=disc_tx.init(disc_params["params"]),
        gen_tx=gen_tx,
        disc_tx=disc_tx,
        config=config,
    )


def make_vae_train_step(vae, lpips, lpips_params, disc, *, use_3d_disc=False,
                        freeze_encoder=False, donate=True):
    """Build the jitted GAN-VAE step.

    step(state, video [B,T,H,W,3], rng) -> (state, metrics)
    """

    def flatten_t(x):  # [B, T, H, W, C] -> [(B T), H, W, C]
        return x.reshape((-1,) + x.shape[2:])

    def recon_and_nll(gen_params, video, rng):
        vae_vars = {"params": gen_params["vae"]}
        moments = vae.apply(vae_vars, video, method=vae.encode)
        if freeze_encoder:
            moments = jax.lax.stop_gradient(moments)
        z = gaussian_sample(moments, rng)
        feats = vae.apply(vae_vars, z, method=vae.decode_features)
        w_last = gen_params["vae"]["decoder"]["conv_out"]["kernel"]
        b_last = gen_params["vae"]["decoder"]["conv_out"]["bias"]
        recon = apply_causal_conv_out(w_last, b_last, feats)
        return moments, feats, recon, (w_last, b_last)

    def nll_of(recon, video, gen_params, cfg):
        x = flatten_t(video)
        y = flatten_t(recon)
        rec = jnp.mean((x - y) ** 2, axis=(1, 2, 3), keepdims=True)
        p = lpips.apply(lpips_params, x, y)  # [N, 1, 1, 1]
        nll = cfg.pixel_weight * rec + cfg.perceptual_weight * p
        logvar = gen_params["logvar"]
        nll = nll / jnp.exp(logvar) + logvar
        return jnp.sum(nll) / nll.shape[0], rec.mean(), p.mean()

    def step_fn(state: VAETrainState, video, rng):
        cfg = state.config
        rng = jax.random.fold_in(rng, state.step)
        disc_on = (state.step >= cfg.disc_start).astype(jnp.float32)

        # ---------------- generator ----------------
        def gen_loss_fn(gen_params):
            moments, feats, recon, (w_last, b_last) = recon_and_nll(
                gen_params, video, rng)
            nll, rec_m, p_m = nll_of(recon, video, gen_params, cfg)
            kl = gaussian_kl(moments).mean()

            disc_in = recon if use_3d_disc else flatten_t(recon)
            logits_fake = disc.apply({"params": state.disc_params}, disc_in)
            g_loss = -jnp.mean(logits_fake)

            # adaptive weight: grads w.r.t. the last conv only
            feats_sg = jax.lax.stop_gradient(feats)

            def nll_w(w):
                r = apply_causal_conv_out(w, b_last, feats_sg)
                return nll_of(r, video, gen_params, cfg)[0]

            def g_w(w):
                r = apply_causal_conv_out(w, b_last, feats_sg)
                d_in = r if use_3d_disc else flatten_t(r)
                return -jnp.mean(disc.apply({"params": state.disc_params}, d_in))

            def gnorm(f):
                g = jax.grad(f)(w_last)
                return jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2))

            d_weight = jnp.where(
                disc_on > 0,
                jnp.clip(gnorm(nll_w) / (gnorm(g_w) + 1e-4), 0.0, 1e4),
                0.0)
            d_weight = jax.lax.stop_gradient(d_weight) * cfg.disc_weight

            loss = nll + cfg.kl_weight * kl + d_weight * disc_on * g_loss
            aux = {
                "vae/nll_loss": nll, "vae/kl_loss": kl, "vae/rec_loss": rec_m,
                "vae/perception_loss": p_m, "vae/g_loss": g_loss,
                "vae/d_weight": d_weight, "vae/logvar": gen_params["logvar"],
                "_recon": recon,
            }
            return loss, aux

        (g_total, aux), g_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_params)
        recon = aux.pop("_recon")
        updates, gen_opt_state = state.gen_tx.update(
            g_grads, state.gen_opt_state, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, updates)

        # -------------- discriminator --------------
        def disc_loss_fn(disc_params):
            real = video if use_3d_disc else flatten_t(video)
            fake = jax.lax.stop_gradient(
                recon if use_3d_disc else flatten_t(recon))
            lr_ = disc.apply({"params": disc_params}, real)
            lf_ = disc.apply({"params": disc_params}, fake)
            d_loss = 0.5 * (
                jnp.mean(jax.nn.relu(1.0 - lr_)) + jnp.mean(jax.nn.relu(1.0 + lf_)))
            return disc_on * d_loss, (d_loss, lr_.mean(), lf_.mean())

        (d_total, (d_loss, lr_m, lf_m)), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc_params)
        d_updates, disc_opt_state = state.disc_tx.update(
            d_grads, state.disc_opt_state, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        metrics = dict(aux)
        metrics.update({
            "vae/total_loss": g_total, "vae/disc_loss": d_loss,
            "vae/logits_real": lr_m, "vae/logits_fake": lf_m,
        })
        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params, gen_opt_state=gen_opt_state,
            disc_params=disc_params, disc_opt_state=disc_opt_state,
        )
        return new_state, metrics

    return jax.jit(step_fn, donate_argnames=("state",) if donate else ())
