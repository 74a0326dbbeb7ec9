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
                        freeze_encoder=False, donate=True, is_init=True,
                        mesh=None, cp_axis=None, dp_axis=None,
                        grads_only=False):
    """Build the jitted GAN-VAE step.

    step(state, video [B,T,H,W,3], rng) -> (state, metrics)

    ``grads_only=True`` returns ``(gen_grads, disc_grads, metrics)`` without
    applying optimizer updates — used by the CP exactness tests to compare
    raw gradients (post-Adam params amplify fp-association noise into ±lr
    sign flips on noise-dominated elements, which is not a parallelism bug).

    Context parallelism (``cp_axis`` + ``mesh``): the time axis is sharded
    over the ``cp_axis`` mesh axis — the reference's VAE stage-2 long-clip
    training (`causal_video_vae_wrapper.py:106-135`,
    `scripts/train_causal_video_vae.sh:53-57`). TPU-native form:

    * every ``CausalConv3d`` halo-exchanges ``k_t-1`` frames via
      ``lax.ppermute`` instead of the reference's per-conv isend/irecv;
    * KL uses the globally-gathered posterior: per-sample KL sums are
      ``psum``-ed over the cp axis before the batch mean (the reference
      gathers the posterior tensor itself, `modeling_causal_vae.py:553-554`
      — same value, no gather materialized);
    * LPIPS and the 2D discriminator are per-frame: they run on each shard's
      frames and reduce with ``pmean`` — exact. The 3D discriminator needs
      the whole clip: its input is ``all_gather``-ed over cp (redundant
      compute on each device, exact);
    * shards are uniform (SPMD traces one program), so clips must have
      ``T % (8*cp) == 0`` frames and run with ``is_init=False``
      (continuation semantics: no special lone first frame). The reference
      instead gives rank 0 an uneven extra frame — a torch-only luxury.
      Numerically the clip start still sees zero history (device 0's halo is
      zeros == causal front padding).

    ``dp_axis`` optionally adds batch sharding over another mesh axis (the
    reference's DDP); gradients of replicated params reduce automatically
    through the ``shard_map`` transpose.
    """
    from jax.sharding import PartitionSpec as P

    from ..models.vae.model import _split_moments
    from ..parallel.cp import cp_context

    cp = cp_axis is not None
    if cp:
        assert mesh is not None, "cp training needs the mesh"
        assert not is_init, (
            "CP training uses uniform continuation clips (is_init=False, "
            "T % (8*cp) == 0)")
        red_axes = tuple(a for a in (dp_axis, cp_axis) if a)
        vspec = P(dp_axis, cp_axis) if dp_axis else P(None, cp_axis)

    def pm(x):
        """Global mean of a per-shard mean (uniform shards => exact)."""
        return jax.lax.pmean(x, red_axes) if cp else x

    def flatten_t(x):  # [B, T, H, W, C] -> [(B T), H, W, C]
        return x.reshape((-1,) + x.shape[2:])

    def disc_input(r):
        """What the discriminator sees — ONE definition so the generator's
        logits_fake and the disc step's real/fake stay conventions-identical."""
        if not use_3d_disc:
            return flatten_t(r)  # 2D PatchGAN judges frames independently
        if cp:  # 3D disc sees the whole clip on every device
            return jax.lax.all_gather(r, cp_axis, axis=1, tiled=True)
        return r

    def nll_of(recon, video, gen_params, cfg):
        x = flatten_t(video)
        y = flatten_t(recon)
        rec = jnp.mean((x - y) ** 2, axis=(1, 2, 3), keepdims=True)
        p = lpips.apply(lpips_params, x, y)  # [N, 1, 1, 1]
        nll = cfg.pixel_weight * rec + cfg.perceptual_weight * p
        logvar = gen_params["logvar"]
        nll = nll / jnp.exp(logvar) + logvar
        return pm(jnp.sum(nll) / nll.shape[0]), pm(rec.mean()), pm(p.mean())

    def gen_loss_core(gen_params, disc_params, video, noise, cfg, disc_on):
        """Per-shard generator loss; all scalars are global (replicated)."""
        vae_vars = {"params": gen_params["vae"]}
        moments = vae.apply(vae_vars, video, method=vae.encode,
                            is_init=is_init)
        if freeze_encoder:
            moments = jax.lax.stop_gradient(moments)
        mean, logvar_m = _split_moments(moments)
        z = mean + jnp.exp(0.5 * logvar_m) * noise.astype(mean.dtype)
        feats = vae.apply(vae_vars, z, method=vae.decode_features,
                          is_init=is_init)
        w_last = gen_params["vae"]["decoder"]["conv_out"]["kernel"]
        b_last = gen_params["vae"]["decoder"]["conv_out"]["bias"]
        recon = apply_causal_conv_out(w_last, b_last, feats)

        nll, rec_m, p_m = nll_of(recon, video, gen_params, cfg)
        kl_rows = gaussian_kl(moments)  # [B] per-sample sums over local frames
        if cp:
            kl_rows = jax.lax.psum(kl_rows, cp_axis)  # global posterior KL
        kl = kl_rows.mean()
        if cp and dp_axis:
            kl = jax.lax.pmean(kl, dp_axis)

        logits_fake = disc.apply({"params": disc_params}, disc_input(recon))
        g_loss = pm(-jnp.mean(logits_fake))

        # adaptive weight: grads w.r.t. the last conv only. Each helper
        # returns the SAME globally-normalized scalar the real losses use, so
        # pmean of per-shard grads == the unsharded gradient.
        feats_sg = jax.lax.stop_gradient(feats)

        def nll_w(w):
            r = apply_causal_conv_out(w, b_last, feats_sg)
            return nll_of(r, video, gen_params, cfg)[0]

        def g_w(w):
            r = apply_causal_conv_out(w, b_last, feats_sg)
            return pm(-jnp.mean(
                disc.apply({"params": disc_params}, disc_input(r))))

        def gnorm(f):
            g = jax.grad(f)(w_last)
            if cp:
                g = jax.lax.pmean(g, red_axes)
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

    def noise_like_latent(video, rng):
        """Posterior noise drawn at the GLOBAL latent shape — identical values
        sharded or monolithic (JAX PRNG is shape+key deterministic)."""
        ds = vae.config.downsample_scale
        b, t, h, w, _ = video.shape
        t_lat = (t - 1) // ds + 1
        shape = (b, t_lat, h // ds, w // ds, vae.config.latent_channels)
        return jax.random.normal(rng, shape, vae.dtype)

    def step_fn(state: VAETrainState, video, rng):
        cfg = state.config
        rng = jax.random.fold_in(rng, state.step)
        disc_on = (state.step >= cfg.disc_start).astype(jnp.float32)
        noise = noise_like_latent(video, rng)

        # ---------------- generator ----------------
        def gen_loss_fn(gen_params):
            if cp:
                def body(gp, dprm, v, nz, don):
                    with cp_context(cp_axis):
                        return gen_loss_core(gp, dprm, v, nz, cfg, don)

                aux_specs = {k: P() for k in (
                    "vae/nll_loss", "vae/kl_loss", "vae/rec_loss",
                    "vae/perception_loss", "vae/g_loss", "vae/d_weight",
                    "vae/logvar")}
                aux_specs["_recon"] = vspec
                return jax.shard_map(
                    body, mesh=mesh,
                    in_specs=(P(), P(), vspec, vspec, P()),
                    out_specs=(P(), aux_specs),
                    check_vma=False,
                )(gen_params, state.disc_params, video, noise, disc_on)
            return gen_loss_core(gen_params, state.disc_params, video, noise,
                                 cfg, disc_on)

        (g_total, aux), g_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_params)
        recon = aux.pop("_recon")
        updates, gen_opt_state = state.gen_tx.update(
            g_grads, state.gen_opt_state, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, updates)

        # -------------- discriminator --------------
        def disc_loss_core(disc_params, video_, recon_):
            real = disc_input(video_)
            fake = jax.lax.stop_gradient(disc_input(recon_))
            lr_ = disc.apply({"params": disc_params}, real)
            lf_ = disc.apply({"params": disc_params}, fake)
            d_loss = 0.5 * (pm(jnp.mean(jax.nn.relu(1.0 - lr_)))
                            + pm(jnp.mean(jax.nn.relu(1.0 + lf_))))
            return disc_on * d_loss, (d_loss, pm(lr_.mean()), pm(lf_.mean()))

        def disc_loss_fn(disc_params):
            if cp:
                return jax.shard_map(
                    disc_loss_core, mesh=mesh,
                    in_specs=(P(), vspec, vspec),
                    out_specs=(P(), (P(), P(), P())),
                    check_vma=False,
                )(disc_params, video, recon)
            return disc_loss_core(disc_params, video, recon)

        (d_total, (d_loss, lr_m, lf_m)), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc_params)

        metrics = dict(aux)
        metrics.update({
            "vae/total_loss": g_total, "vae/disc_loss": d_loss,
            "vae/logits_real": lr_m, "vae/logits_fake": lf_m,
        })
        if grads_only:
            return g_grads, d_grads, metrics

        d_updates, disc_opt_state = state.disc_tx.update(
            d_grads, state.disc_opt_state, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)
        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params, gen_opt_state=gen_opt_state,
            disc_params=disc_params, disc_opt_state=disc_opt_state,
        )
        return new_state, metrics

    donate_names = ("state",) if donate and not grads_only else ()
    return jax.jit(step_fn, donate_argnames=donate_names)
