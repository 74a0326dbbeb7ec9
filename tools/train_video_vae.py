#!/usr/bin/env python
"""Causal video VAE training CLI (GAN + LPIPS + KL).

TPU-native replacement for `train/train_video_vae.py` +
`trainer_misc/vae_ddp_trainer.py`: the DDP + context-parallel process groups
become batch sharding over the mesh; the two-optimizer GAN loop is one
jitted step. Mixed image/video training uses the rank-role split
(`create_mixed_dataloaders`).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--video_anno", required=True)
    p.add_argument("--image_anno", default=None)
    p.add_argument("--image_mix_ratio", type=float, default=0.1)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--num_frames", type=int, default=17)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--steps_per_epoch", type=int, default=2000)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--lpips_ckpt", default=None, help="vgg_lpips.pth path")
    p.add_argument("--kl_weight", type=float, default=1e-12)
    p.add_argument("--pixel_weight", type=float, default=10.0)
    p.add_argument("--perceptual_weight", type=float, default=1.0)
    p.add_argument("--disc_weight", type=float, default=0.5)
    p.add_argument("--disc_start", type=int, default=250_000)
    p.add_argument("--use_3d_disc", action="store_true")
    p.add_argument("--freeze_encoder", action="store_true")
    p.add_argument("--cp", type=int, default=1,
                   help="context-parallel degree: shard the TIME axis over "
                        "this many devices for long-clip training (the "
                        "reference's stage-2 CP, "
                        "scripts/train_causal_video_vae.sh:53-57). Requires "
                        "num_frames %% (8*cp) == 0; clips use continuation "
                        "(is_init=False) semantics")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel degree when --cp > 1 (batch axis); "
                        "dp*cp must equal the device count used")
    p.add_argument("--pretrained_vae", default=None)
    p.add_argument("--output_dir", default="runs/vae")
    p.add_argument("--save_ckpt_freq", type=int, default=1)
    p.add_argument("--print_freq", type=int, default=20)
    p.add_argument("--tensorboard_dir", default=None)
    p.add_argument("--wandb_project", default=None)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    from pyramid_flow_tpu.parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed()
    import jax.numpy as jnp
    import numpy as np

    from pyramid_flow_tpu.data.datasets import ImageDataset, VideoDataset
    from pyramid_flow_tpu.data.loaders import create_mixed_dataloaders
    from pyramid_flow_tpu.models.vae.discriminator import (
        PatchDiscriminator2D, PatchDiscriminator3D)
    from pyramid_flow_tpu.models.vae.lpips import LPIPS, convert_lpips
    from pyramid_flow_tpu.models.vae.model import CausalVideoVAE, VAEConfig
    from pyramid_flow_tpu.training.vae_trainer import (
        VAETrainConfig, create_vae_train_state, make_vae_train_step)
    from pyramid_flow_tpu.utils.checkpoint import (
        auto_resume, load_pretrained_components, save_checkpoint)
    from pyramid_flow_tpu.utils.metrics import MetricLogger

    vae = CausalVideoVAE(config=VAEConfig())
    lpips = LPIPS()
    disc = (PatchDiscriminator3D() if args.use_3d_disc
            else PatchDiscriminator2D())

    res = (args.resolution, args.resolution)
    video_ds = VideoDataset(args.video_anno, args.num_frames, res)
    image_ds = (ImageDataset(args.image_anno, 8, res)
                if args.image_anno else video_ds)
    loader, role = create_mixed_dataloaders(
        video_ds, image_ds, args.batch_size,
        rank=jax.process_index(), world=max(jax.process_count(), 1),
        image_mix_ratio=args.image_mix_ratio if args.image_anno else 0.0)
    print(f"rank {jax.process_index()} role: {role}", file=sys.stderr)

    rng = jax.random.PRNGKey(args.seed)
    sample = jnp.zeros((1, args.num_frames, args.resolution, args.resolution, 3))
    if args.pretrained_vae:
        vae_params = load_pretrained_components(args.pretrained_vae)["vae"]
    else:
        vae_params = vae.init(rng, sample, rng=rng)
    frame = sample[:, 0]
    if args.lpips_ckpt:
        from pyramid_flow_tpu.utils.converters import load_state_dict
        lpips_params = convert_lpips(load_state_dict(args.lpips_ckpt))
    else:
        print("WARNING: random LPIPS weights (pass --lpips_ckpt for real "
              "perceptual loss)", file=sys.stderr)
        lpips_params = lpips.init(jax.random.PRNGKey(1), frame, frame)
    disc_params = disc.init(
        jax.random.PRNGKey(2), sample if args.use_3d_disc else frame)

    cfg = VAETrainConfig(
        learning_rate=args.learning_rate, kl_weight=args.kl_weight,
        pixel_weight=args.pixel_weight,
        perceptual_weight=args.perceptual_weight,
        disc_weight=args.disc_weight, disc_start=args.disc_start)
    state = create_vae_train_state(vae_params, disc_params, cfg)
    state, start_step = auto_resume(args.output_dir, state)
    if start_step:
        print(f"resumed from step {start_step}", file=sys.stderr)

    if args.cp > 1:
        if args.num_frames % (8 * args.cp) != 0:
            sys.exit(f"--cp {args.cp} requires --num_frames divisible by "
                     f"{8 * args.cp} (uniform continuation shards); got "
                     f"{args.num_frames}")
        ndev = args.dp * args.cp
        mesh = jax.sharding.Mesh(
            np.asarray(jax.devices()[:ndev]).reshape(args.dp, args.cp),
            ("dp", "cp"))
        from jax.sharding import NamedSharding, PartitionSpec as P
        video_sharding = NamedSharding(
            mesh, P("dp" if args.dp > 1 else None, "cp"))
        step_fn = make_vae_train_step(
            vae, lpips, lpips_params, disc, use_3d_disc=args.use_3d_disc,
            freeze_encoder=args.freeze_encoder, is_init=False,
            mesh=mesh, cp_axis="cp", dp_axis="dp" if args.dp > 1 else None)
    else:
        video_sharding = None
        step_fn = make_vae_train_step(
            vae, lpips, lpips_params, disc, use_3d_disc=args.use_3d_disc,
            freeze_encoder=args.freeze_encoder)

    logger = MetricLogger(
        log_file=os.path.join(args.output_dir, "log.txt"),
        tensorboard_dir=args.tensorboard_dir,
        wandb_project=args.wandb_project, wandb_config=vars(args),
        print_fn=lambda m: print(m, file=sys.stderr))
    step = start_step
    for epoch in range(args.epochs):
        for _ in range(args.steps_per_epoch):
            batch = next(loader)
            video = jnp.asarray(batch["video"])
            if video_sharding is not None:
                video = jax.device_put(video, video_sharding)
            state, metrics = step_fn(state, video, rng)
            loss_val = float(metrics["vae/total_loss"])
            if not (loss_val == loss_val and abs(loss_val) != float("inf")):
                print(f"Loss is {loss_val}, stopping training", file=sys.stderr)
                sys.exit(1)
            logger.update(step=step, **{k.split("/")[-1]: float(v)
                             for k, v in metrics.items()})
            if step % args.print_freq == 0:
                logger.print_fn(f"epoch {epoch} step {step}  {logger}")
            step += 1
        logger.write_epoch_log(epoch)
        if (epoch + 1) % args.save_ckpt_freq == 0 and jax.process_index() == 0:
            save_checkpoint(args.output_dir, step, state)


if __name__ == "__main__":
    main()
