#!/usr/bin/env python
"""DiT training CLI (AR temporal-pyramid or full-sequence).

TPU-native replacement for `train/train_pyramid_flow.py` +
`trainer_misc/fsdp_trainer.py`: GSPMD over a (dp, fsdp, sp) mesh replaces
Accelerate FSDP + torchrun; one jitted train step carries noising, forward,
loss, clip, anomaly-skip, and EMA. Data comes from pre-extracted latents
(+ text features) via the length-grouped bucketeer.

Single-program SPMD: run once per host (jax.distributed auto-init under
multi-host launchers); no rank math in user code.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_text_encoder(args, comps):
    """Frozen text encoders for online raw-text training (the reference's
    ``--load_text_encoder``, `train/train_pyramid_flow.py:381-445`)."""
    from pyramid_flow_tpu.models.text.encoder import (
        FluxTextEncoder, SD3TextEncoder)
    if args.model_name == "pyramid_flux":
        return FluxTextEncoder(comps["clip"], comps["t5"], args.model_path)
    return SD3TextEncoder(comps["clip"], comps["clip_g"], comps["t5"],
                          args.model_path)


def fill_text_features(batch_np, text_encoder):
    """Run the frozen encoders over a raw-text batch (host tokenize +
    jitted encode), producing the same fields pre-extracted features give.
    The 10% CFG drop happens downstream in the jitted train step by
    substituting the null features (reference
    `pyramid_dit_for_video_gen_pipeline.py:597-614`)."""
    import numpy as _np
    emb, mask, pooled = text_encoder(list(batch_np["text"]))
    out = dict(batch_np)
    out["text_emb"] = _np.asarray(emb, _np.float32)
    out["text_mask"] = _np.asarray(mask, bool)
    out["pooled"] = _np.asarray(pooled, _np.float32)
    return out


def parse_args():
    p = argparse.ArgumentParser()
    # model
    p.add_argument("--model_name", default="pyramid_flux",
                   choices=["pyramid_flux", "pyramid_mmdit"])
    p.add_argument("--model_path", default=None,
                   help="released checkpoint root to finetune from")
    p.add_argument("--model_variant", default="diffusion_transformer_768p")
    p.add_argument("--load_vae", action="store_true",
                   help="train from raw pixels (otherwise pre-extracted latents)")
    p.add_argument("--load_text_encoder", action="store_true",
                   help="train from raw text: run the frozen T5/CLIP encoders "
                        "per step instead of loading pre-extracted features "
                        "(reference pyramid_dit_for_video_gen_pipeline.py:597-614)")
    # data
    p.add_argument("--anno_file", default=None,
                   help="required unless --debug_tiny (synthetic batches)")
    p.add_argument("--null_text_fea", default=None,
                   help="null_text.npz from extract_text_features.py")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_frames", type=int, default=16)
    # schedule / optimization
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=1000)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--steps_per_epoch", type=int, default=1000)
    p.add_argument("--clip_grad", type=float, default=1.0)
    p.add_argument("--gradient_checkpointing", action="store_true")
    # pyramid
    p.add_argument("--use_temporal_pyramid", action="store_true", default=True)
    p.add_argument("--no_temporal_pyramid", dest="use_temporal_pyramid",
                   action="store_false")
    p.add_argument("--sample_ratios", type=int, nargs=3, default=[1, 2, 1])
    p.add_argument("--max_temporal_length", type=int, default=31)
    p.add_argument("--frame_per_unit", type=int, default=1)
    p.add_argument("--video_sync_group", type=int, default=8)
    p.add_argument("--corrupt_ratio", type=float, default=1 / 3)
    # parallelism
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=0, help="0 = all remaining")
    p.add_argument("--sp", type=int, default=1)
    p.add_argument("--fsdp_min_shard_dim", type=int, default=1024,
                   help="only shard params with a divisible dim >= this "
                        "(lower it for small finetunes to actually shard)")
    # checkpointing / logging
    p.add_argument("--output_dir", default="runs/dit")
    p.add_argument("--save_ckpt_freq", type=int, default=1, help="epochs")
    p.add_argument("--auto_resume", action="store_true", default=True)
    p.add_argument("--print_freq", type=int, default=20)
    p.add_argument("--bound_probe_freq", type=int, default=500,
                   help="log train/bound_overshoot_log2 every N steps and "
                        "warn when the bounded flash kernel's exactness "
                        "envelope is at risk (0 disables)")
    p.add_argument("--tensorboard_dir", default=None,
                   help="write scalar summaries (torch SummaryWriter)")
    p.add_argument("--wandb_project", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--debug_tiny", action="store_true",
                   help="tiny model config (CI/smoke testing)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    from pyramid_flow_tpu.parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed()
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding

    from pyramid_flow_tpu.data.datasets import LengthGroupedVideoTextDataset
    from pyramid_flow_tpu.data.loaders import (
        create_length_grouped_video_text_dataloader)
    from pyramid_flow_tpu.models.flux.model import FluxConfig, PyramidFluxTransformer
    from pyramid_flow_tpu.models.mmdit.model import MMDiTConfig, PyramidDiffusionMMDiT
    from pyramid_flow_tpu.parallel.mesh import (
        MeshConfig, batch_spec, make_mesh, param_sharding)
    from pyramid_flow_tpu.pipeline.noising import sample_stage_length
    from pyramid_flow_tpu.schedulers.flow_matching import (
        PyramidFlowMatchEulerDiscreteScheduler)
    from pyramid_flow_tpu.training.lr_schedules import cosine_schedule
    from pyramid_flow_tpu.training.train_state import TrainConfig, create_train_state
    from pyramid_flow_tpu.training.trainer import make_train_step
    from pyramid_flow_tpu.utils.checkpoint import (
        auto_resume, export_ema_params, load_pretrained_components,
        save_checkpoint)
    from pyramid_flow_tpu.utils.metrics import MetricLogger

    n = len(jax.devices())
    fsdp = args.fsdp or max(n // (args.dp * args.sp), 1)
    mesh = make_mesh(MeshConfig(dp=args.dp, fsdp=fsdp, sp=args.sp))
    print(f"mesh: {dict(mesh.shape)}", file=sys.stderr)

    dtype = jnp.bfloat16
    if args.debug_tiny:
        flux_cfg = FluxConfig(
            in_channels=64, num_layers=2, num_single_layers=2,
            attention_head_dim=16, num_attention_heads=8,
            joint_attention_dim=64, pooled_projection_dim=32,
            axes_dims_rope=(8, 4, 4))
        mmdit_cfg = MMDiTConfig(
            in_channels=16, num_layers=2, attention_head_dim=16,
            num_attention_heads=8, caption_projection_dim=128,
            pooled_projection_dim=32, joint_attention_dim=64)
        dtype = jnp.float32
    else:
        flux_cfg, mmdit_cfg = FluxConfig(), MMDiTConfig()
    if args.model_name == "pyramid_flux":
        dit = PyramidFluxTransformer(
            config=flux_cfg, dtype=dtype, mesh=mesh,
            remat=args.gradient_checkpointing)
    else:
        dit = PyramidDiffusionMMDiT(
            config=mmdit_cfg, dtype=dtype, mesh=mesh,
            remat=args.gradient_checkpointing)
    sched = PyramidFlowMatchEulerDiscreteScheduler()

    # init / load params
    text_encoder = None
    if args.model_path:
        comps = load_pretrained_components(
            args.model_path, args.model_variant, args.model_name,
            load_vae=args.load_vae)
        if "dit" not in comps:
            sys.exit(f"no DiT weights under "
                     f"{args.model_path}/{args.model_variant} — check "
                     f"--model_path/--model_variant")
        params = comps["dit"]
        if args.load_text_encoder:
            missing = [k for k in (("clip", "t5") if args.model_name ==
                       "pyramid_flux" else ("clip", "clip_g", "t5"))
                       if k not in comps]
            if missing:
                sys.exit(f"--load_text_encoder: missing text-encoder weights "
                         f"{missing} under {args.model_path}/text_encoder*")
            text_encoder = build_text_encoder(args, comps)
    else:
        if args.load_text_encoder:
            sys.exit("--load_text_encoder needs --model_path (tokenizers + "
                     "frozen T5/CLIP weights)")
        b = args.batch_size
        cfg = dit.config
        params = dit.init(
            jax.random.PRNGKey(args.seed),
            jnp.zeros((b, 64, cfg.in_channels)), jnp.zeros((b, 64, 3)),
            jnp.zeros((b, 64), jnp.int32),
            jnp.zeros((b, 128, cfg.joint_attention_dim)),
            jnp.ones((b, 128), bool),
            jnp.zeros((b, cfg.pooled_projection_dim)), jnp.zeros((b,)))

    with jax.set_mesh(mesh):
        shard_stats = {}
        params = jax.device_put(params, param_sharding(
            mesh, params, min_shard_dim=args.fsdp_min_shard_dim,
            stats_out=shard_stats))
        if fsdp > 1 and shard_stats.get("sharded_fraction", 1.0) < 0.5:
            print("WARNING: <50% of parameter bytes are fsdp-sharded — "
                  "ZeRO memory savings are mostly inactive; consider "
                  f"--fsdp_min_shard_dim below {args.fsdp_min_shard_dim}",
                  file=sys.stderr)
        lr = cosine_schedule(args.learning_rate, 1e-6, args.steps_per_epoch,
                             args.epochs, args.warmup_steps)
        state = create_train_state(params, TrainConfig(
            learning_rate=args.learning_rate, weight_decay=args.weight_decay,
            max_grad_norm=args.clip_grad, lr_schedule=lr))
        start_step = 0
        if args.auto_resume:
            state, start_step = auto_resume(args.output_dir, state)
            if start_step:
                print(f"resumed from step {start_step}", file=sys.stderr)

        step_fn = make_train_step(
            dit, sched, tuple(args.sample_ratios), args.use_temporal_pyramid,
            args.frame_per_unit, args.corrupt_ratio)

        # bounded-kernel envelope telemetry (training/telemetry.py): a
        # fine-tune that inflates qk-norm gains must announce itself before
        # it drifts outside the bounded flash forward's exactness envelope
        overshoot_probe = None
        if args.bound_probe_freq:
            from pyramid_flow_tpu.training.telemetry import (
                make_bound_overshoot_probe, mmdit_pos_offset_fn)
            pos_fn = None
            if hasattr(dit.config, "pos_embed_max_size"):
                pos_fn = mmdit_pos_offset_fn(dit.config.pos_embed_max_size)
            overshoot_probe = make_bound_overshoot_probe(
                dit, sched, pos_offset_fn=pos_fn)

        if args.anno_file:
            ds = LengthGroupedVideoTextDataset(
                args.anno_file, args.max_frames,
                load_text_fea=not args.load_text_encoder)
            loader = create_length_grouped_video_text_dataloader(
                ds, args.batch_size, rank=jax.process_index(),
                world=jax.process_count(), sync_group=args.video_sync_group)
        elif args.debug_tiny:
            def _synthetic_loader():
                gen = np.random.default_rng(args.seed)
                cfg0 = dit.config
                c = cfg0.in_channels // 4  # latent channels (patch 2)
                t = 1 + args.frame_per_unit * 2
                while True:
                    yield {
                        "latents": gen.standard_normal(
                            (args.batch_size, t, 16, 16, c)).astype(np.float32),
                        "text_emb": gen.standard_normal(
                            (args.batch_size, 8, cfg0.joint_attention_dim)
                        ).astype(np.float32),
                        "text_mask": np.ones((args.batch_size, 8), bool),
                        "pooled": gen.standard_normal(
                            (args.batch_size, cfg0.pooled_projection_dim)
                        ).astype(np.float32),
                    }
            loader = _synthetic_loader()
        else:
            sys.exit("--anno_file is required unless --debug_tiny")

        null = (np.load(args.null_text_fea) if args.null_text_fea else None)
        if text_encoder is not None and null is None:
            # null features = encoding of the empty prompt, computed once
            # (what extract_text_features.py would have cached)
            nemb, _, npooled = text_encoder("")
            null = {"prompt_embed": np.asarray(nemb, np.float32)[0],
                    "pooled_prompt_embed": np.asarray(npooled, np.float32)[0]}
        logger = MetricLogger(
            log_file=os.path.join(args.output_dir, "log.txt"),
            tensorboard_dir=args.tensorboard_dir,
            wandb_project=args.wandb_project, wandb_config=vars(args),
            print_fn=lambda m: print(m, file=sys.stderr))
        rng = jax.random.PRNGKey(args.seed)
        rank = jax.process_index()

        step = start_step
        for epoch in range(args.epochs):
            for _ in range(args.steps_per_epoch):
                batch_np = next(loader)
                if (text_encoder is not None and "text" in batch_np
                        and "text_emb" not in batch_np):
                    batch_np = fill_text_features(batch_np, text_encoder)
                b = batch_np["latents"].shape[0]
                lt = batch_np["text_emb"].shape[1] if "text_emb" in batch_np else 128
                cfg = dit.config
                batch = {
                    "latents": batch_np["latents"],
                    "text_emb": batch_np.get(
                        "text_emb",
                        np.zeros((b, lt, cfg.joint_attention_dim), np.float32)),
                    "text_mask": batch_np.get(
                        "text_mask", np.ones((b, lt), bool)),
                    "pooled": batch_np.get(
                        "pooled",
                        np.zeros((b, cfg.pooled_projection_dim), np.float32)),
                }
                if null is not None:
                    batch["null_text_emb"] = np.broadcast_to(
                        null["prompt_embed"][None], batch["text_emb"].shape)
                    batch["null_pooled"] = np.broadcast_to(
                        null["pooled_prompt_embed"][None], batch["pooled"].shape)
                else:
                    batch["null_text_emb"] = np.zeros_like(batch["text_emb"])
                    batch["null_pooled"] = np.zeros_like(batch["pooled"])
                batch = {
                    k: jax.device_put(
                        jnp.asarray(v),
                        NamedSharding(mesh, batch_spec(np.ndim(v) - 1)))
                    for k, v in batch.items()
                }

                max_units = 1 + (batch["latents"].shape[1] - 1) // args.frame_per_unit
                units = tuple(sample_stage_length(
                    rank, step, 3, args.max_temporal_length,
                    args.frame_per_unit, args.video_sync_group, max_units))

                state, metrics = step_fn(state, batch, rng,
                                         num_units_per_stage=units)
                loss_val = float(metrics["train/loss"])
                if not np.isfinite(loss_val):
                    # reference hard-exits on NaN loss (fsdp_trainer:95-97)
                    print(f"Loss is {loss_val}, stopping training",
                          file=sys.stderr)
                    sys.exit(1)
                logger.update(step=step, **{k.split("/")[-1]: float(v)
                                            for k, v in metrics.items()})
                if overshoot_probe is not None and \
                        step % args.bound_probe_freq == 0:
                    from pyramid_flow_tpu.training.telemetry import (
                        OVERSHOOT_WARN_LOG2)
                    over = float(overshoot_probe(
                        state.params, batch["latents"], batch["text_emb"],
                        batch["text_mask"], batch["pooled"],
                        jax.random.fold_in(rng, step)))
                    logger.update(step=step, bound_overshoot_log2=over)
                    if over > OVERSHOOT_WARN_LOG2:
                        logger.print_fn(
                            f"WARNING: bounded-softmax overshoot {over:.0f} "
                            f"log2 units (> {OVERSHOOT_WARN_LOG2:.0f}) — "
                            "qk-norm gains are drifting out of the bounded "
                            "kernel's exactness envelope; restart this run "
                            "with PF_BOUNDED_SOFTMAX=0 (kernel choice is "
                            "compiled into the running step)")
                if step % args.print_freq == 0:
                    logger.print_fn(f"epoch {epoch} step {step}  {logger}")
                step += 1

            logger.write_epoch_log(epoch)
            if (epoch + 1) % args.save_ckpt_freq == 0 and jax.process_index() == 0:
                save_checkpoint(args.output_dir, step, state)
                # inference-ready EMA weights, restorable without the
                # optimizer-state structure (reference EMA save hook,
                # train/train_pyramid_flow.py:469-486)
                export_ema_params(args.output_dir, step, state.ema_params)
                print(f"saved checkpoint-{step} (+ema)", file=sys.stderr)


if __name__ == "__main__":
    main()
