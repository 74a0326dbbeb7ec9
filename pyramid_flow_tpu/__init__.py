"""pyramid_flow_tpu — a TPU-native rebuild of Pyramid Flow.

Autoregressive text/image-to-video generation via pyramidal flow matching,
designed from scratch for TPU: JAX/XLA compute, Pallas attention kernels,
GSPMD sharding over device meshes.

Layering (mirrors the reference's seven layers, see SURVEY.md §1):
  schedulers/  — flow-matching sigma tables + Euler step (pure functions)
  ops/         — Pallas/XLA kernels: packed flash attention, RoPE, causal conv
  models/      — flux + mmdit DiT backbones, causal video VAE, text encoders
  pipeline/    — the PyramidFlow runner: noising, sampling, generate APIs
  parallel/    — mesh axes, shardings, sequence-parallel attention wrappers
  training/    — optax train states, trainers, LR schedules, EMA
  data/        — datasets, aspect/length bucketing, loaders
  utils/       — checkpointing (orbax), torch-weight converters, metrics
"""

__version__ = "0.1.0"
