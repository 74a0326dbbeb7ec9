"""Checkpoint I/O: orbax save/restore + auto-resume + pretrained loading.

TPU-native replacement for the reference's checkpoint machinery:
* DiT training: ``accelerator.save_state`` per-epoch ``checkpoint-<step>``
  dirs with FSDP full-state-dict gathering (`train/train_pyramid_flow.py:583-591`)
  -> orbax sharded checkpoints (no gathering needed; each host writes its
  shards) with the same dir naming + ``auto_resume`` scan (:262-283).
* VAE training: ``save_model``/``auto_load_model`` .pth files with
  model/optimizer/EMA/disc state (`trainer_misc/utils.py:399-472`) -> one
  orbax tree holding the whole ``VAETrainState``.
* Pretrained loading: released torch checkpoint dirs via
  ``utils.converters`` (see :func:`load_pretrained_pipeline`).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint_step",
    "auto_resume",
    "export_ema_params",
    "load_ema_params",
    "load_pretrained_components",
]


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_checkpoint(output_dir: str, step: int, state: Any):
    """Write ``<output_dir>/checkpoint-<step>`` (orbax, sharded-aware)."""
    path = os.path.join(os.path.abspath(output_dir), f"checkpoint-{step}")
    ckptr = _ckptr()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure/shardings of ``target``."""
    ckptr = _ckptr()
    return ckptr.restore(os.path.abspath(path), target)


def latest_checkpoint_step(output_dir: str) -> Optional[int]:
    """Scan ``checkpoint-*`` dirs for the newest step (reference
    ``auto_resume``, `train/train_pyramid_flow.py:262-283`)."""
    if not os.path.isdir(output_dir):
        return None
    steps = []
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m and os.path.isdir(os.path.join(output_dir, name)):
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def auto_resume(output_dir: str, state: Any):
    """(state, resumed_step) — restore the latest checkpoint if present."""
    step = latest_checkpoint_step(output_dir)
    if step is None:
        return state, 0
    path = os.path.join(output_dir, f"checkpoint-{step}")
    return restore_checkpoint(path, state), step


def export_ema_params(output_dir: str, step: int, ema_params: Any):
    """Write ``<output_dir>/checkpoint-<step>-ema`` holding ONLY the EMA
    parameter tree — the inference-ready weights the reference exports via
    its EMA save hook (`train/train_pyramid_flow.py:469-486`). Restorable
    without knowing the optimizer-state structure (:func:`load_ema_params`)."""
    path = os.path.join(os.path.abspath(output_dir), f"checkpoint-{step}-ema")
    ckptr = _ckptr()
    ckptr.save(path, ema_params, force=True)
    ckptr.wait_until_finished()
    return path


def load_ema_params(path_or_dir: str, target: Any = None) -> Any:
    """Load an EMA export. ``path_or_dir`` is either a ``checkpoint-*-ema``
    dir or a training output dir (the newest ``checkpoint-<step>-ema`` is
    picked). ``target`` (optional) supplies structure/shardings."""
    path = os.path.abspath(path_or_dir)
    if not os.path.basename(path).endswith("-ema"):
        steps = []
        for name in os.listdir(path):
            m = re.fullmatch(r"checkpoint-(\d+)-ema", name)
            if m and os.path.isdir(os.path.join(path, name)):
                steps.append(int(m.group(1)))
        if not steps:
            raise FileNotFoundError(f"no checkpoint-*-ema under {path}")
        path = os.path.join(path, f"checkpoint-{max(steps)}-ema")
    ckptr = _ckptr()
    return ckptr.restore(path, target) if target is not None else ckptr.restore(path)


# ------------------------------------------------------------- pretrained
def load_pretrained_components(model_path: str, model_variant: str = "diffusion_transformer_768p",
                               model_name: str = "pyramid_flux",
                               load_vae: bool = True):
    """Load released torch checkpoints into flax param trees.

    Mirrors the reference layout (pipeline :138-159):
      <model_path>/<model_variant>/   DiT safetensors
      <model_path>/causal_video_vae/  VAE safetensors
      <model_path>/text_encoder*/     CLIP/T5 torch weights

    Returns dict with whichever components were found.
    """
    from .converters import (
        convert_clip,
        convert_flux_dit,
        convert_mmdit,
        convert_t5,
        convert_vae,
        load_state_dict,
    )

    out = {}
    dit_dir = os.path.join(model_path, model_variant)
    if os.path.isdir(dit_dir):
        sd = load_state_dict(dit_dir)
        conv = convert_flux_dit if model_name == "pyramid_flux" else convert_mmdit
        out["dit"] = conv(sd)

    vae_dir = os.path.join(model_path, "causal_video_vae")
    if load_vae and os.path.isdir(vae_dir):
        out["vae"] = convert_vae(load_state_dict(vae_dir))

    te = os.path.join(model_path, "text_encoder")
    if os.path.isdir(te):
        out["clip"] = convert_clip(load_state_dict(te))
    te2 = os.path.join(model_path, "text_encoder_2")
    if os.path.isdir(te2):
        sd2 = load_state_dict(te2)
        if model_name == "pyramid_flux":
            out["t5"] = convert_t5(sd2)
        else:
            out["clip_g"] = convert_clip(sd2)
    te3 = os.path.join(model_path, "text_encoder_3")
    if os.path.isdir(te3):
        out["t5"] = convert_t5(load_state_dict(te3))
    return out


def load_model_config(component_dir: str, kind: str):
    """Build a model config dataclass from a checkpoint dir's ``config.json``
    (the reference uses diffusers ``register_to_config`` JSONs per component
    dir). Unknown/missing fields fall back to our defaults; returns the
    default config when no JSON is present.

    kind: 'flux' | 'mmdit' | 'vae'.
    """
    import dataclasses
    import json

    from ..models.flux.model import FluxConfig
    from ..models.mmdit.model import MMDiTConfig
    from ..models.vae.model import VAEConfig

    cls = {"flux": FluxConfig, "mmdit": MMDiTConfig, "vae": VAEConfig}[kind]
    path = os.path.join(component_dir, "config.json")
    if not os.path.isfile(path):
        return cls()
    with open(path) as f:
        raw = json.load(f)

    # field-name translation from the reference's JSON keys
    if kind == "vae":
        raw = dict(raw)
        if "encoder_layers_per_block" not in raw and "layers_per_block" in raw:
            raw["encoder_layers_per_block"] = raw["layers_per_block"]
        for k in ("encoder_layers_per_block", "decoder_layers_per_block",
                  "block_out_channels", "spatial_down_sample",
                  "temporal_down_sample"):
            if k in raw and isinstance(raw[k], list):
                raw[k] = tuple(raw[k])
    if kind == "flux" and isinstance(raw.get("axes_dims_rope"), list):
        raw["axes_dims_rope"] = tuple(raw["axes_dims_rope"])

    names = {f.name for f in dataclasses.fields(cls)}
    kwargs = {k: v for k, v in raw.items() if k in names}
    return cls(**kwargs)
