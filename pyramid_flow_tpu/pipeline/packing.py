"""Token packing for the pyramid DiT: patchify + RoPE positions + time ids.

This module replaces the reference's ``merge_input`` / ``split_output`` /
``_prepare_pyramid_image_ids`` machinery
(`pyramid_dit/flux_modules/modeling_pyramid_flux.py:185-390`): instead of
packing ragged per-stage lists into one interleaved sequence, each (sample,
stage) is one batch row of `[cond history clips ..., current clip]` tokens
with explicit metadata arrays. Everything here is shape-static per bucket.

Conventions (all matching the reference):
* patch order: ``b t (h p1) (w p2) c -> b (t h w) (p1 p2 c)`` (:286)
* temporal RoPE axis offset by the clip's start frame (:190,227-232)
* spatial positions of lower-res clips are linearly interpolated from the
  **current clip's** grid so all clips share one coordinate frame (:194-204)
* time ids: latent frame index (0-based); text handled by the model (t=0)
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.resample import interp_linear_1d_grid

__all__ = [
    "patchify",
    "unpatchify",
    "clip_positions",
    "pack_clips",
]


def patchify(x: jnp.ndarray, patch: int = 2) -> jnp.ndarray:
    """[B, T, H, W, C] -> [B, T*(H/p)*(W/p), p*p*C] with (p1, p2, c) feature
    order."""
    b, t, h, w, c = x.shape
    p = patch
    x = x.reshape(b, t, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # b t h' w' p1 p2 c
    return x.reshape(b, t * (h // p) * (w // p), p * p * c)


def unpatchify(tokens: jnp.ndarray, temp: int, height: int, width: int,
               patch: int = 2) -> jnp.ndarray:
    """Inverse of :func:`patchify`. height/width are the *latent* (unpatched)
    sizes. Returns [B, T, H, W, C]."""
    b = tokens.shape[0]
    p = patch
    hh, ww = height // p, width // p
    c = tokens.shape[-1] // (p * p)
    x = tokens.reshape(b, temp, hh, ww, p, p, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # b t h' p1 w' p2 c
    return x.reshape(b, temp, height, width, c)


def clip_positions(temp: int, height: int, width: int, train_height: int,
                   train_width: int, start_time: int) -> np.ndarray:
    """RoPE (t, h, w) positions for one clip's tokens, [temp*h*w, 3] float32.

    ``height/width`` are in patch units; ``train_*`` is the current (highest
    res) clip's patch grid, whose coordinates lower-res clips interpolate
    (reference ``_prepare_image_ids`` :186-211).
    """
    h_pos = interp_linear_1d_grid(train_height, height)
    w_pos = interp_linear_1d_grid(train_width, width)
    t_pos = np.arange(start_time, start_time + temp, dtype=np.float32)
    grid = np.zeros((temp, height, width, 3), np.float32)
    grid[..., 0] = t_pos[:, None, None]
    grid[..., 1] = h_pos[None, :, None]
    grid[..., 2] = w_pos[None, None, :]
    return grid.reshape(-1, 3)


def clip_metadata(
    shapes: Sequence[Tuple[int, ...]], patch: int = 2
) -> Tuple[np.ndarray, np.ndarray, int]:
    """(positions, time_ids, trainable) from clip SHAPES alone — pure host
    numpy, no device ops. shapes: [(B, T, H, W, C), ...]; last = current."""
    train_h = shapes[-1][2] // patch
    train_w = shapes[-1][3] // patch
    pos_list, time_list = [], []
    start_t = 0
    for (_, t, h, w, _) in shapes:
        hp, wp = h // patch, w // patch
        pos_list.append(clip_positions(t, hp, wp, train_h, train_w, start_t))
        time_list.append(np.repeat(
            np.arange(start_t, start_t + t, dtype=np.int32), hp * wp))
        start_t += t
    _, t, h, w, _ = shapes[-1]
    trainable = t * (h // patch) * (w // patch)
    return (np.concatenate(pos_list, axis=0),
            np.concatenate(time_list, axis=0), trainable)


def pack_clips(
    clips: Sequence[jnp.ndarray], patch: int = 2
) -> Tuple[jnp.ndarray, np.ndarray, np.ndarray, int]:
    """Pack a `[history..., current]` clip list into one token sequence.

    clips: list of [B, T_i, H_i, W_i, C]; the LAST clip defines the training
    grid for position interpolation (reference `modeling_pyramid_flux.py:224-225`).

    Returns:
      tokens:     [B, L, p*p*C]
      positions:  [L, 3] float32 (broadcast over batch by the caller)
      time_ids:   [L] int32 frame indices
      trainable:  token count of the last clip (the only trainable span)
    """
    train_h = clips[-1].shape[2] // patch
    train_w = clips[-1].shape[3] // patch

    tokens, pos_list, time_list = [], [], []
    start_t = 0
    for clip in clips:
        b, t, h, w, c = clip.shape
        hp, wp = h // patch, w // patch
        tokens.append(patchify(clip, patch))
        pos_list.append(clip_positions(t, hp, wp, train_h, train_w, start_t))
        times = np.repeat(
            np.arange(start_t, start_t + t, dtype=np.int32), hp * wp)
        time_list.append(times)
        start_t += t

    last = clips[-1]
    trainable = (
        last.shape[1] * (last.shape[2] // patch) * (last.shape[3] // patch)
    )
    return (
        jnp.concatenate(tokens, axis=1),
        np.concatenate(pos_list, axis=0),
        np.concatenate(time_list, axis=0),
        trainable,
    )
