"""Temporal context parallelism for the causal VAE (halo exchange).

TPU-native replacement for the reference's VAE context-parallel machinery
(`video_vae/context_parallel_ops.py`, `utils.py:19-105`,
`modeling_causal_conv.py:95-114`): the per-conv isend/irecv halo exchange
becomes a ``jax.lax.ppermute`` of the last ``k_t - 1`` frames to the next
device along a ``cp`` mesh axis; the first device's halo is zeroed (the
causal boundary), which is exactly the reference's front zero-padding.

Differences from the reference (deliberate, SPMD-friendly):
* shards are uniform — each device holds ``T/cp`` frames (the reference gives
  rank 0 one extra frame; SPMD traces one program for all devices, so we
  require ``T % cp == 0``). Stride-2 temporal convs stay aligned when the
  per-device frame count is even at every downsampling level.
* gradients flow through ``ppermute`` automatically (the reference wraps the
  exchange in hand-written ``autograd.Function``s).

Usage::

    with cp_context("cp"):
        out = shard_map(lambda x: vae.apply(vars, x, method=vae.encode),
                        mesh, in_specs=P(None, "cp"), out_specs=P(None, "cp"))(x)

Inside the context, every ``CausalConv3d`` performs halo exchange instead of
local zero padding.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["cp_context", "current_cp_axis", "halo_exchange", "cp_vae_apply",
           "cp_vae_decode"]

_STATE = threading.local()


@contextlib.contextmanager
def cp_context(axis_name: str):
    """Enable context-parallel halo exchange for CausalConv3d during trace."""
    prev = getattr(_STATE, "axis", None)
    _STATE.axis = axis_name
    try:
        yield
    finally:
        _STATE.axis = prev


def current_cp_axis() -> Optional[str]:
    return getattr(_STATE, "axis", None)


def halo_exchange(x: jnp.ndarray, halo_frames: int, axis_name: str) -> jnp.ndarray:
    """Prepend the previous device's last ``halo_frames`` along time (axis 1).

    Device 0 receives zeros (causal start). Equivalent to the reference's
    ``_cp_pass_from_previous_rank`` (`context_parallel_ops.py:76-114`).
    """
    n = jax.lax.axis_size(axis_name)
    assert x.shape[1] >= halo_frames, (
        f"per-device clip ({x.shape[1]} frames) smaller than the halo "
        f"({halo_frames}); use fewer cp shards or longer clips")
    halo = x[:, -halo_frames:]
    perm = [(i, (i + 1) % n) for i in range(n)]
    halo = jax.lax.ppermute(halo, axis_name, perm)
    is_first = jax.lax.axis_index(axis_name) == 0
    halo = jnp.where(is_first, jnp.zeros_like(halo), halo)
    return jnp.concatenate([halo, x], axis=1)


def cp_vae_apply(method_fn, mesh: Mesh, x: jnp.ndarray,
                 axis_name: str = "cp"):
    """Run a VAE method with the time axis sharded over ``axis_name``.

    method_fn: x_shard -> y_shard (e.g. a closure over vae.apply).
    x: [B, T, H, W, C] with T divisible by the cp axis size; per-device
    frames must stay >= 2 (the conv halo) through every temporal downsample
    level — i.e. T/cp >= 16 for the default 8x temporal compression.
    """
    def inner(x_shard):
        with cp_context(axis_name):
            return method_fn(x_shard)

    shmap = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=P(None, axis_name),
        out_specs=P(None, axis_name),
        check_vma=False,
    )
    # jit so closure params become proper committed constants on the mesh
    return jax.jit(shmap)(x)


def cp_vae_decode(vae, variables, z: jnp.ndarray, mesh: Mesh,
                  axis_name: str = "cp"):
    """Context-parallel VAE decode with uniform SPMD shards.

    The reference decodes under CP with rank 0 holding one extra frame and
    ``is_init_image=True`` while other ranks use ``False``
    (`modeling_causal_vae.py:540-586`, `context_parallel_ops.py:14-73`) —
    uneven shapes that SPMD cannot trace as one program. Equivalent uniform
    formulation used here:

    * every device decodes ``T'/cp`` latent frames; per-conv halo exchange
      supplies temporal context, and device 0's halo is zeros — exactly the
      front zero-padding an ``is_init`` conv applies, so all conv arithmetic
      matches the reference;
    * each temporal upsampler drops the duplicated leading frame GLOBALLY by
      shifting the sharded sequence left one frame (reverse ppermute inside
      ``TemporalUpsample2x``) — keeping it locally would poison every later
      frame through the causal convs. The last device accumulates
      ``temporal_scale - 1`` junk frames at the global tail (causal convs
      never look at them); they are trimmed after the gather.

    The result is bit-exact with monolithic decode and has the monolithic
    shape ``[B, 1 + 8*(T'-1), H*8, W*8, 3]``.

    z: latent [B, T', H, W, C] with T' divisible by the cp axis size and
    T'/cp >= 2 (conv halo).
    """
    n = mesh.shape[axis_name]
    assert z.shape[1] % n == 0, (z.shape, n)
    assert z.shape[1] // n >= 2, "need >= 2 latent frames per cp shard"

    def inner(z_shard):
        with cp_context(axis_name):
            return vae.apply(variables, z_shard, method=vae.decode,
                             is_init=True)

    shmap = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=P(None, axis_name),
        out_specs=P(None, axis_name),
        check_vma=False,
    )
    out = jax.jit(shmap)(z)
    drop = vae.config.downsample_scale - 1  # junk frames at the global tail
    return out[:, : out.shape[1] - drop]
