"""Ulysses-style sequence parallelism for the flash-attention path.

The reference implements SP as autograd-wrapped NCCL all_to_all calls that
re-shard [seq-sharded, all-heads] <-> [all-seq, head-sharded] around every
attention (`trainer_misc/communicate.py:7-66`,
`modeling_flux_block.py:103-186`). Here the same dance is two
``jax.lax.all_to_all`` calls inside a ``shard_map`` over the ``sp`` mesh
axis — differentiable for free, compiled into the surrounding jit, riding
ICI. The surrounding model runs under GSPMD; only the attention core is
manual (SURVEY.md §7.1).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.flash_attention import flash_attention

__all__ = ["sp_flash_attention", "ulysses_attention_core"]


def ulysses_attention_core(q, k, v, time_ids, *, axis_name: str,
                           causal: bool, sm_scale: Optional[float],
                           bounded: Optional[bool] = None):
    """Runs on one sp shard: q/k/v are [B, H, L/sp, D], time_ids [B, L] full.

    all_to_all #1: scatter heads, gather sequence -> [B, H/sp, L, D]
    flash attention over the full sequence with a head subset
    all_to_all #2: inverse.
    """
    def a2a_in(x):
        return jax.lax.all_to_all(
            x, axis_name, split_axis=1, concat_axis=2, tiled=True)

    def a2a_out(x):
        return jax.lax.all_to_all(
            x, axis_name, split_axis=2, concat_axis=1, tiled=True)

    qf, kf, vf = a2a_in(q), a2a_in(k), a2a_in(v)
    o = flash_attention(qf, kf, vf, time_ids, causal=causal,
                        sm_scale=sm_scale, bounded=bounded)
    return a2a_out(o)


def sp_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    time_ids: jnp.ndarray,
    mesh: Mesh,
    *,
    causal: bool = True,
    sm_scale: Optional[float] = None,
    bounded: Optional[bool] = None,
    axis_name: str = "sp",
) -> jnp.ndarray:
    """Sequence-parallel flash attention under GSPMD.

    q, k, v: [B, H, L, D] logical arrays (L gets sharded over ``sp``);
    time_ids: [B, L] (replicated). Heads must divide the sp axis size.
    """
    sp = mesh.shape[axis_name]
    if sp == 1:
        return flash_attention(q, k, v, time_ids, causal=causal,
                               sm_scale=sm_scale, bounded=bounded)
    assert q.shape[1] % sp == 0, (
        f"heads ({q.shape[1]}) must divide the sp axis ({sp})")

    # pad the sequence so each shard is a whole number of kernel blocks;
    # padded keys carry INVALID time so they never contribute
    from ..ops.flash_attention import INVALID_TIME

    l = q.shape[2]
    target = -(-l // (sp * 128)) * (sp * 128)
    pad = target - l
    if pad:
        padding = [(0, 0), (0, 0), (0, pad), (0, 0)]
        q = jnp.pad(q, padding)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)
        time_ids = jnp.pad(time_ids, [(0, 0), (0, pad)],
                           constant_values=INVALID_TIME)

    fn = functools.partial(
        ulysses_attention_core, axis_name=axis_name, causal=causal,
        sm_scale=sm_scale, bounded=bounded)
    shmap = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(None, None, axis_name, None),
            P(None, None, axis_name, None),
            P(None, None, axis_name, None),
            P(),  # time ids replicated
        ),
        out_specs=P(None, None, axis_name, None),
        check_vma=False,
    )
    out = shmap(q, k, v, time_ids)
    return out[:, :, :l] if pad else out
