"""SD3 joint transformer block (MMDiT), TPU-native.

Re-design of ``JointTransformerBlock``/``JointAttention``
(`pyramid_dit/mmdit_modules/modeling_mmdit_block.py:396-669`) on the packed
per-row layout, reusing the flux block primitives. Differences from the flux
dual block: the final layer is ``context_pre_only`` (context gets
AdaLayerNormContinuous and no attention output / FF), and the qk-norm
parameter names are ``norm_add_q``/``norm_add_k``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..flux.blocks import (
    AdaLayerNormContinuous,
    AdaLayerNormZero,
    FeedForward,
    RMSNorm,
    _dispatch_attention,
    _heads,
    _layer_norm,
    _unheads,
)
from ...ops.rope import apply_rope

__all__ = ["JointTransformerBlock"]


class MMDiTJointAttention(nn.Module):
    """Joint text+image attention; optionally no context output (last block)."""

    num_heads: int
    head_dim: int
    causal: bool = True
    context_pre_only: bool = False
    mesh: object = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, rope_cos, rope_sin, time_ids):
        d = self.num_heads * self.head_dim
        dense = lambda name: nn.Dense(d, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        q = _heads(dense("to_q")(x), self.num_heads)
        k = _heads(dense("to_k")(x), self.num_heads)
        v = _heads(dense("to_v")(x), self.num_heads)
        q = RMSNorm(param_dtype=self.param_dtype, name="norm_q")(q)
        k = RMSNorm(param_dtype=self.param_dtype, name="norm_k")(k)

        cq = _heads(dense("add_q_proj")(ctx), self.num_heads)
        ck = _heads(dense("add_k_proj")(ctx), self.num_heads)
        cv = _heads(dense("add_v_proj")(ctx), self.num_heads)
        cq = RMSNorm(param_dtype=self.param_dtype, name="norm_add_q")(cq)
        ck = RMSNorm(param_dtype=self.param_dtype, name="norm_add_k")(ck)

        lt = ctx.shape[1]
        q = apply_rope(jnp.concatenate([cq, q], axis=2), rope_cos, rope_sin)
        k = apply_rope(jnp.concatenate([ck, k], axis=2), rope_cos, rope_sin)
        v = jnp.concatenate([cv, v], axis=2)

        # bounded-kernel envelope telemetry (see flux/blocks.py JointAttention)
        if not self.is_initializing():
            self.sow("telemetry", "q", q[:1])
            self.sow("telemetry", "k", k[:1])

        o = _dispatch_attention(q, k, v, time_ids, self.causal,
                                self.head_dim ** -0.5, self.mesh)
        o = _unheads(o)
        ctx_o, x_o = o[:, :lt], o[:, lt:]
        x_o = dense("to_out")(x_o)
        if self.context_pre_only:
            return x_o, None
        return x_o, dense("to_add_out")(ctx_o)


class JointTransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    causal: bool = True
    context_pre_only: bool = False
    mesh: object = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, temb, rope_cos, rope_sin, time_ids):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        nx, gate, shift_mlp, scale_mlp, gate_mlp = AdaLayerNormZero(
            name="norm1", **kw)(x, temb)

        if self.context_pre_only:
            nc = AdaLayerNormContinuous(name="norm1_context", **kw)(ctx, temb)
        else:
            nc, c_gate, c_shift_mlp, c_scale_mlp, c_gate_mlp = AdaLayerNormZero(
                name="norm1_context", **kw)(ctx, temb)

        x_attn, ctx_attn = MMDiTJointAttention(
            num_heads=self.num_heads, head_dim=self.head_dim,
            causal=self.causal, context_pre_only=self.context_pre_only,
            mesh=self.mesh, name="attn", **kw,
        )(nx, nc, rope_cos, rope_sin, time_ids)

        x = x + gate * x_attn
        h = _layer_norm(x) * (1 + scale_mlp) + shift_mlp
        x = x + gate_mlp * FeedForward(name="ff", **kw)(h)

        if self.context_pre_only:
            return x, ctx
        ctx = ctx + c_gate * ctx_attn
        hc = _layer_norm(ctx) * (1 + c_scale_mlp) + c_shift_mlp
        ctx = ctx + c_gate_mlp * FeedForward(name="ff_context", **kw)(hc)
        return x, ctx
