"""miniFLUX transformer blocks, TPU-native.

Re-design of `pyramid_dit/flux_modules/modeling_flux_block.py` +
`modeling_normalization.py` for the packed per-row layout: each batch row is
one (sample, stage), so every ``forward_with_pad`` / ``hidden_length`` span
construct in the reference collapses to a plain per-row broadcast, and all
eight attention-strategy classes collapse to one flash-attention call with
time-id masking.

Weight layout matches the reference module tree (to_q/to_k/to_v/add_q_proj/…)
so torch checkpoints convert 1:1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.flash_attention import flash_attention
from ...ops.rope import apply_rope
from ...parallel.sp import sp_flash_attention

__all__ = [
    "RMSNorm",
    "AdaLayerNormZero",
    "AdaLayerNormZeroSingle",
    "AdaLayerNormContinuous",
    "FeedForward",
    "FluxTransformerBlock",
    "FluxSingleTransformerBlock",
]


def _layer_norm(x, eps=1e-6):
    """LayerNorm without affine params, fp32 math (reference LN defaults)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class RMSNorm(nn.Module):
    """Per-head-dim RMS norm, fp32 accumulation (reference
    `modeling_normalization.py:50-79`)."""

    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), self.param_dtype)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        return (xf * scale).astype(x.dtype)


class AdaLayerNormZero(nn.Module):
    """silu(temb) -> 6 modulation vectors; LN(x)*(1+scale)+shift.

    Chunk order (shift, scale, gate, shift_mlp, scale_mlp, gate_mlp) matches
    the reference (`modeling_normalization.py:191`). Zero-init so blocks start
    as identity (reference ``initialize_weights`` :169-177).
    """

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        d = x.shape[-1]
        emb = nn.Dense(6 * d, kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="linear")(nn.silu(temb))
        shift, scale, gate, shift_mlp, scale_mlp, gate_mlp = jnp.split(emb, 6, axis=-1)
        y = _layer_norm(x) * (1 + scale[:, None]) + shift[:, None]
        return y, gate[:, None], shift_mlp[:, None], scale_mlp[:, None], gate_mlp[:, None]


class AdaLayerNormZeroSingle(nn.Module):
    """Three-way modulation for single-stream blocks (ref :196-249)."""

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        d = x.shape[-1]
        emb = nn.Dense(3 * d, kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="linear")(nn.silu(temb))
        shift, scale, gate = jnp.split(emb, 3, axis=-1)
        y = _layer_norm(x) * (1 + scale[:, None]) + shift[:, None]
        return y, gate[:, None]


class AdaLayerNormContinuous(nn.Module):
    """Final-layer AdaLN. NOTE: chunk order is (scale, shift) — opposite of
    AdaLayerNormZero (reference `modeling_normalization.py:128`)."""

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        d = x.shape[-1]
        emb = nn.Dense(2 * d, kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="linear")(nn.silu(temb))
        scale, shift = jnp.split(emb, 2, axis=-1)
        return _layer_norm(x) * (1 + scale[:, None]) + shift[:, None]


class FeedForward(nn.Module):
    """gelu-tanh MLP, mult=4 (reference FeedForward, gelu-approximate)."""

    dim_out: Optional[int] = None
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        inner = int(d * self.mult)
        h = nn.Dense(inner, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="proj_in")(x)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(self.dim_out or d, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="proj_out")(h)


def _heads(x, num_heads):
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _unheads(x):
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def _dispatch_attention(q, k, v, time_ids, causal, sm_scale, mesh):
    """Plain flash attention, or Ulysses SP when a mesh with sp>1 is set.

    bounded=True: q/k are RMS-normalized here (qk-norm), which keeps the
    bounded-softmax forward inside its exponent envelope (+9% on v5e)."""
    if mesh is not None and mesh.shape.get("sp", 1) > 1:
        return sp_flash_attention(q, k, v, time_ids, mesh, causal=causal,
                                  sm_scale=sm_scale, bounded=True)
    return flash_attention(q, k, v, time_ids, causal=causal,
                           sm_scale=sm_scale, bounded=True)


class JointAttention(nn.Module):
    """Dual-stream attention: separate image/context QKV, joint softmax over
    [text; image], separate output projections.

    Replaces ``Attention`` + ``FluxAttnProcessor2_0`` + all four dual-stream
    strategy classes (reference `modeling_flux_block.py:609-874`).
    """

    num_heads: int
    head_dim: int
    causal: bool = True
    mesh: object = None  # jax.sharding.Mesh for sequence parallelism
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
        cq = RMSNorm(param_dtype=self.param_dtype, name="norm_added_q")(cq)
        ck = RMSNorm(param_dtype=self.param_dtype, name="norm_added_k")(ck)

        # text-first concat, matching RoPE/time id layout
        lt = ctx.shape[1]
        q = jnp.concatenate([cq, q], axis=2)
        k = jnp.concatenate([ck, k], axis=2)
        v = jnp.concatenate([cv, v], axis=2)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)

        # training telemetry (no-op unless 'telemetry' is mutable): batch
        # row 0's post-RoPE q/k feed bounded_softmax_overshoot — the live
        # check that fine-tuned qk-norm gains stay inside the bounded
        # kernel's exactness envelope (training/telemetry.py). Skipped at
        # init (where EVERY collection is mutable) so param trees stay clean.
        if not self.is_initializing():
            self.sow("telemetry", "q", q[:1])
            self.sow("telemetry", "k", k[:1])

        o = _dispatch_attention(q, k, v, time_ids, self.causal,
                                self.head_dim ** -0.5, self.mesh)
        o = _unheads(o)
        ctx_o, x_o = o[:, :lt], o[:, lt:]
        x_o = nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="to_out")(x_o)
        ctx_o = nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="to_add_out")(ctx_o)
        return x_o, ctx_o


class SingleAttention(nn.Module):
    """Single-stream pre-only attention (no output projection)."""

    num_heads: int
    head_dim: int
    causal: bool = True
    mesh: object = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rope_cos, rope_sin, time_ids):
        d = self.num_heads * self.head_dim
        dense = lambda name: nn.Dense(d, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        q = _heads(dense("to_q")(x), self.num_heads)
        k = _heads(dense("to_k")(x), self.num_heads)
        v = _heads(dense("to_v")(x), self.num_heads)
        q = RMSNorm(param_dtype=self.param_dtype, name="norm_q")(q)
        k = RMSNorm(param_dtype=self.param_dtype, name="norm_k")(k)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        if not self.is_initializing():  # see JointAttention
            self.sow("telemetry", "q", q[:1])
            self.sow("telemetry", "k", k[:1])
        o = _dispatch_attention(q, k, v, time_ids, self.causal,
                                self.head_dim ** -0.5, self.mesh)
        return _unheads(o)


class FluxTransformerBlock(nn.Module):
    """Dual-stream MMDiT block (reference :945-1044)."""

    num_heads: int
    head_dim: int
    causal: bool = True
    mesh: object = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, temb, rope_cos, rope_sin, time_ids):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        nx, gate, shift_mlp, scale_mlp, gate_mlp = AdaLayerNormZero(
            name="norm1", **kw)(x, temb)
        nc, c_gate, c_shift_mlp, c_scale_mlp, c_gate_mlp = AdaLayerNormZero(
            name="norm1_context", **kw)(ctx, temb)

        x_attn, ctx_attn = JointAttention(
            num_heads=self.num_heads, head_dim=self.head_dim,
            causal=self.causal, mesh=self.mesh, name="attn", **kw,
        )(nx, nc, rope_cos, rope_sin, time_ids)

        x = x + gate * x_attn
        h = _layer_norm(x) * (1 + scale_mlp) + shift_mlp
        x = x + gate_mlp * FeedForward(name="ff", **kw)(h)

        ctx = ctx + c_gate * ctx_attn
        hc = _layer_norm(ctx) * (1 + c_scale_mlp) + c_shift_mlp
        ctx = ctx + c_gate_mlp * FeedForward(name="ff_context", **kw)(hc)
        return x, ctx


class FluxSingleTransformerBlock(nn.Module):
    """Single-stream block: parallel attn + MLP with fused out proj
    (reference :877-942)."""

    num_heads: int
    head_dim: int
    mlp_ratio: float = 4.0
    causal: bool = True
    mesh: object = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, rope_cos, rope_sin, time_ids):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d = x.shape[-1]
        mlp_dim = int(d * self.mlp_ratio)

        nx, gate = AdaLayerNormZeroSingle(name="norm", **kw)(x, temb)
        mlp = nn.gelu(
            nn.Dense(mlp_dim, name="proj_mlp", **kw)(nx), approximate=True
        )
        attn = SingleAttention(
            num_heads=self.num_heads, head_dim=self.head_dim,
            causal=self.causal, mesh=self.mesh, name="attn", **kw,
        )(nx, rope_cos, rope_sin, time_ids)
        h = jnp.concatenate([attn, mlp], axis=-1)
        return x + gate * nn.Dense(d, name="proj_out", **kw)(h)
