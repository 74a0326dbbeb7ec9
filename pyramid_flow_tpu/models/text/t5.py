"""T5 v1.1 encoder (flax) — the FLUX/SD3 sequence text encoder.

Faithful re-implementation of the HF ``T5EncoderModel`` semantics used by the
reference (`pyramid_dit/flux_modules/modeling_text_encoder.py:26-28`,
T5-XXL: d_model 4096, 24 layers, 64 heads x 64, d_ff 10240, gated-gelu):

* RMSNorm layer norm (no mean subtraction, no bias), eps 1e-6
* relative position bias (32 buckets, max distance 128) computed by layer 0
  and shared by all layers
* NO 1/sqrt(d) attention scaling (folded into T5's init)
* gated-gelu feed-forward: wo(gelu_tanh(wi_0(x)) * wi_1(x))

Weights load from HF torch checkpoints via ``utils.converters``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["T5Config", "T5Encoder"]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6


class T5LayerNorm(nn.Module):
    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                           self.param_dtype)
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (y * scale.astype(jnp.float32)).astype(x.dtype)


def _relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """HF T5 bidirectional bucketing (exact re-derivation)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int32) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(n.clip(1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int32)
    val_large = np.minimum(val_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_large)


class T5Attention(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, position_bias):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda n, f: nn.Dense(f, use_bias=False, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=n)
        b, l, _ = x.shape
        q = dense("q", inner)(x).reshape(b, l, cfg.num_heads, cfg.d_kv)
        k = dense("k", inner)(x).reshape(b, l, cfg.num_heads, cfg.d_kv)
        v = dense("v", inner)(x).reshape(b, l, cfg.num_heads, cfg.d_kv)

        # NOTE: no sqrt(d) scaling (T5 convention)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores + position_bias
        scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, inner)
        return dense("o", cfg.d_model)(out)


class T5Block(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, position_bias):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = T5LayerNorm(eps=cfg.layer_norm_epsilon,
                        param_dtype=self.param_dtype, name="ln_attn")(x)
        x = x + T5Attention(config=cfg, name="attn", **kw)(h, mask, position_bias)

        h = T5LayerNorm(eps=cfg.layer_norm_epsilon,
                        param_dtype=self.param_dtype, name="ln_ff")(x)
        dense = lambda n, f: nn.Dense(f, use_bias=False, name=n, **kw)
        gelu = nn.gelu(dense("wi_0", cfg.d_ff)(h), approximate=True)
        x = x + dense("wo", cfg.d_model)(gelu * dense("wi_1", cfg.d_ff)(h))
        return x


class T5Encoder(nn.Module):
    """input_ids [B, L], attention_mask [B, L] -> hidden [B, L, d_model]."""

    config: T5Config = T5Config()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        cfg = self.config
        emb = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="embed_tokens")
        x = emb(input_ids)

        l = input_ids.shape[1]
        rel = np.arange(l)[None, :] - np.arange(l)[:, None]  # memory - query
        buckets = _relative_position_bucket(
            rel, cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance)
        bias_table = self.param(
            "relative_attention_bias", nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
            self.param_dtype)
        position_bias = bias_table[jnp.asarray(buckets)]          # [L, L, H]
        position_bias = position_bias.transpose(2, 0, 1)[None]    # [1, H, L, L]
        position_bias = position_bias.astype(jnp.float32)

        mask = attention_mask.astype(bool)
        for i in range(cfg.num_layers):
            x = T5Block(config=cfg, dtype=self.dtype,
                        param_dtype=self.param_dtype, name=f"block_{i}")(
                x, mask, position_bias)
        x = T5LayerNorm(eps=cfg.layer_norm_epsilon,
                        param_dtype=self.param_dtype,
                        name="final_layer_norm")(x)
        return x
