"""CLIP text encoder (flax) — the pooled text encoder.

Faithful re-implementation of HF ``CLIPTextModel`` semantics (reference uses
CLIP-L pooled output, 768-d, for flux — `modeling_text_encoder.py:23`; SD3
additionally uses CLIP-G 1280-d — `mmdit_modules/modeling_text_encoder.py`):

* learned token + position embeddings (max 77)
* pre-LN transformer, causal attention, quick-gelu MLP
* final layer norm; pooled output = hidden state at the EOS token position
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CLIPTextConfig", "CLIPTextEncoder"]


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    hidden_act: str = "quick_gelu"  # CLIP-L; CLIP-G uses plain gelu
    # SD3's CLIPTextModelWithProjection: pooled -> text_projection (no bias)
    use_projection: bool = False
    projection_dim: int = 768

    @staticmethod
    def clip_g(use_projection: bool = True) -> "CLIPTextConfig":
        """OpenCLIP bigG (SD3's second encoder): 1280-d, 32 layers, 20 heads."""
        return CLIPTextConfig(
            hidden_size=1280, intermediate_size=5120, num_layers=32,
            num_heads=20, hidden_act="gelu", use_projection=use_projection,
            projection_dim=1280)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        h, d = cfg.num_heads, cfg.hidden_size // cfg.num_heads
        dense = lambda n: nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                   param_dtype=self.param_dtype, name=n)
        b, l, _ = x.shape
        q = dense("q_proj")(x).reshape(b, l, h, d)
        k = dense("k_proj")(x).reshape(b, l, h, d)
        v = dense("v_proj")(x).reshape(b, l, h, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * d ** -0.5
        scores = jnp.where(causal_mask, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, -1)
        return dense("out_proj")(out)


class CLIPLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        ln = lambda n: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                    param_dtype=self.param_dtype, name=n)
        x = x + CLIPAttention(config=cfg, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="self_attn")(
            ln("layer_norm1")(x), causal_mask)
        dense = lambda n, f: nn.Dense(f, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=n)
        h = ln("layer_norm2")(x)
        act = _quick_gelu if cfg.hidden_act == "quick_gelu" else nn.gelu
        x = x + dense("fc2", cfg.hidden_size)(
            act(dense("fc1", cfg.intermediate_size)(h)))
        return x


class CLIPTextEncoder(nn.Module):
    """input_ids [B, L] -> (last_hidden [B, L, D], pooled [B, D])."""

    config: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.config
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="token_embedding")
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (cfg.max_position_embeddings, cfg.hidden_size),
                         self.param_dtype)
        l = input_ids.shape[1]
        x = tok(input_ids) + pos[None, :l].astype(self.dtype)

        causal = np.tril(np.ones((l, l), bool))[None, None]
        for i in range(cfg.num_layers):
            x = CLIPLayer(config=cfg, dtype=self.dtype,
                          param_dtype=self.param_dtype, name=f"layers_{i}")(
                x, jnp.asarray(causal))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name="final_layer_norm")(x)

        # pooled: hidden at the first EOS token per row
        is_eos = input_ids == cfg.eos_token_id
        eos_pos = jnp.argmax(is_eos, axis=1)
        pooled = x[jnp.arange(x.shape[0]), eos_pos]
        if cfg.use_projection:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name="text_projection")(pooled)
        return x, pooled
