"""Text-encoder facades: prompts -> (prompt_embeds, attention_mask, pooled).

TPU-native equivalents of ``FluxTextEncoderWithMask``
(`pyramid_dit/flux_modules/modeling_text_encoder.py:15-133`) and
``SD3TextEncoderWithMask`` (`mmdit_modules/modeling_text_encoder.py:15-140`):

* flux: CLIP-L pooled (768) + T5 sequence embeddings (4096, max len 128)
* sd3:  CLIP-L + CLIP-G projected pooled (concat 2048) + T5 sequence

Tokenizers load from a local checkpoint directory via ``transformers``
(host-side, zero-egress: the files ship with the released checkpoints).
Encoders are jitted per (batch, length) bucket.
"""

from __future__ import annotations

import os
from functools import partial
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .clip import CLIPTextConfig, CLIPTextEncoder
from .t5 import T5Config, T5Encoder

__all__ = ["FluxTextEncoder", "SD3TextEncoder"]


def _load_tokenizer(path: str, kind: str):
    if kind == "clip":
        from transformers import CLIPTokenizer
        return CLIPTokenizer.from_pretrained(path)
    from transformers import T5TokenizerFast
    return T5TokenizerFast.from_pretrained(path)


def _read_json(component_dir: Optional[str]):
    if not component_dir:
        return None
    p = os.path.join(component_dir, "config.json")
    if not os.path.isfile(p):
        return None
    import json
    with open(p) as f:
        return json.load(f)


def clip_config_from_dir(component_dir: Optional[str],
                         use_projection: Optional[bool] = None
                         ) -> Optional[CLIPTextConfig]:
    """Build a :class:`CLIPTextConfig` from a HF ``text_encoder*/config.json``
    (the released checkpoints ship diffusers-style component dirs). Returns
    None when no config file is present (caller falls back to the released
    default sizes)."""
    raw = _read_json(component_dir)
    if raw is None:
        return None
    if use_projection is None:
        use_projection = "WithProjection" in str(raw.get("architectures", ""))
    base = CLIPTextConfig()
    return CLIPTextConfig(
        vocab_size=raw.get("vocab_size", base.vocab_size),
        hidden_size=raw.get("hidden_size", base.hidden_size),
        intermediate_size=raw.get("intermediate_size", base.intermediate_size),
        num_layers=raw.get("num_hidden_layers", base.num_layers),
        num_heads=raw.get("num_attention_heads", base.num_heads),
        max_position_embeddings=raw.get("max_position_embeddings",
                                        base.max_position_embeddings),
        layer_norm_eps=raw.get("layer_norm_eps", base.layer_norm_eps),
        eos_token_id=raw.get("eos_token_id", base.eos_token_id),
        hidden_act=raw.get("hidden_act", base.hidden_act),
        use_projection=use_projection,
        projection_dim=raw.get("projection_dim", base.projection_dim))


def t5_config_from_dir(component_dir: Optional[str]) -> Optional[T5Config]:
    """Build a :class:`T5Config` from a HF ``text_encoder*/config.json``;
    None when absent."""
    raw = _read_json(component_dir)
    if raw is None:
        return None
    base = T5Config()
    return T5Config(
        vocab_size=raw.get("vocab_size", base.vocab_size),
        d_model=raw.get("d_model", base.d_model),
        d_kv=raw.get("d_kv", base.d_kv),
        d_ff=raw.get("d_ff", base.d_ff),
        num_layers=raw.get("num_layers", base.num_layers),
        num_heads=raw.get("num_heads", base.num_heads),
        relative_attention_num_buckets=raw.get(
            "relative_attention_num_buckets",
            base.relative_attention_num_buckets),
        relative_attention_max_distance=raw.get(
            "relative_attention_max_distance",
            base.relative_attention_max_distance),
        layer_norm_epsilon=raw.get("layer_norm_epsilon",
                                   base.layer_norm_epsilon))


class FluxTextEncoder:
    """CLIP-L pooled + T5 sequence embeddings with mask.

    Args:
      model_path: checkpoint root holding ``tokenizer/``, ``tokenizer_2/``
        (as in the released layout). Weights are supplied separately
        (``clip_params``, ``t5_params``) — see ``utils.converters``.
    """

    def __init__(self, clip_params, t5_params, model_path: Optional[str] = None,
                 clip_config: Optional[CLIPTextConfig] = None,
                 t5_config: Optional[T5Config] = None,
                 tokenizers: Optional[Tuple] = None,
                 max_sequence_length: int = 128,
                 dtype=jnp.bfloat16):
        # config resolution: explicit arg > checkpoint dir config.json >
        # released-size default (so non-default-sized checkpoints load)
        if clip_config is None and model_path is not None:
            clip_config = clip_config_from_dir(
                os.path.join(model_path, "text_encoder"))
        if t5_config is None and model_path is not None:
            t5_config = t5_config_from_dir(
                os.path.join(model_path, "text_encoder_2"))
        self.clip = CLIPTextEncoder(config=clip_config or CLIPTextConfig(),
                                    dtype=dtype)
        self.t5 = T5Encoder(config=t5_config or T5Config(), dtype=dtype)
        self.clip_params = clip_params
        self.t5_params = t5_params
        self.max_sequence_length = max_sequence_length
        if tokenizers is not None:
            self.clip_tokenizer, self.t5_tokenizer = tokenizers
        else:
            assert model_path is not None
            self.clip_tokenizer = _load_tokenizer(
                os.path.join(model_path, "tokenizer"), "clip")
            self.t5_tokenizer = _load_tokenizer(
                os.path.join(model_path, "tokenizer_2"), "t5")
        self._clip_apply = jax.jit(self.clip.apply)
        self._t5_apply = jax.jit(self.t5.apply)

    def tokenize(self, prompts: Union[str, List[str]]):
        if isinstance(prompts, str):
            prompts = [prompts]
        clip_in = self.clip_tokenizer(
            prompts, padding="max_length",
            max_length=self.clip_tokenizer.model_max_length,
            truncation=True, return_tensors="np")
        t5_in = self.t5_tokenizer(
            prompts, padding="max_length", max_length=self.max_sequence_length,
            truncation=True, return_tensors="np")
        return (jnp.asarray(clip_in["input_ids"]),
                jnp.asarray(t5_in["input_ids"]),
                jnp.asarray(t5_in["attention_mask"]))

    def __call__(self, prompts: Union[str, List[str]]):
        clip_ids, t5_ids, t5_mask = self.tokenize(prompts)
        _, pooled = self._clip_apply(self.clip_params, clip_ids)
        embeds = self._t5_apply(self.t5_params, t5_ids, t5_mask)
        return embeds, t5_mask.astype(bool), pooled


class SD3TextEncoder:
    """CLIP-L + CLIP-G (projected pooled, concat 2048) + T5 sequence."""

    def __init__(self, clip_l_params, clip_g_params, t5_params,
                 model_path: Optional[str] = None,
                 tokenizers: Optional[Tuple] = None,
                 max_sequence_length: int = 128,
                 dtype=jnp.bfloat16):
        cfg_l = cfg_g = cfg_t5 = None
        if model_path is not None:
            cfg_l = clip_config_from_dir(
                os.path.join(model_path, "text_encoder"), use_projection=True)
            cfg_g = clip_config_from_dir(
                os.path.join(model_path, "text_encoder_2"),
                use_projection=True)
            cfg_t5 = t5_config_from_dir(
                os.path.join(model_path, "text_encoder_3"))
        self.clip_l = CLIPTextEncoder(
            config=cfg_l or CLIPTextConfig(use_projection=True), dtype=dtype)
        self.clip_g = CLIPTextEncoder(
            config=cfg_g or CLIPTextConfig.clip_g(), dtype=dtype)
        self.t5 = T5Encoder(config=cfg_t5 or T5Config(), dtype=dtype)
        self.clip_l_params = clip_l_params
        self.clip_g_params = clip_g_params
        self.t5_params = t5_params
        self.max_sequence_length = max_sequence_length
        if tokenizers is not None:
            self.tok_l, self.tok_g, self.tok_t5 = tokenizers
        else:
            assert model_path is not None
            self.tok_l = _load_tokenizer(os.path.join(model_path, "tokenizer"), "clip")
            self.tok_g = _load_tokenizer(os.path.join(model_path, "tokenizer_2"), "clip")
            self.tok_t5 = _load_tokenizer(os.path.join(model_path, "tokenizer_3"), "t5")
        self._apply_l = jax.jit(self.clip_l.apply)
        self._apply_g = jax.jit(self.clip_g.apply)
        self._apply_t5 = jax.jit(self.t5.apply)

    def __call__(self, prompts: Union[str, List[str]]):
        if isinstance(prompts, str):
            prompts = [prompts]

        def clip_ids(tok):
            return jnp.asarray(tok(
                prompts, padding="max_length", max_length=77,
                truncation=True, return_tensors="np")["input_ids"])

        t5_in = self.tok_t5(
            prompts, padding="max_length", max_length=self.max_sequence_length,
            truncation=True, return_tensors="np")

        _, pooled_l = self._apply_l(self.clip_l_params, clip_ids(self.tok_l))
        _, pooled_g = self._apply_g(self.clip_g_params, clip_ids(self.tok_g))
        pooled = jnp.concatenate([pooled_l, pooled_g], axis=-1)
        mask = jnp.asarray(t5_in["attention_mask"])
        embeds = self._apply_t5(
            self.t5_params, jnp.asarray(t5_in["input_ids"]), mask)
        return embeds, mask.astype(bool), pooled
