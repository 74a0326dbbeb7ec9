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


class FluxTextEncoder:
    """CLIP-L pooled + T5 sequence embeddings with mask.

    Args:
      model_path: checkpoint root holding ``tokenizer/``, ``tokenizer_2/``
        (as in the released layout). Weights are supplied separately
        (``clip_params``, ``t5_params``) — see ``utils.converters``.
    """

    def __init__(self, clip_params, t5_params, model_path: Optional[str] = None,
                 clip_config: CLIPTextConfig = CLIPTextConfig(),
                 t5_config: T5Config = T5Config(),
                 tokenizers: Optional[Tuple] = None,
                 max_sequence_length: int = 128,
                 dtype=jnp.bfloat16):
        self.clip = CLIPTextEncoder(config=clip_config, dtype=dtype)
        self.t5 = T5Encoder(config=t5_config, dtype=dtype)
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
        self.clip_l = CLIPTextEncoder(
            config=CLIPTextConfig(use_projection=True), dtype=dtype)
        self.clip_g = CLIPTextEncoder(config=CLIPTextConfig.clip_g(), dtype=dtype)
        self.t5 = T5Encoder(config=T5Config(), dtype=dtype)
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
