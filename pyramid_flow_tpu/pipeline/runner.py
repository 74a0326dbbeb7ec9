"""High-level runner: string prompts in, frames out.

The user-facing equivalent of the reference's
``PyramidDiTForVideoGeneration`` object (`pyramid_dit_for_video_gen_pipeline.py`):
bundles the text encoder with the generation pipeline so callers pass raw
prompts (with the reference's quality-suffix augmentation :1050 and default
negative prompt :1019).
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .pyramid_pipeline import PyramidFlowPipeline

__all__ = ["PyramidFlowRunner", "DEFAULT_NEGATIVE_PROMPT", "PROMPT_SUFFIX"]


def _resize_crop(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Aspect-preserving cover resize + center crop of [H, W, 3] uint8 to
    (th, tw) — the reference app's ``resize_crop_image`` (`app.py:148-158`)."""
    from PIL import Image

    h, w = img.shape[:2]
    scale = max(tw / w, th / h)
    rw, rh = round(w * scale), round(h * scale)
    im = Image.fromarray(img).resize((rw, rh), Image.BILINEAR)
    left, top = (rw - tw) // 2, (rh - th) // 2
    return np.asarray(im.crop((left, top, left + tw, top + th)))

PROMPT_SUFFIX = ", hyper quality, Ultra HD, 8K"
DEFAULT_NEGATIVE_PROMPT = (
    "cartoon style, worst quality, low quality, blurry, absolute black, "
    "absolute white, low res, extra limbs, extra digits, misplaced objects, "
    "mutated anatomy, monochrome, horror")


class PyramidFlowRunner:
    """pipeline + text encoder, string-prompt API."""

    def __init__(self, pipeline: PyramidFlowPipeline, text_encoder):
        self.pipeline = pipeline
        self.text_encoder = text_encoder

    @classmethod
    def from_pretrained(cls, model_path: str,
                        model_variant: str = "diffusion_transformer_768p",
                        model_name: str = "pyramid_flux",
                        dtype=jnp.bfloat16, mesh=None, **kwargs):
        from ..models.text.encoder import FluxTextEncoder, SD3TextEncoder
        from ..utils.checkpoint import load_pretrained_components

        pipe = PyramidFlowPipeline.from_pretrained(
            model_path, model_variant, model_name, dtype=dtype, mesh=mesh,
            **kwargs)
        comps = load_pretrained_components(model_path, model_variant,
                                           model_name, load_vae=False)
        if model_name == "pyramid_flux":
            te = FluxTextEncoder(comps["clip"], comps["t5"], model_path,
                                 dtype=dtype)
        else:
            te = SD3TextEncoder(comps["clip"], comps["clip_g"], comps["t5"],
                                model_path, dtype=dtype)
        return cls(pipe, te)

    def _encode_prompts(self, prompt, negative_prompt):
        if isinstance(prompt, str):
            prompt = [prompt]
        prompt = [p + PROMPT_SUFFIX for p in prompt]
        emb, mask, pooled = self.text_encoder(prompt)
        neg = negative_prompt if negative_prompt is not None else ""
        if isinstance(neg, str):
            neg = [neg] * len(prompt)
        nemb, nmask, npooled = self.text_encoder(neg)
        return (emb, mask, pooled), (nemb, nmask, npooled)

    def generate(self, prompt: Union[str, List[str]],
                 negative_prompt: Optional[str] = DEFAULT_NEGATIVE_PROMPT,
                 seed: int = 0, **kwargs):
        """Text-to-video; kwargs forward to ``PyramidFlowPipeline.generate``
        (height, width, temp, steps, guidance...)."""
        pos, neg = self._encode_prompts(prompt, negative_prompt)
        return self.pipeline.generate(
            jax.random.PRNGKey(seed), *pos, *neg, **kwargs)

    def generate_i2v(self, prompt: Union[str, List[str]], input_image,
                     negative_prompt: Optional[str] = DEFAULT_NEGATIVE_PROMPT,
                     seed: int = 0, **kwargs):
        """Image-to-video. ``input_image``: PIL.Image or [H, W, 3] uint8.

        Like the reference, the target resolution follows the image when
        ``height``/``width`` are not given (pipeline :828-829); when they ARE
        given, the image is aspect-preserving resize-cropped to them first
        (the reference app's ``resize_crop_image``, `app.py:148-158`) — an
        un-resized mismatch would otherwise crash deep in the cond packing."""
        from ..models.vae.model import chunk_encode, gaussian_sample

        pos, neg = self._encode_prompts(prompt, negative_prompt)
        img = np.asarray(input_image)
        if "height" in kwargs or "width" in kwargs:
            th, tw = kwargs.get("height"), kwargs.get("width")
            if th is None or tw is None:
                raise ValueError("pass both height and width (or neither)")
            if img.shape[:2] != (th, tw):
                img = _resize_crop(img, th, tw)
        else:
            kwargs["height"], kwargs["width"] = img.shape[0], img.shape[1]
        px = (img.astype(np.float32) / 127.5 - 1.0)[None, None]
        moments = chunk_encode(
            self.pipeline.vae, self.pipeline.vae_params, jnp.asarray(px),
            window_size=16)
        rng = jax.random.PRNGKey(seed)
        rng, sub = jax.random.split(rng)
        latent = gaussian_sample(moments, sub)
        return self.pipeline.generate_i2v(rng, latent, *pos, *neg, **kwargs)
