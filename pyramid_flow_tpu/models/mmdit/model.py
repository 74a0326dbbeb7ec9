"""PyramidDiffusionMMDiT — the SD3-style MMDiT backbone, TPU-native.

Re-design of `pyramid_dit/mmdit_modules/modeling_pyramid_mmdit.py:60-497` on
the same packed-token interface as the flux backbone (each batch row = one
(sample, stage); patchify in the pipeline):

* spatial position: SD3 cropped 2D sincos table (192x192, base_size =
  sample_size/patch = 64), center-cropped to the CURRENT clip's grid and
  bilinearly interpolated for low-res conditioning clips
  (`modeling_embedding.py:269-308`). Here that whole mechanism reduces to a
  bilinear gather of the table at the (already interpolated) float token
  positions offset by the static crop origin.
* temporal position: single-axis RoPE over the full head dim
  (``temp_pos_embed_type='rope'``, axes_dim=[64]; :115-118) applied to
  [text; latent] with text at t=0.
* 24 joint blocks; the last is ``context_pre_only`` (:132) — its context
  stream gets AdaLayerNormContinuous and no context output.

Config matches the released SD3 checkpoint: 24 heads x 64, in 16ch,
patch 2, caption_projection_dim = inner_dim = 1536, pooled 2048 (CLIP-L+G).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.flash_attention import INVALID_TIME
from ...ops.rope import rope_freqs
from ..flux.blocks import AdaLayerNormContinuous
from ..flux.model import TimestepTextEmbed
from .blocks import JointTransformerBlock

__all__ = ["MMDiTConfig", "PyramidDiffusionMMDiT", "sincos_pos_embed_table"]


class _ScanJointBlock(JointTransformerBlock):
    """Carry-style wrapper of the joint block for nn.scan."""

    def __call__(self, carry, temb, cos, sin, time_ids):
        x, ctx = carry
        x, ctx = super().__call__(x, ctx, temb, cos, sin, time_ids)
        return (x, ctx), None


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    sample_size: int = 128
    patch_size: int = 2
    in_channels: int = 16
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    caption_projection_dim: int = 1536
    pooled_projection_dim: int = 2048
    joint_attention_dim: int = 4096
    pos_embed_max_size: int = 192
    use_temporal_causal: bool = True
    gradient_checkpointing_ratio: float = 0.6

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def token_dim(self) -> int:
        return self.patch_size * self.patch_size * self.in_channels


def sincos_pos_embed_table(embed_dim: int, grid_size: int, base_size: int,
                           interpolation_scale: float = 1.0) -> np.ndarray:
    """SD3 2D sincos table [grid, grid, D] (diffusers formula; reference
    `modeling_embedding.py:22-76`). First half of channels encodes the W
    coordinate, second half H (the meshgrid(w, h) quirk)."""
    pos = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size)
    pos = pos / interpolation_scale

    def embed_1d(p):  # p: [N] -> [N, D/2]
        half = embed_dim // 2
        omega = np.arange(half // 2, dtype=np.float64) / (half / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", p.astype(np.float64), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    w_mesh, h_mesh = np.meshgrid(pos, pos)  # both [H, W]; w varies on axis 1
    emb_w = embed_1d(w_mesh.reshape(-1))
    emb_h = embed_1d(h_mesh.reshape(-1))
    table = np.concatenate([emb_w, emb_h], axis=1)  # [H*W, D]
    return table.reshape(grid_size, grid_size, embed_dim).astype(np.float32)


def _bilinear_gather(table: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """Sample table [G, G, D] at float coords y, x: [B, L] -> [B, L, D]."""
    g = table.shape[0]
    y = jnp.clip(y, 0.0, g - 1)
    x = jnp.clip(x, 0.0, g - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, g - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, g - 1)
    y1 = jnp.minimum(y0 + 1, g - 1)
    x1 = jnp.minimum(x0 + 1, g - 1)
    fy = (y - y0)[..., None]
    fx = (x - x0)[..., None]
    v00 = table[y0, x0]
    v01 = table[y0, x1]
    v10 = table[y1, x0]
    v11 = table[y1, x1]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


class PyramidDiffusionMMDiT(nn.Module):
    """SD3 MMDiT over packed tokens.

    Inputs match ``PyramidFluxTransformer`` plus ``pos_offset [B, 2]``: the
    (top, left) crop origin of the 192x192 sincos table for each row
    (= (192 - ori_grid)/2, computed by the pipeline from the current clip).
    """

    config: MMDiTConfig = MMDiTConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    mesh: object = None

    @nn.compact
    def __call__(self, latent_tokens, latent_pos, latent_time, text_emb,
                 text_mask, pooled, timestep, pos_offset):
        cfg = self.config
        d = cfg.inner_dim
        assert cfg.caption_projection_dim == d, "joint blocks need equal dims"
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, lt = text_emb.shape[:2]

        temb = TimestepTextEmbed(embedding_dim=d, name="time_text_embed", **kw)(
            timestep, pooled)
        ctx = nn.Dense(d, name="context_embedder", **kw)(text_emb)

        x = nn.Dense(d, name="pos_embed_proj", **kw)(latent_tokens)
        # spatial sincos: buffer-param initialized from the SD3 table (loaded
        # from checkpoints via the converter; crop+interp == bilinear gather)
        table = self.param(
            "pos_embed_table",
            lambda key: jnp.asarray(sincos_pos_embed_table(
                d, cfg.pos_embed_max_size,
                cfg.sample_size // cfg.patch_size)),
        )
        y = latent_pos[..., 1].astype(jnp.float32) + pos_offset[:, 0:1]
        xc = latent_pos[..., 2].astype(jnp.float32) + pos_offset[:, 1:2]
        x = x + _bilinear_gather(table.astype(jnp.float32), y, xc).astype(x.dtype)

        # temporal RoPE over the whole head dim, text at t=0
        t_pos = jnp.concatenate(
            [jnp.zeros((b, lt, 1), jnp.float32),
             latent_pos[..., :1].astype(jnp.float32)], axis=1)
        cos, sin = rope_freqs(t_pos, (cfg.attention_head_dim,))

        text_time = jnp.where(text_mask, 0, INVALID_TIME).astype(jnp.int32)
        time_ids = jnp.concatenate(
            [text_time, latent_time.astype(jnp.int32)], axis=1)

        blk_kw = dict(
            num_heads=cfg.num_attention_heads,
            head_dim=cfg.attention_head_dim,
            causal=cfg.use_temporal_causal,
            mesh=self.mesh,
            **kw,
        )
        # first N-1 uniform blocks run under nn.scan (one traced body; cuts
        # per-program op count + compile time ~20x); the context_pre_only
        # final block runs separately
        scan_cls = _ScanJointBlock
        if self.remat:
            scan_cls = nn.remat(scan_cls, prevent_cse=False)
        scanned = nn.scan(
            scan_cls,
            variable_axes={"params": 0, "telemetry": 0},
            split_rngs={"params": True},
            in_axes=nn.broadcast,
            length=cfg.num_layers - 1,
        )(context_pre_only=False, name="transformer_blocks", **blk_kw)
        (x, ctx), _ = scanned((x, ctx), temb, cos, sin, time_ids)

        x, ctx = JointTransformerBlock(
            context_pre_only=True, name="final_block", **blk_kw,
        )(x, ctx, temb, cos, sin, time_ids)

        x = AdaLayerNormContinuous(name="norm_out", **kw)(x, temb)
        return nn.Dense(cfg.token_dim, name="proj_out",
                        kernel_init=nn.initializers.zeros, **kw)(x)
