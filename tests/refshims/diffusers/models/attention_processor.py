"""diffusers.models.attention_processor — a faithful SDPA-path Attention
(the VAE mid-block runs it per-frame on 4-D [B, C, H, W] inputs with
group_norm + residual_connection, video_vae/modeling_block.py:281-293,458),
plus the import-only names the reference pulls in."""

import torch
import torch.nn as nn
import torch.nn.functional as F

ADDED_KV_ATTENTION_PROCESSORS = ()
CROSS_ATTENTION_PROCESSORS = ()


class AttentionProcessor:
    pass


class AttnProcessor(AttentionProcessor):
    pass


class AttnProcessor2_0(AttentionProcessor):  # noqa: N801
    pass


class AttnAddedKVProcessor(AttentionProcessor):
    pass


class SpatialNorm(nn.Module):
    def __init__(self, f_channels, zq_channels):
        super().__init__()
        self.norm_layer = nn.GroupNorm(
            num_channels=f_channels, num_groups=32, eps=1e-6, affine=True)
        self.conv_y = nn.Conv2d(zq_channels, f_channels, 1)
        self.conv_b = nn.Conv2d(zq_channels, f_channels, 1)

    def forward(self, f, zq):
        zq = F.interpolate(zq, size=f.shape[-2:], mode="nearest")
        return self.norm_layer(f) * self.conv_y(zq) + self.conv_b(zq)


class Attention(nn.Module):
    """Subset of diffusers Attention: self-attention with optional GroupNorm,
    residual connection and output rescale — the exact configuration the
    causal VAE's spatial attention uses."""

    def __init__(
        self,
        query_dim,
        cross_attention_dim=None,
        heads=8,
        dim_head=64,
        dropout=0.0,
        bias=False,
        upcast_attention=False,
        upcast_softmax=False,
        norm_num_groups=None,
        spatial_norm_dim=None,
        out_bias=True,
        rescale_output_factor=1.0,
        residual_connection=False,
        eps=1e-5,
        _from_deprecated_attn_block=False,
        **kwargs,
    ):
        super().__init__()
        inner_dim = dim_head * heads
        self.heads = heads
        self.rescale_output_factor = rescale_output_factor
        self.residual_connection = residual_connection
        cross_attention_dim = cross_attention_dim or query_dim

        self.group_norm = (
            nn.GroupNorm(num_channels=query_dim, num_groups=norm_num_groups,
                         eps=eps, affine=True)
            if norm_num_groups is not None else None)
        self.spatial_norm = (
            SpatialNorm(f_channels=query_dim, zq_channels=spatial_norm_dim)
            if spatial_norm_dim is not None else None)

        self.to_q = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_k = nn.Linear(cross_attention_dim, inner_dim, bias=bias)
        self.to_v = nn.Linear(cross_attention_dim, inner_dim, bias=bias)
        self.to_out = nn.ModuleList(
            [nn.Linear(inner_dim, query_dim, bias=out_bias),
             nn.Dropout(dropout)])

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, temb=None, **kwargs):
        residual = hidden_states
        if self.spatial_norm is not None:
            hidden_states = self.spatial_norm(hidden_states, temb)

        input_ndim = hidden_states.ndim
        if input_ndim == 4:
            b, c, h, w = hidden_states.shape
            hidden_states = hidden_states.view(b, c, h * w).transpose(1, 2)

        if self.group_norm is not None:
            hidden_states = self.group_norm(
                hidden_states.transpose(1, 2)).transpose(1, 2)

        ctx = (encoder_hidden_states
               if encoder_hidden_states is not None else hidden_states)
        q = self.to_q(hidden_states)
        k = self.to_k(ctx)
        v = self.to_v(ctx)

        bsz = q.shape[0]
        head_dim = q.shape[-1] // self.heads

        def split(t):
            return t.view(bsz, -1, self.heads, head_dim).transpose(1, 2)

        out = F.scaled_dot_product_attention(
            split(q), split(k), split(v), attn_mask=attention_mask)
        out = out.transpose(1, 2).reshape(bsz, -1, self.heads * head_dim)
        out = self.to_out[1](self.to_out[0](out))

        if input_ndim == 4:
            out = out.transpose(-1, -2).reshape(b, c, h, w)
        if self.residual_connection:
            out = out + residual
        return out / self.rescale_output_factor
