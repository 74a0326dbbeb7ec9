"""Causal VAE building blocks (resnets, samplers, encoder/decoder blocks).

TPU-native re-design of `video_vae/modeling_resnet.py` and
`video_vae/modeling_block.py`: channels-last, pure functional streaming via
the ``cache`` collection, per-frame group norm. The released checkpoints use
only the causal 3D variants; the reference's non-causal 2D twins
(`modeling_resnet.py:153-534`, `modeling_block.py:200-688`) are provided as
per-frame modules selectable through the block-type registry.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import CausalConv3d, GroupNorm, SpatialAttention

__all__ = [
    "ResnetBlock3D",
    "Downsample2x",
    "TemporalDownsample2x",
    "Upsample2x",
    "TemporalUpsample2x",
    "DownEncoderBlock",
    "UpDecoderBlock",
    "MidBlock",
    "ResnetBlock2D",
    "DownEncoderBlock2D",
    "UpDecoderBlock2D",
    "MidBlock2D",
    "DOWN_BLOCKS",
    "UP_BLOCKS",
    "MID_BLOCKS",
]


class ResnetBlock3D(nn.Module):
    """GroupNorm -> SiLU -> CausalConv ×2 with (optionally projected) skip.

    Reference: ``CausalResnetBlock3D`` `modeling_resnet.py:16-150`
    (output_scale_factor=1 in all default configs).
    """

    out_channels: Optional[int] = None
    num_groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, is_init=True, temporal_chunk=False):
        out_ch = self.out_channels or x.shape[-1]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        h = GroupNorm(num_groups=self.num_groups, eps=self.eps,
                      param_dtype=self.param_dtype, name="norm1")(x)
        h = nn.silu(h)
        h = CausalConv3d(out_ch, (3, 3, 3), name="conv1", **kw)(
            h, is_init=is_init, temporal_chunk=temporal_chunk)

        h = GroupNorm(num_groups=self.num_groups, eps=self.eps,
                      param_dtype=self.param_dtype, name="norm2")(h)
        h = nn.silu(h)
        h = CausalConv3d(out_ch, (3, 3, 3), name="conv2", **kw)(
            h, is_init=is_init, temporal_chunk=temporal_chunk)

        if x.shape[-1] != out_ch:
            x = CausalConv3d(out_ch, (1, 1, 1), name="conv_shortcut", **kw)(
                x, is_init=is_init, temporal_chunk=temporal_chunk)

        return x + h


class Downsample2x(nn.Module):
    """Spatial 2x down: causal conv k3 stride (1,2,2). Ref :291-336."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, is_init=True, temporal_chunk=False):
        return CausalConv3d(
            self.out_channels, (3, 3, 3), stride=(1, 2, 2), name="conv",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x, is_init=is_init, temporal_chunk=temporal_chunk)


class TemporalDownsample2x(nn.Module):
    """Temporal 2x down: causal conv k3 stride (2,1,1). Ref :458-502."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, is_init=True, temporal_chunk=False):
        return CausalConv3d(
            self.out_channels, (3, 3, 3), stride=(2, 1, 1), name="conv",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x, is_init=is_init, temporal_chunk=temporal_chunk)


class Upsample2x(nn.Module):
    """Spatial 2x up: conv to 4*C then spatial depth-to-space. Ref :570-617.

    Channel order follows the reference rearrange
    ``b (c p1 p2) t h w -> b c t (h p1) (w p2)``.
    """

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, is_init=True, temporal_chunk=False):
        y = CausalConv3d(
            self.out_channels * 4, (3, 3, 3), name="conv",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x, is_init=is_init, temporal_chunk=temporal_chunk)
        b, t, h, w, _ = y.shape
        c = self.out_channels
        y = y.reshape(b, t, h, w, c, 2, 2)
        y = y.transpose(0, 1, 2, 5, 3, 6, 4)  # b t h p1 w p2 c
        return y.reshape(b, t, h * 2, w * 2, c)


class TemporalUpsample2x(nn.Module):
    """Temporal 2x up: conv to 2*C, temporal depth-to-space; drops the
    duplicated first output frame on the initial chunk. Ref :678-728.
    """

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, is_init=True, temporal_chunk=False):
        import jax

        from ...parallel.cp import current_cp_axis

        y = CausalConv3d(
            self.out_channels * 2, (3, 3, 3), name="conv",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x, is_init=is_init, temporal_chunk=temporal_chunk)
        b, t, h, w, _ = y.shape
        c = self.out_channels
        y = y.reshape(b, t, h, w, c, 2)
        y = y.transpose(0, 1, 5, 2, 3, 4)  # b t p h w c
        y = y.reshape(b, t * 2, h, w, c)
        cp_axis = current_cp_axis()
        if cp_axis is not None and is_init:
            # context-parallel init clip: the duplicated leading frame must be
            # dropped GLOBALLY (keeping it would poison every later frame
            # through the causal convs). Shift the whole sharded sequence left
            # by one: each device drops its local first frame and appends the
            # next device's first frame (reverse ppermute; the last device
            # appends zeros — a junk frame at the global end that causal convs
            # never look at; callers trim the tail). With is_init=False
            # (continuation semantics — CP *training* clips) there is no
            # duplicated frame and no shift: local depth-to-space is exact.
            n = jax.lax.axis_size(cp_axis)
            nxt = jax.lax.ppermute(
                y[:, :1], cp_axis, [(i, i - 1) for i in range(1, n)])
            y = jnp.concatenate([y[:, 1:], nxt], axis=1)
        elif cp_axis is None and is_init:
            y = y[:, 1:]
        return y


class DownEncoderBlock(nn.Module):
    """N resnets + optional spatial/temporal downsample. Ref block :467-541."""

    out_channels: int
    num_layers: int = 2
    add_spatial_downsample: bool = True
    add_temporal_downsample: bool = False
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, is_init=True, temporal_chunk=False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        for i in range(self.num_layers):
            x = ResnetBlock3D(
                out_channels=self.out_channels, num_groups=self.num_groups,
                name=f"resnets_{i}", **kw,
            )(x, is_init=is_init, temporal_chunk=temporal_chunk)
        if self.add_spatial_downsample:
            x = Downsample2x(self.out_channels, name="downsampler", **kw)(
                x, is_init=is_init, temporal_chunk=temporal_chunk)
        if self.add_temporal_downsample:
            x = TemporalDownsample2x(self.out_channels, name="temporal_downsampler", **kw)(
                x, is_init=is_init, temporal_chunk=temporal_chunk)
        return x


class UpDecoderBlock(nn.Module):
    """N resnets + optional spatial/temporal upsample. Ref block :690-759."""

    out_channels: int
    num_layers: int = 3
    add_spatial_upsample: bool = True
    add_temporal_upsample: bool = False
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, is_init=True, temporal_chunk=False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        for i in range(self.num_layers):
            x = ResnetBlock3D(
                out_channels=self.out_channels, num_groups=self.num_groups,
                name=f"resnets_{i}", **kw,
            )(x, is_init=is_init, temporal_chunk=temporal_chunk)
        if self.add_spatial_upsample:
            x = Upsample2x(self.out_channels, name="upsampler", **kw)(
                x, is_init=is_init, temporal_chunk=temporal_chunk)
        if self.add_temporal_upsample:
            x = TemporalUpsample2x(self.out_channels, name="temporal_upsampler", **kw)(
                x, is_init=is_init, temporal_chunk=temporal_chunk)
        return x


class ResnetBlock2D(nn.Module):
    """Non-causal per-frame resnet (symmetric padding), the 2D twin of
    ``ResnetBlock3D``. Reference ``ResnetBlock2D`` `modeling_resnet.py:153-288`
    — selectable via block-type strings, unused by the released configs."""

    out_channels: Optional[int] = None
    num_groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, is_init=True, temporal_chunk=False):
        del is_init, temporal_chunk  # 2D blocks have no temporal state
        out_ch = self.out_channels or x.shape[-1]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, t = x.shape[:2]

        def conv2d(name, ch, ksize, v):
            y = v.reshape((b * t,) + v.shape[2:])
            y = nn.Conv(ch, ksize, padding="SAME", name=name, **kw)(y)
            return y.reshape((b, t) + y.shape[1:])

        y = GroupNorm(num_groups=self.num_groups, eps=self.eps,
                      param_dtype=self.param_dtype, name="norm1")(x)
        y = nn.silu(y)
        y = conv2d("conv1", out_ch, (3, 3), y)
        y = GroupNorm(num_groups=self.num_groups, eps=self.eps,
                      param_dtype=self.param_dtype, name="norm2")(y)
        y = nn.silu(y)
        y = conv2d("conv2", out_ch, (3, 3), y)
        if x.shape[-1] != out_ch:
            x = conv2d("conv_shortcut", out_ch, (1, 1), x)
        return x + y


class DownEncoderBlock2D(nn.Module):
    """Per-frame 2D encoder block (reference ``DownEncoderBlock2D``
    `modeling_block.py:543-616`): N resnets + strided-conv downsample."""

    out_channels: int
    num_layers: int = 2
    add_spatial_downsample: bool = True
    add_temporal_downsample: bool = False
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, is_init=True, temporal_chunk=False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                out_channels=self.out_channels, num_groups=self.num_groups,
                name=f"resnets_{i}", **kw)(x)
        if self.add_spatial_downsample:
            b, t = x.shape[:2]
            y = x.reshape((b * t,) + x.shape[2:])
            y = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=((0, 1), (0, 1)), name="downsampler", **kw)(y)
            x = y.reshape((b, t) + y.shape[1:])
        if self.add_temporal_downsample:
            # non-causal temporal down (reference TemporalDownsample2x:398):
            # symmetric time padding, stride 2
            x = nn.Conv(self.out_channels, (3, 3, 3), strides=(2, 1, 1),
                        padding=((0, 1), (1, 1), (1, 1)),
                        name="temporal_downsampler", **kw)(x)
        return x


class UpDecoderBlock2D(nn.Module):
    """Per-frame 2D decoder block (reference ``UpDecoderBlock2D``
    `modeling_block.py:619-688`): N resnets + nearest-2x + conv upsample."""

    out_channels: int
    num_layers: int = 3
    add_spatial_upsample: bool = True
    add_temporal_upsample: bool = False
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, is_init=True, temporal_chunk=False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                out_channels=self.out_channels, num_groups=self.num_groups,
                name=f"resnets_{i}", **kw)(x)
        if self.add_spatial_upsample:
            b, t, h, w, c = x.shape
            y = x.reshape(b * t, h, w, c)
            y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
            y = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        name="upsampler", **kw)(y)
            x = y.reshape((b, t) + y.shape[1:])
        if self.add_temporal_upsample:
            x = jnp.repeat(x, 2, axis=1)
            x = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME",
                        name="temporal_upsampler", **kw)(x)
        return x


class MidBlock2D(nn.Module):
    """Per-frame 2D mid block (reference ``UNetMidBlock2D``
    `modeling_block.py:200-330`)."""

    num_layers: int = 1
    add_attention: bool = True
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, is_init=True, temporal_chunk=False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = ResnetBlock2D(num_groups=self.num_groups, name="resnets_0", **kw)(x)
        for i in range(self.num_layers):
            if self.add_attention:
                x = SpatialAttention(
                    num_groups=self.num_groups, name=f"attentions_{i}", **kw)(x)
            x = ResnetBlock2D(num_groups=self.num_groups,
                              name=f"resnets_{i+1}", **kw)(x)
        return x


class MidBlock(nn.Module):
    """resnet -> [spatial attention -> resnet]. Ref :333-464."""

    num_layers: int = 1
    add_attention: bool = True
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, is_init=True, temporal_chunk=False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = ResnetBlock3D(num_groups=self.num_groups, name="resnets_0", **kw)(
            x, is_init=is_init, temporal_chunk=temporal_chunk)
        for i in range(self.num_layers):
            if self.add_attention:
                x = SpatialAttention(
                    num_groups=self.num_groups, name=f"attentions_{i}", **kw
                )(x)
            x = ResnetBlock3D(num_groups=self.num_groups, name=f"resnets_{i+1}", **kw)(
                x, is_init=is_init, temporal_chunk=temporal_chunk)
        return x


# Block-type registry (reference selects via config strings,
# `modeling_enc_dec.py:75-78,220-224`); the causal 3D names are the
# released-checkpoint defaults.
DOWN_BLOCKS = {
    "DownEncoderBlockCausal3D": DownEncoderBlock,
    "DownEncoderBlock2D": DownEncoderBlock2D,
}
UP_BLOCKS = {
    "UpDecoderBlockCausal3D": UpDecoderBlock,
    "UpDecoderBlock2D": UpDecoderBlock2D,
}
MID_BLOCKS = {
    "CausalUNetMidBlock2D": MidBlock,
    "UNetMidBlock2D": MidBlock2D,
}
