"""PatchGAN discriminators (2D and 3D), flax.

Re-implementation of `video_vae/modeling_discriminator.py:17-122`: 4x4 convs,
stride-2 downsampling (3D variant strides (1,2,2) after the first layer),
InstanceNorm (no affine), LeakyReLU 0.2, 1-channel patch logits. Init:
normal(0, 0.02) conv weights (reference ``weights_init``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["PatchDiscriminator2D", "PatchDiscriminator3D"]

_conv_init = nn.initializers.normal(stddev=0.02)


def _instance_norm(x, spatial_axes):
    mean = x.mean(axis=spatial_axes, keepdims=True)
    var = x.var(axis=spatial_axes, keepdims=True)
    return (x - mean) / jnp.sqrt(var + 1e-5)


class PatchDiscriminator2D(nn.Module):
    """[N, H, W, C] -> [N, H', W', 1] patch logits (per-frame use)."""

    ndf: int = 64
    n_layers: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda ch, s, name: nn.Conv(
            ch, (4, 4), strides=(s, s), padding=1, kernel_init=_conv_init,
            dtype=self.dtype, name=name)
        x = nn.leaky_relu(conv(self.ndf, 2, "conv_0")(x), 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = conv(self.ndf * nf, 2, f"conv_{n}")(x)
            x = nn.leaky_relu(_instance_norm(x, (1, 2)), 0.2)
        nf = min(2 ** self.n_layers, 8)
        x = conv(self.ndf * nf, 1, f"conv_{self.n_layers}")(x)
        x = nn.leaky_relu(_instance_norm(x, (1, 2)), 0.2)
        return conv(1, 1, "conv_out")(x)


class PatchDiscriminator3D(nn.Module):
    """[N, T, H, W, C] -> patch logits; stride (1,2,2) after first layer."""

    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda ch, s, name: nn.Conv(
            ch, (4, 4, 4), strides=s, padding=1, kernel_init=_conv_init,
            dtype=self.dtype, name=name)
        x = nn.leaky_relu(conv(self.ndf, (2, 2, 2), "conv_0")(x), 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = conv(self.ndf * nf, (1, 2, 2), f"conv_{n}")(x)
            x = nn.leaky_relu(_instance_norm(x, (1, 2, 3)), 0.2)
        nf = min(2 ** self.n_layers, 8)
        x = conv(self.ndf * nf, (1, 1, 1), f"conv_{self.n_layers}")(x)
        x = nn.leaky_relu(_instance_norm(x, (1, 2, 3)), 0.2)
        return conv(1, (1, 1, 1), "conv_out")(x)
