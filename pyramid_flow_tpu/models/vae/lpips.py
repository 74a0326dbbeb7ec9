"""LPIPS perceptual metric (VGG16 5-slice), flax.

Re-implementation of `video_vae/modeling_lpips.py:9-121`: input scaling layer,
VGG16 feature slices (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3),
channel-unit-normalized squared diffs, learned 1x1 "lin" heads, spatial mean,
summed over slices. Weights load from the reference's ``vgg_lpips.pth`` via
:func:`convert_lpips`.

Inputs are [N, H, W, 3] in [-1, 1] (channels-last; the reference flattens
video time into the batch, we do the same upstream).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LPIPS", "convert_lpips"]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 'features' conv layout: (out_channels, num_convs) per slice
_SLICES = (
    ((64, 64), "slice1"),
    ((128, 128), "slice2"),
    ((256, 256, 256), "slice3"),
    ((512, 512, 512), "slice4"),
    ((512, 512, 512), "slice5"),
)


class _VGGSlices(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        idx = 0
        for si, (channels, _) in enumerate(_SLICES):
            if si > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ch in channels:
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv_{idx}")(x)
                x = nn.relu(x)
                idx += 1
            outs.append(x)
        return outs


class LPIPS(nn.Module):
    """(input, target) [N, H, W, 3] -> per-sample LPIPS [N, 1, 1, 1]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        vgg = _VGGSlices(dtype=self.dtype, name="vgg")
        fx = vgg((x - shift) / scale)
        fy = vgg((y - shift) / scale)

        def unit_norm(f):
            n = jnp.sqrt(jnp.sum(f ** 2, axis=-1, keepdims=True))
            return f / (n + 1e-10)

        total = 0.0
        for k in range(len(_SLICES)):
            diff = (unit_norm(fx[k]) - unit_norm(fy[k])) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                          name=f"lin_{k}")(diff)
            total = total + lin.mean(axis=(1, 2), keepdims=True)
        return total  # [N, 1, 1, 1]


def convert_lpips(sd) -> dict:
    """Reference ``vgg_lpips.pth`` state dict -> flax tree.

    torch keys: net.slice{1..5}.{idx}.weight/bias (idx in the VGG features
    numbering), lin{k}.model.1.weight. Conv2d [O,I,kh,kw] -> [kh,kw,I,O].
    """
    p: dict = {"vgg": {}}
    conv_i = 0
    for si, (channels, slice_name) in enumerate(_SLICES):
        keys = sorted(
            {int(k.split(".")[2]) for k in sd
             if k.startswith(f"net.{slice_name}.") and k.endswith(".weight")})
        for t_idx in keys:
            w = sd[f"net.{slice_name}.{t_idx}.weight"].transpose(2, 3, 1, 0)
            p["vgg"][f"conv_{conv_i}"] = {
                "kernel": np.ascontiguousarray(w),
                "bias": sd[f"net.{slice_name}.{t_idx}.bias"],
            }
            conv_i += 1
    for k in range(5):
        w = sd[f"lin{k}.model.1.weight"].transpose(2, 3, 1, 0)
        p[f"lin_{k}"] = {"kernel": np.ascontiguousarray(w)}
    return {"params": p}
