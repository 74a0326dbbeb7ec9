"""Core causal-VAE primitives, TPU-native.

Layout is channels-last ``[B, T, H, W, C]`` throughout (XLA's preferred conv
layout on TPU; the reference uses torch-native ``[B, C, T, H, W]``).

* :class:`CausalConv3d` — temporally-causal 3D conv. Re-expresses the
  reference's mutable streaming deque (`video_vae/modeling_causal_conv.py:116-146`)
  as a flax ``cache`` variable collection: chunked decode threads the carry
  functionally, so the whole window loop jits cleanly.
* :func:`causal_group_norm` — per-frame GroupNorm (reference
  ``CausalGroupNorm``, `modeling_causal_conv.py:36-43`): stats are computed per
  (batch, frame) so chunked and monolithic execution match bit-for-bit.
* :class:`SpatialAttention` — the mid-block per-frame attention (reference
  `modeling_block.py:449-464` + diffusers deprecated Attention block): one head
  of width C over H*W tokens, fp32 softmax.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["CausalConv3d", "causal_group_norm", "SpatialAttention"]


class CausalConv3d(nn.Module):
    """Temporally-causal 3D convolution.

    Padding: ``k_t - 1`` frames of zeros at the temporal front, symmetric
    spatial padding — reference `modeling_causal_conv.py:70-77`.

    Streaming (``temporal_chunk=True``): keeps the last 2 input frames in a
    ``cache`` collection. On a continuation chunk (``is_init=False``):
      * stride-1, k_t=3: prepend both cached frames (reference :138-139)
      * stride-2, k_t=3: prepend only the last cached frame (reference :140-141)
    and the new cache is the last 2 frames of the concatenated input
    (reference :143). k_t==1 convs carry no temporal context.
    """

    features: int
    kernel_size: Tuple[int, int, int]  # (kt, kh, kw)
    stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, is_init: bool = True, temporal_chunk: bool = False):
        kt, kh, kw = self.kernel_size
        st, sh, sw = self.stride
        in_ch = x.shape[-1]

        kernel = self.param(
            "kernel",
            nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0),
            (kt, kh, kw, in_ch, self.features),
            self.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)

        from ...parallel.cp import current_cp_axis, halo_exchange

        cp_axis = current_cp_axis()
        if cp_axis is not None and kt > 1:
            # context-parallel: halo frames come from the previous device
            # instead of local zero padding (reference
            # context_parallel_forward, modeling_causal_conv.py:95-114)
            x = halo_exchange(x, kt - 1, cp_axis)
        elif temporal_chunk and kt > 1:
            cache = self.variable(
                "cache",
                "front_feat",
                lambda: jnp.zeros((x.shape[0], 2, x.shape[2], x.shape[3], in_ch), x.dtype),
            )
            if is_init:
                pad = jnp.zeros((x.shape[0], kt - 1) + x.shape[2:], x.dtype)
                full = jnp.concatenate([pad, x], axis=1)
            else:
                if st == 1 and kt == 3:
                    front = cache.value
                elif st == 2 and kt == 3:
                    front = cache.value[:, -1:]
                else:  # kt == 2
                    front = cache.value[:, -(kt - 1):]
                full = jnp.concatenate([front.astype(x.dtype), x], axis=1)
            if not self.is_initializing():
                cache.value = full[:, -2:]
            x = full
        else:
            # plain causal: front-pad kt-1 zero frames
            if kt > 1:
                pad = jnp.zeros((x.shape[0], kt - 1) + x.shape[2:], x.dtype)
                x = jnp.concatenate([pad, x], axis=1)

        # Temporal-tap decomposition: a kt=3 stride-1 conv as 3 per-tap 2D
        # convs summed. Measured on v5e at the 768p decode shapes
        # (tools/exp_conv_stack.py): 102 vs 73 TF/s at the 128-ch full-res
        # block and 90 vs 76 TF/s at the 256-ch level — XLA's 3D conv
        # reloads MXU weights per (kt,kh,kw) tap; the 2D form halves the
        # tap count per weight load. At 512 ch conv3d wins (64 vs 61), so
        # gate on channel width. Measured shapes are the DECODE tiles; the
        # gate also catches encoder/training call sites at <=256 ch, where
        # the same fewer-weight-reloads argument applies but throughput was
        # not separately measured. (A third variant — the 3 taps stacked
        # along channels as ONE 2D conv — measured worse everywhere except
        # a noise-level 1.03x on the tiny 48px level; rejected.)
        import os as _os

        b = x.shape[0]
        t_out = x.shape[1] - (kt - 1)
        if (kt == 3 and st == sh == sw == 1 and in_ch <= 256
                and self.features <= 256 and t_out >= 1
                and not _os.environ.get("PF_NO_TAP_DECOMP")):
            xp = jnp.pad(x.astype(self.dtype),
                         ((0, 0), (0, 0), (kh // 2, kh // 2),
                          (kw // 2, kw // 2), (0, 0)))
            k2 = kernel.astype(self.dtype)
            out = None
            for tap in range(3):
                xt = xp[:, tap: tap + t_out].reshape(
                    (b * t_out,) + xp.shape[2:])
                o = jax.lax.conv_general_dilated(
                    xt, k2[tap], (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                out = o if out is None else out + o
            out = out.reshape((b, t_out) + out.shape[1:])
            return out + bias.astype(self.dtype)

        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(st, sh, sw),
            padding=[(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return out + bias.astype(self.dtype)


def causal_group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Per-frame GroupNorm over [B, T, H, W, C] in fp32.

    Statistics are computed independently per (batch, frame) over
    (H, W, C/G) — matching the reference's ``(b t) c h w`` reshape, which is
    what makes chunked streaming bit-exact with monolithic execution.
    """
    b, t, h, w, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(b, t, h, w, g, c // g)
    mean = xf.mean(axis=(2, 3, 5), keepdims=True)
    var = xf.var(axis=(2, 3, 5), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, t, h, w, c)
    out = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


class GroupNorm(nn.Module):
    """Parameterized per-frame group norm."""

    num_groups: int = 32
    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return causal_group_norm(x, scale, bias, self.num_groups, self.eps)


# Above this many tokens (= H*W pixels per frame), SpatialAttention chunks
# its queries instead of materializing the full [hw, hw] fp32 score matrix.
# Module-level so tests can lower it and prove chunked == direct.
ATTN_CHUNK_TOKENS = 4096


class SpatialAttention(nn.Module):
    """Per-frame single-head spatial self-attention with residual.

    Mirrors the mid-block attention (reference `modeling_block.py:411-427`,
    heads = C // head_dim = 1 at default config). Runs per frame: tokens are
    the H*W pixels. Softmax in fp32 (reference upcast_softmax=True).
    """

    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        residual = x
        y = GroupNorm(num_groups=self.num_groups, param_dtype=self.param_dtype,
                      name="group_norm")(x)
        y = y.reshape(b * t, h * w, c)

        dense = lambda name: nn.Dense(
            c, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        q = dense("to_q")(y)
        k = dense("to_k")(y)
        v = dense("to_v")(y)

        scale = c ** -0.5
        hw = h * w
        if hw > ATTN_CHUNK_TOKENS:
            # big frames (untiled/strip 768p decode: hw up to 15360) would
            # materialize an [hw, hw] fp32 score matrix (~1 GB); chunk the
            # queries so peak is [chunk, hw] instead. lax.map keeps the
            # chunks sequential so XLA reuses the score buffer.
            ck = next(d for d in range(min(2048, hw), 0, -1) if hw % d == 0)
            qc = q.reshape(b * t, hw // ck, ck, c).transpose(1, 0, 2, 3)

            def one_chunk(qi):
                a = jnp.einsum("bqc,bkc->bqk", qi, k,
                               preferred_element_type=jnp.float32)
                a = jax.nn.softmax(a * scale, axis=-1).astype(y.dtype)
                return jnp.einsum("bqk,bkc->bqc", a, v)

            y = jax.lax.map(one_chunk, qc).transpose(1, 0, 2, 3).reshape(
                b * t, hw, c)
        else:
            attn = jnp.einsum("bqc,bkc->bqk", q, k,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn * scale, axis=-1).astype(y.dtype)
            y = jnp.einsum("bqk,bkc->bqc", attn, v)
        y = dense("to_out")(y)
        y = y.reshape(b, t, h, w, c)
        return residual + y
