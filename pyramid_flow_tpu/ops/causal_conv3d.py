"""Pallas TPU kernel for the causal 3x3x3 stride-1 conv (VAE hot path).

Status: EXPERIMENT, measured at parity with XLA — not wired into the VAE.

Hypothesis: XLA's NDHWC conv3d runs at ~53% of MXU peak (16.5-18.8 ms vs
8.8 ms roofline for a full-res 128->128 decoder conv at 8x384x640) because
im2col re-reads the input per tap; loading each halo tile into VMEM once
via manual DMA and accumulating 27 MXU dots should win.

Measured on v5e: 18.4 ms vs XLA's 18.8 ms at that shape — parity, not a
win. The W-tap slices (`x[.., kw:kw+wb, :]`, kw in {0,1,2}) are unaligned
on the sublane dimension, so Mosaic inserts a relayout copy per tap; 27
such copies cost about what the saved HBM traffic buys. (DMA *source*
offsets must be 8-aligned on the sublane dim, so the shifts cannot be moved
into the DMA without materializing 3 W-shifted input copies in HBM — ~1.5x
at best by traffic math.) Kept as a tested, documented starting point for a
future double-buffered / shifted-copies version.

Scope: kernel (3, 3, 3), stride (1, 1, 1), SAME spatial padding, causal
temporal padding (2 front frames) — the decoder/encoder resnet convs.
Reference equivalent: the cuDNN conv3d inside ``CausalConv3d``
(`video_vae/modeling_causal_conv.py:46-146`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_causal_conv3d", "supports_pallas_conv"]


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _kernel(xp_ref, w_ref, b_ref, o_ref, x_vmem, sems, *, hb, wb, t_total):
    # grid: (B*T, nH, nW, nCo); co innermost so the x tile is fetched once
    bt = pl.program_id(0)
    hi = pl.program_id(1)
    wi = pl.program_id(2)
    co = pl.program_id(3)
    b = bt // t_total
    t = bt % t_total

    @pl.when(co == 0)
    def _fetch():
        # one aligned halo tile: W offset wi*wb is sublane-aligned; the +8
        # window covers the kw in {0, 1, 2} taps
        dma = pltpu.make_async_copy(
            xp_ref.at[b, pl.ds(t, 3), pl.ds(hi * hb, hb + 2),
                      pl.ds(wi * wb, x_vmem.shape[2]), :],
            x_vmem,
            sems,
        )
        dma.start()
        dma.wait()

    c = x_vmem.shape[-1]
    cob = o_ref.shape[-1]
    acc = jnp.zeros((hb * wb, cob), jnp.float32)
    for kt in range(3):
        for kh in range(3):
            for kw in range(3):
                patch = x_vmem[kt, kh:kh + hb, kw:kw + wb, :].reshape(
                    hb * wb, c)
                acc += jax.lax.dot(
                    patch, w_ref[kt * 9 + kh * 3 + kw],
                    preferred_element_type=jnp.float32)
    acc += b_ref[0].astype(jnp.float32)
    o_ref[0, 0] = acc.reshape(hb, wb, cob).astype(o_ref.dtype)


def _pick_blocks(h, w, c, co):
    """(hb, wb, cob) under a ~12 MB VMEM budget for the x tiles + weights."""
    cob = min(co, 128 if c >= 512 else co)
    for hb, wb in ((16, 256), (16, 128), (8, 128), (4, 128)):
        if h % hb or w % wb:
            continue
        x_bytes = 3 * (hb + 2) * (wb + 8) * c * 2
        w_bytes = 27 * c * cob * 2
        if x_bytes + w_bytes <= 12 * 2 ** 20:
            return hb, wb, cob
    return None


def supports_pallas_conv(x_shape, kernel_shape, stride) -> bool:
    """stride-1 3x3x3 with tileable spatial dims and lane-aligned channels."""
    kt, kh, kw = kernel_shape[:3]
    c, co = kernel_shape[3], kernel_shape[4]
    if (kt, kh, kw) != (3, 3, 3) or tuple(stride) != (1, 1, 1):
        return False
    if c % 128 or co % 128:
        return False
    _, t, h, w, _ = x_shape
    return _pick_blocks(h, w, c, co) is not None


def pallas_causal_conv3d(x, kernel, bias):
    """x: [B, T, H, W, C] (unpadded), kernel: [3, 3, 3, C, Co], bias: [Co].

    Returns [B, T, H, W, Co]; temporal padding is causal (2 zero frames at
    the front), spatial SAME.
    """
    b, t, h, w, c = x.shape
    co = kernel.shape[-1]
    hb, wb, cob = _pick_blocks(h, w, c, co)

    # pad: T front 2 (causal), H/W +-1 (SAME), W tail to +8 so the aligned
    # (wb + 8)-wide DMA windows stay in bounds
    xp = jnp.pad(x, ((0, 0), (2, 0), (1, 1), (1, 7), (0, 0)))
    wr = kernel.reshape(27, c, co).astype(x.dtype)
    br = bias.reshape(1, co).astype(jnp.float32)

    grid = (b * t, h // hb, w // wb, co // cob)
    out = pl.pallas_call(
        functools.partial(_kernel, hb=hb, wb=wb, t_total=t),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # xp stays in HBM
            pl.BlockSpec((27, c, cob), lambda bt, i, j, co_: (0, 0, co_)),
            pl.BlockSpec((1, cob), lambda bt, i, j, co_: (0, co_)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, hb, wb, cob),
            lambda bt, i, j, co_, *, tt=t: (bt // tt, bt % tt, i, j, co_)),
        out_shape=jax.ShapeDtypeStruct((b, t, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, hb + 2, wb + 8, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary",
                                 "arbitrary"),
        ),
        interpret=_interpret(),
    )(xp, wr, br)
    return out
