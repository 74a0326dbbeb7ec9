"""Pallas TPU flash attention with temporal-causal time-id masking.

This is the load-bearing kernel of the framework (SURVEY.md §7.3 #2). It
replaces BOTH attention paths of the reference DiT
(`pyramid_dit/flux_modules/modeling_flux_block.py`):

* the CUDA ``flash_attn_varlen_func`` packing path (full bidirectional
  attention over valid tokens), and
* the SDPA + explicit O(L^2) mask path implementing temporal causality
  ``t_q >= t_k`` (`modeling_pyramid_flux.py:341-350`).

Mask semantics, derived from the reference:
  Every token carries an int32 ``time`` id. Text tokens have t=0 (so text
  attends to text and frame-0 latents, and every latent attends to text —
  exactly the reference's behaviour where text RoPE ids are zeros). Invalid
  (padded) tokens carry ``t = INVALID_TIME``; they are masked as keys for every
  valid query in both modes. Queries with no valid keys output zeros.

  causal=True :  mask[q,k] = (time_k <= time_q) & (time_k != INVALID)
  causal=False:  mask[q,k] = (time_k != INVALID)

Implementation: classic 2-pass flash attention (forward online softmax;
backward dKV + dQ kernels recomputing probabilities from the saved
log-sum-exp), fp32 statistics, bf16-friendly matmuls on the MXU. On CPU
backends the kernels run in interpreter mode so the same code path is
unit-testable without a TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "attention_reference", "INVALID_TIME"]

INVALID_TIME = 2**30  # plain int so kernels don't capture a traced constant
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
# Initial running max: masked scores (DEFAULT_MASK_VALUE) sit far below it, so
# exp(masked - m) underflows to exactly 0 without an explicit select — one
# fewer [bq, bk] VPU op per tile in the (VPU-bound) softmax chain.
INIT_M_VALUE = -0.35 * float(jnp.finfo(jnp.float32).max)
NUM_LANES = 128
LOG2E = 1.4426950408889634  # forward softmax runs in the log2 domain (exp2)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _mask_tile(tq, tk, causal: bool):
    """tq: [bq, 1] int32, tk: [1, bk] int32 -> bool [bq, bk].

    causal needs ONLY ``tk <= tq``: INVALID_TIME (2^30) sorts above every
    real time id, so invalid keys are masked for every valid query for free
    (padded-QUERY rows attend to everything, but their outputs are sliced
    off by the wrapper and their upstream gradients are zero). One compare
    instead of two compares + and — the softmax chain is VPU-bound.
    """
    if causal:
        return tk <= tq
    return tk != INVALID_TIME


# ============================================================== forward
def _fwd_kernel(tq_ref, tk_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, causal, sm_scale, num_k_blocks):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, INIT_M_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    tq = tq_ref[0, 0].reshape(-1, 1)
    tk = tk_ref[0, 0].reshape(1, -1)
    # block-level skip: if no key in this tile is visible to any query in the
    # q tile (all later-in-time or invalid), skip the matmuls entirely —
    # time ids are non-decreasing along the sequence, so for AR layouts this
    # prunes the strictly-upper-triangular tiles
    if causal:
        should_run = jnp.min(tk) <= jnp.max(tq)
    else:
        should_run = jnp.min(tk) != INVALID_TIME

    @pl.when(should_run)
    def _compute():
        # fold the softmax scale AND log2(e) into q ([bq, d] — one small
        # pass instead of a full-tile one): scores live in the log2 domain so
        # the online softmax uses exp2, TPU's native transcendental (exp
        # lowers to exp2 + a multiply per element).
        q = q_ref[0, 0] * jnp.asarray(sm_scale * LOG2E, q_ref.dtype)  # [bq, d]
        k = k_ref[0, 0]  # [bk, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

        # (measured: a lax.cond fast path that skips mask construction on
        # fully-visible tiles is a net LOSS on TPU — the branch defeats
        # Mosaic's software pipelining; the unconditional select is cheaper)
        mask = _mask_tile(tq, tk, causal)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]  # [bq, 128]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
        m_next = jnp.maximum(m_prev, m_curr)  # broadcast -> [bq, 128]
        alpha = jnp.exp2(m_prev - m_next)
        # masked entries carry s = DEFAULT_MASK_VALUE << m_next (which never
        # drops below INIT_M_VALUE), so exp2 underflows to exactly 0 — no
        # explicit zeroing needed; fully-masked rows keep l = 0 and the
        # finalize step maps their output to 0.
        p = jnp.exp2(s - m_next[:, :1])
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        m_scr[...] = m_next
        l_scr[...] = l_next

        v = v_ref[0, 0]  # [bk, d]
        pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(kv_idx == num_k_blocks - 1)
    def _finalize():
        l = l_scr[...][:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        m = m_scr[...]
        # convert the log2-domain running max back to the natural-log LSE the
        # backward expects. Fully-masked rows get a huge LSE so the
        # backward's exp(s - lse) underflows to zero instead of inf * 0.
        lse = jnp.where(
            l == 0.0, jnp.float32(3e38),
            m[:, :1] * jnp.float32(1.0 / LOG2E) + jnp.log(l))
        lse_ref[0, 0, 0] = lse[:, 0].astype(jnp.float32)


def _fwd(q, k, v, time_q, time_kv, causal, sm_scale, block_q, block_k):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    nq, nk = lq // block_q, lk // block_k

    grid = (b, h, nq, nk)
    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, causal=causal, sm_scale=sm_scale, num_k_blocks=nk
        ),
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, lq), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda b, h, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, j)),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j: (b, h, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(time_q[:, None], time_kv[:, None], q, k, v)
    return o, lse[:, :, 0]


# ============================================================= backward
def _bwd_dkv_kernel(tq_ref, tk_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                    delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                    *, causal, sm_scale, num_q_blocks):
    q_idx = pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    tq = tq_ref[0, 0].reshape(-1, 1)
    tk = tk_ref[0, 0].reshape(1, -1)
    if causal:
        should_run = jnp.min(tk) <= jnp.max(tq)
    else:
        should_run = jnp.min(tk) != INVALID_TIME

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]        # [bq, d]
        k = k_ref[0, 0]        # [bk, d]
        v = v_ref[0, 0]        # [bk, d]
        do = do_ref[0, 0]      # [bq, d]
        lse = lse_ref[0, 0]    # [bq, 128] (replicated lanes)
        delta = delta_ref[0, 0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        mask = _mask_tile(tq, tk, causal)
        # p = exp(s - lse); fully-masked rows get a huge lse -> p = 0
        p = jnp.where(mask, jnp.exp(s - lse[:, :1]), 0.0)

        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[:, :1]) * sm_scale
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(q_idx == num_q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(tq_ref, tk_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                   delta_ref, dq_ref, dq_scr, *, causal, sm_scale, num_k_blocks):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    tq = tq_ref[0, 0].reshape(-1, 1)
    tk = tk_ref[0, 0].reshape(1, -1)
    if causal:
        should_run = jnp.min(tk) <= jnp.max(tq)
    else:
        should_run = jnp.min(tk) != INVALID_TIME

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        mask = _mask_tile(tq, tk, causal)
        p = jnp.where(mask, jnp.exp(s - lse[:, :1]), 0.0)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[:, :1]) * sm_scale
        dq_scr[...] += jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(kv_idx == num_k_blocks - 1)
    def _store():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd(q, k, v, time_q, time_kv, o, lse, do, causal, sm_scale, block_q, block_k):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    nq, nk = lq // block_q, lk // block_k

    delta = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    lse_r = jnp.broadcast_to(lse[..., None], (b, h, lq, NUM_LANES))
    delta_r = jnp.broadcast_to(delta[..., None], (b, h, lq, NUM_LANES))

    common_in_specs = [
        pl.BlockSpec((1, 1, block_q), lambda b, h, i, j: (b, 0, j)),   # tq (loop q)
        pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, i)),   # tk (fixed k)
        pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_q, NUM_LANES), lambda b, h, i, j: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_q, NUM_LANES), lambda b, h, i, j: (b, h, j, 0)),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, causal=causal, sm_scale=sm_scale, num_q_blocks=nq
        ),
        grid=(b, h, nk, nq),
        in_specs=common_in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(time_q[:, None], time_kv[:, None], q, k, v, do, lse_r, delta_r)

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, causal=causal, sm_scale=sm_scale, num_k_blocks=nk
        ),
        grid=(b, h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda b, h, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, j)),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, NUM_LANES), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, NUM_LANES), lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(time_q[:, None], time_kv[:, None], q, k, v, do, lse_r, delta_r)
    return dq, dk, dv


# ============================================================== public API
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash(q, k, v, time_q, time_kv, causal, sm_scale, block_q, block_k):
    o, _ = _fwd(q, k, v, time_q, time_kv, causal, sm_scale, block_q, block_k)
    return o


def _flash_fwd(q, k, v, time_q, time_kv, causal, sm_scale, block_q, block_k):
    o, lse = _fwd(q, k, v, time_q, time_kv, causal, sm_scale, block_q, block_k)
    return o, (q, k, v, time_q, time_kv, o, lse)


def _flash_bwd(causal, sm_scale, block_q, block_k, res, do):
    q, k, v, time_q, time_kv, o, lse = res
    dq, dk, dv = _bwd(
        q, k, v, time_q, time_kv, o, lse, do, causal, sm_scale, block_q, block_k
    )
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def _pad_to(x, axis, mult, value=0):
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, constant_values=value)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    time_q: jnp.ndarray,
    time_kv: Optional[jnp.ndarray] = None,
    *,
    causal: bool = True,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> jnp.ndarray:
    """Flash attention with temporal-causal time-id masking.

    Args:
      q, k, v: ``[B, H, L, D]``.
      time_q: ``[B, Lq]`` int32 token times; ``INVALID_TIME`` marks padding.
      time_kv: ``[B, Lk]``; defaults to ``time_q`` (self-attention).
      causal: temporal-causal (``t_k <= t_q``) vs bidirectional-over-valid.

    Returns ``[B, H, Lq, D]``; padded-query rows are unspecified (mask them
    downstream), padded keys never contribute.
    """
    if time_kv is None:
        time_kv = time_q
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5

    lq, lk = q.shape[2], k.shape[2]

    def round_up(x, m):
        return -(-x // m) * m

    def auto_block_k(l):
        # big k-tiles win: per-grid-cell overhead dominates small tiles.
        # Scan-based sweep on v5e (b=2, h=24, d=64): at L=3584
        # (bq, bk) = (512, 1024) -> 3.25 ms vs (512, 512) 4.34 ms and
        # (1024, 1024) 3.65 ms; at L=1536, (512, 1024) 1.26 ms is also best.
        return min(1024, round_up(max(l, 128), 128))

    def auto_block_q(l):
        lp = round_up(max(l, 128), 128)
        return min(512, lp)

    import os
    env_blk = os.environ.get("PF_FLASH_BLOCK")
    if env_blk:
        block_q = block_k = int(env_blk)
    bq = block_q if block_q is not None else auto_block_q(lq)
    bk = block_k if block_k is not None else auto_block_k(lk)

    qp = _pad_to(q, 2, bq)
    kp = _pad_to(k, 2, bk)
    vp = _pad_to(v, 2, bk)
    tqp = _pad_to(time_q.astype(jnp.int32), 1, bq, value=int(INVALID_TIME))
    tkp = _pad_to(time_kv.astype(jnp.int32), 1, bk, value=int(INVALID_TIME))

    o = _flash(qp, kp, vp, tqp, tkp, causal, float(sm_scale), bq, bk)
    return o[:, :, :lq]


def attention_reference(
    q, k, v, time_q, time_kv=None, *, causal=True, sm_scale=None
) -> jnp.ndarray:
    """Naive XLA attention with identical mask semantics (test oracle)."""
    if time_kv is None:
        time_kv = time_q
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * sm_scale
    valid_k = (time_kv != INVALID_TIME)[:, None, None, :]
    if causal:
        mask = valid_k & (
            time_kv[:, None, None, :] <= time_q[:, None, :, None]
        )
    else:
        mask = jnp.broadcast_to(valid_k, s.shape)
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.any(mask, axis=-1, keepdims=True), p, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
