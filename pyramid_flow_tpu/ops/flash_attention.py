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
log-sum-exp), fp32 statistics, bf16-friendly matmuls on the MXU.

Two measured v5e optimizations (the softmax chain is VPU-bound at d=64, so
removing per-element VPU ops is what moves the needle — ablations at
L=12.3k / the 768p final-unit layout):

* **Per-tile type dispatch via scalar prefetch.** The wrapper reduces the
  time ids to a per-(q-tile, k-tile) type array (0=skip, 1=fully visible,
  2=needs element mask) that the kernel branches on with ``pl.when``. Fully
  visible tiles skip the [bq, bk] compare+select entirely (-13% at the
  bench layout, where the 3840-token current clip sees everything), and the
  in-kernel min/max reduction the old skip test needed disappears.
* **Fused softmax denominator.** v is padded to a multiple of 128 lanes with
  a ones column in the LAST lane (index ``vw-1``, 127 for d<128): the pv
  matmul then computes ``l = sum(p)`` in MXU lanes that a d=64 output would
  waste, replacing a [bq, bk] VPU reduce (-11%). For d >= 128 the pad width
  grows to the next 128 multiple (e.g. d=128 -> 256 lanes) — same layout,
  more MXU passes.

On CPU backends the kernels run in interpreter mode so the same code path is
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

# tile types (wrapper-computed, scalar-prefetched)
TILE_SKIP = 0     # no key in the tile is visible to any query in the tile
TILE_FULL = 1     # every key is visible to every (valid) query — no mask
TILE_MASKED = 2   # boundary tile — needs the element-wise compare+select


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _tile_types(time_q, time_kv, bq, bk, causal: bool):
    """[B, Lq], [B, Lk] int32 -> [B, nq, nk] int32 tile-type array.

    Pure data (tiny): computed inside the surrounding jit from the padded
    time ids, prefetched into SMEM by the kernel. Correctness notes:
    * the skip test uses the q tile's max over VALID rows only (INVALID ->
      -1): a pure-pad q tile skips every k tile (its rows are garbage the
      wrapper's caller slices off; the forward writes o=0 / lse=3e38 for
      rows with no surviving key, and the backward's p underflows to 0), and
      a *mixed* valid+pad q tile still skips k tiles its valid rows cannot
      see — pad rows' INVALID (2^30) must not disable the causal skip;
    * any tile with a *mix* of valid and INVALID keys has kmax=INVALID >
      qmin, so it is never FULL — invalid keys only ever flow through the
      masked branch.
    """
    b, lq = time_q.shape
    lk = time_kv.shape[1]
    tq = time_q.reshape(b, lq // bq, bq)
    tk = time_kv.reshape(b, lk // bk, bk)
    qmin = tq.min(-1)
    qmax_valid = jnp.where(tq == INVALID_TIME, -1, tq).max(-1)
    kmin, kmax = tk.min(-1), tk.max(-1)
    if causal:
        skip = kmin[:, None, :] > qmax_valid[:, :, None]
        full = kmax[:, None, :] <= qmin[:, :, None]
    else:
        # non-causal tile types depend on k only — but the kernel indexes
        # [b, q_idx, kv_idx], so the array MUST be materialized at full
        # [b, nq, nk]: a [b, 1, nk] result made the scalar prefetch read out
        # of bounds for every q-tile >= 1 on real hardware (wrong outputs on
        # all but the first q-tile; interpreter mode silently absorbed it).
        # Caught by the on-chip bench selfcheck — VERDICT r1 #4's exact
        # feared failure mode.
        nq_t, nk_t = lq // bq, lk // bk
        # pure-pad q tiles (qmax_valid == -1) also skip everything
        skip = ((kmin[:, None, :] == INVALID_TIME)
                | (qmax_valid[:, :, None] < 0))
        full = jnp.broadcast_to(
            kmax[:, None, :] != INVALID_TIME, (b, nq_t, nk_t))
    return jnp.where(skip, TILE_SKIP,
                     jnp.where(full, TILE_FULL, TILE_MASKED)).astype(jnp.int32)


# ============================================================== forward
def _fwd_kernel(types_ref, tq_ref, tk_ref, q_ref, k_ref, v_ref, o_ref,
                lse_ref, m_scr, acc_scr, *, causal, sm_scale, num_k_blocks):
    b_idx = pl.program_id(0)
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)
    tt = types_ref[b_idx, q_idx, kv_idx]

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, INIT_M_VALUE)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _update(s):
        # online softmax in the log2 domain. acc has vw (= padded v width)
        # lanes: [:d] is the weighted value sum, the LAST lane (vw-1) is the
        # running denominator l (the ones column in v), lanes d..vw-2 are 0.
        m_prev = m_scr[...]  # [bq, 128]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])
        v = v_ref[0, 0]  # [bk, vw] (ones column in the last lane)
        pv = jax.lax.dot(p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        m_scr[...] = m_next
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    def _scores():
        # fold the softmax scale AND log2(e) into q ([bq, d] — one small
        # pass instead of a full-tile one): scores live in the log2 domain so
        # the online softmax uses exp2, TPU's native transcendental.
        q = q_ref[0, 0] * jnp.asarray(sm_scale * LOG2E, q_ref.dtype)
        k = k_ref[0, 0]
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(tt == TILE_FULL)
    def _full():
        _update(_scores())

    @pl.when(tt == TILE_MASKED)
    def _masked():
        tq = tq_ref[0, 0].reshape(-1, 1)
        tk = tk_ref[0, 0].reshape(1, -1)
        # causal needs ONLY ``tk <= tq``: INVALID_TIME (2^30) sorts above
        # every real time id, so invalid keys are masked for every valid
        # query for free. Masked entries carry DEFAULT_MASK_VALUE << m_next
        # (never below INIT_M_VALUE), so exp2 underflows to exactly 0.
        mask = (tk <= tq) if causal else (tk != INVALID_TIME)
        _update(jnp.where(mask, _scores(), DEFAULT_MASK_VALUE))

    @pl.when(kv_idx == num_k_blocks - 1)
    def _finalize():
        acc = acc_scr[...]
        l = acc[:, acc.shape[-1] - 1:]  # ones column lives in the LAST lane
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc[:, :o_ref.shape[-1]] * l_inv).astype(o_ref.dtype)
        m = m_scr[...]
        # convert the log2-domain running max back to the natural-log LSE the
        # backward expects. Fully-masked rows get a huge LSE so the
        # backward's exp(s - lse) underflows to zero instead of inf * 0.
        lse = jnp.where(
            l == 0.0, jnp.float32(3e38),
            m[:, :1] * jnp.float32(1.0 / LOG2E) + jnp.log(l))
        lse_ref[0, 0, 0] = lse[:, 0].astype(jnp.float32)


# -------------------------------------------- bounded-softmax forward
# Softmax is invariant to the shift constant as long as it upper-bounds the
# scores: numerator and denominator scale by the same 2^-shift, and bf16/fp32
# share the 8-bit exponent range, so using the Cauchy-Schwarz bound
# |q_row||k|_max instead of the running row max changes NOTHING numerically
# until the bound overshoots the true max by ~120 log2 units (impossible for
# qk-normalized heads; selfcheck + tests guard it). What it buys: the whole
# online-softmax VPU chain disappears — no [bq,bk] max-reduce, no m compare,
# no acc rescale — leaving ONE fused sub+exp2+cast pass per tile. Measured
# ceiling of the running-max kernel is 62 TF/s on v5e (VPU-bound at d=64).
#
# ``hs`` = heads per grid cell. With hs=2 the kernel body holds TWO
# independent matmul->exp2->matmul chains, so head B's q@kT (MXU) issues
# while head A's exp2 pass (VPU) drains — classic ILP cure for the VPU/MXU
# serialization, zero extra FLOPs. Measured on v5e at the 768p final-unit
# layout (L=11008, b=2, h=24, d=64): 1.124x over hs=1 at (bq,bk)=(1024,1024);
# hs=3/4/6 and bigger tiles are at-parity or VMEM-OOM (tools/exp_flash_h2.py).
def _fwd_kernel_bounded(types_ref, tq_ref, tk_ref, mb_ref, q_ref, k_ref,
                        v_ref, o_ref, lse_ref, acc_scr,
                        *, causal, sm_scale, num_k_blocks, hs=1):
    b_idx = pl.program_id(0)
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)
    tt = types_ref[b_idx, q_idx, kv_idx]

    @pl.when(kv_idx == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    c = jnp.asarray(sm_scale * LOG2E, q_ref.dtype)

    def _scores(h):
        return jax.lax.dot_general(
            q_ref[0, h] * c, k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def _update(mask):
        # all hs score matmuls first, then the exp2+pv chains: the
        # interleaving gives Mosaic's scheduler independent MXU work to
        # overlap each head's VPU exp2 pass with
        ss = []
        for h in range(hs):
            s = _scores(h)
            if mask is not None:
                s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
            ss.append(s)
        for h in range(hs):
            mb = mb_ref[0, h, 0].reshape(-1, 1)  # [bq, 1] log2 score bound
            p = jnp.exp2(ss[h] - mb)
            v = v_ref[0, h]  # [bk, vw] (ones column in the last lane)
            acc_scr[h] += jax.lax.dot(p.astype(v.dtype), v,
                                      preferred_element_type=jnp.float32)

    @pl.when(tt == TILE_FULL)
    def _full():
        _update(None)

    @pl.when(tt == TILE_MASKED)
    def _masked():
        tq = tq_ref[0, 0].reshape(-1, 1)
        tk = tk_ref[0, 0].reshape(1, -1)
        _update((tk <= tq) if causal else (tk != INVALID_TIME))

    @pl.when(kv_idx == num_k_blocks - 1)
    def _finalize():
        for h in range(hs):
            acc = acc_scr[h]
            l = acc[:, acc.shape[-1] - 1:]
            l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
            o_ref[0, h] = (acc[:, :o_ref.shape[-1]] * l_inv).astype(
                o_ref.dtype)
            mb = mb_ref[0, h, 0].reshape(-1, 1)
            lse = jnp.where(
                l == 0.0, jnp.float32(3e38),
                mb * jnp.float32(1.0 / LOG2E) + jnp.log(l))
            lse_ref[0, h, 0] = lse[:, 0].astype(jnp.float32)


def _ones_column_pad(v):
    """Pad v's lanes to the next 128 multiple that also fits a trailing ones
    column: the pv matmul then computes the softmax denominator ``l`` in the
    LAST lane (otherwise-wasted MXU lanes for d<128)."""
    b, h, lk, d = v.shape
    vw = -(-(d + 1) // NUM_LANES) * NUM_LANES
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, vw - 1 - d)))
    return jnp.concatenate([vp, jnp.ones((b, h, lk, 1), v.dtype)], axis=-1)


def _run_fwd(kernel, q, k, v, time_q, time_kv, causal, sm_scale,
             block_q, block_k, extra_rows=(), has_m_scratch=True, hs=1):
    """Shared pallas_call plumbing for BOTH forward kernels.

    The only variant differences: ``extra_rows`` — extra [B, H, 1, Lq]
    per-q-row inputs (the bounded kernel's score-bound array), placed right
    after the time ids — ``has_m_scratch`` (the classic kernel carries a
    running-max scratch; bounded does not), and ``hs`` heads per grid cell
    (the bounded kernel's ILP lever; the classic kernel requires hs=1).
    Everything else (grid, tile types, ones-column v pad, out shapes,
    scratch sizing) is identical, so it lives here exactly once.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    nq, nk = lq // block_q, lk // block_k
    assert h % hs == 0, (h, hs)
    assert hs == 1 or not has_m_scratch, "classic kernel is single-head"

    types = _tile_types(time_q, time_kv, block_q, block_k, causal)
    vp = _ones_column_pad(v)
    vw = vp.shape[-1]

    # [B, H, 1, Lq] rows: the singleton 3rd dim satisfies Mosaic's
    # block-shape rule (last two block dims must divide (8, 128) or equal
    # the array's)
    row_spec = pl.BlockSpec((1, hs, 1, block_q),
                            lambda b, h, i, j, types: (b, h, 0, i))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h // hs, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda b, h, i, j, types: (b, 0, i)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j, types: (b, 0, j)),
            *[row_spec] * len(extra_rows),
            pl.BlockSpec((1, hs, block_q, d), lambda b, h, i, j, types: (b, h, i, 0)),
            pl.BlockSpec((1, hs, block_k, d), lambda b, h, i, j, types: (b, h, j, 0)),
            pl.BlockSpec((1, hs, block_k, vw),
                         lambda b, h, i, j, types: (b, h, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, hs, block_q, d), lambda b, h, i, j, types: (b, h, i, 0)),
            row_spec,
        ],
        scratch_shapes=(
            # classic kernel: [running-max m, acc]; bounded: [per-head acc]
            ([pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
              pltpu.VMEM((block_q, vw), jnp.float32)]
             if has_m_scratch else
             [pltpu.VMEM((hs, block_q, vw), jnp.float32)])
        ),
    )
    o, lse = pl.pallas_call(
        functools.partial(kernel, causal=causal, sm_scale=sm_scale,
                          num_k_blocks=nk),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, lq), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(types, time_q[:, None], time_kv[:, None], *extra_rows, q, k, vp)
    return o, lse[:, :, 0]


def _bounded_hs(num_heads: int) -> int:
    """Heads per grid cell for the bounded forward: 2 when the head count
    allows (the measured ILP win — see _fwd_kernel_bounded), else 1.
    PF_FLASH_HS overrides for A/B."""
    import os
    env = os.environ.get("PF_FLASH_HS")
    if env:
        hs = int(env)
        return hs if num_heads % hs == 0 else 1
    return 2 if num_heads % 2 == 0 else 1


def _fwd_bounded(q, k, v, time_q, time_kv, causal, sm_scale, block_q, block_k):
    # per-row log2-domain score bound: |q_row| * max|k| * scale * log2(e)
    # (+1 margin for fp error in the norms/matmul). Pad keys are zeros, so
    # they never raise the bound; pad-q rows get bound=1, their garbage
    # outputs are sliced off by the caller (same contract as the main path).
    qn = jnp.sqrt(jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1))
    kn = jnp.sqrt(jnp.sum(jnp.square(k.astype(jnp.float32)), axis=-1))
    kmax = jnp.max(kn, axis=-1, keepdims=True)
    mb = (qn * kmax * jnp.float32(sm_scale * LOG2E) + 1.0)[:, :, None, :]
    hs = _bounded_hs(q.shape[1])
    return _run_fwd(functools.partial(_fwd_kernel_bounded, hs=hs),
                    q, k, v, time_q, time_kv, causal,
                    sm_scale, block_q, block_k, extra_rows=(mb,),
                    has_m_scratch=False, hs=hs)


def bounded_softmax_overshoot(q, k, time_q, time_kv=None, *, causal=True,
                              sm_scale=None, chunk=256):
    """Debug probe: max over valid rows of ``bound - true_max_score`` in
    log2 units. Exactness of the bounded kernel needs overshoot << ~120
    (bf16/fp32 exponent range); qk-normed heads sit in the low tens. If
    fine-tuning pushes qk-norm gains far enough that this grows toward
    ~100, set ``PF_BOUNDED_SOFTMAX=0`` for that run (see
    :func:`_resolve_bounded`). Logged periodically by the training
    telemetry hook (``training.telemetry.bound_overshoot_probe``); not part
    of the hot path. Computed in q-row chunks of ``chunk`` so the score
    matrix never materializes — usable at real (10k+) sequence lengths."""
    if time_kv is None:
        time_kv = time_q
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    b, h, lq, d = q.shape
    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    qn = jnp.sqrt(jnp.sum(jnp.square(q32), axis=-1))
    kn = jnp.sqrt(jnp.sum(jnp.square(k32), axis=-1))
    mb = qn * jnp.max(kn, axis=-1, keepdims=True) * (sm_scale * LOG2E) + 1.0
    # pad q rows to a chunk multiple; pad rows carry INVALID time ids so the
    # final valid-row max ignores them
    pad = (-lq) % chunk
    qp = jnp.pad(q32, ((0, 0), (0, 0), (0, pad), (0, 0)))
    tqp = jnp.pad(time_q, ((0, 0), (0, pad)), constant_values=INVALID_TIME)
    mbp = jnp.pad(mb, ((0, 0), (0, 0), (0, pad)))
    n = (lq + pad) // chunk
    qc = jnp.moveaxis(qp.reshape(b, h, n, chunk, d), 2, 0)
    tc = jnp.moveaxis(tqp.reshape(b, n, chunk), 1, 0)
    mbc = jnp.moveaxis(mbp.reshape(b, h, n, chunk), 2, 0)
    vis_k = (time_kv != INVALID_TIME)[:, None, None, :]

    def per_chunk(args):
        qi, ti, mi = args
        s = jnp.einsum("bhqd,bhkd->bhqk", qi, k32) * (sm_scale * LOG2E)
        vis = vis_k
        if causal:
            vis = vis & (time_kv[:, None, None, :] <= ti[:, None, :, None])
        smax = jnp.max(jnp.where(vis, s, -jnp.inf), axis=-1)
        valid_q = (ti != INVALID_TIME)[:, None, :]
        return jnp.max(jnp.where(valid_q, mi - smax, -jnp.inf))

    return jnp.max(jax.lax.map(per_chunk, (qc, tc, mbc)))


def _resolve_bounded(bounded):
    """The bounded-softmax forward is only safe inside the qk-norm
    envelope (see _fwd_bounded): callers that normalize q/k (both DiT
    variants) request it with bounded=True; the public default (None) is
    the classic online-softmax kernel, so silent underflow cannot hit
    arbitrary users. PF_BOUNDED_SOFTMAX=1/0 force-overrides for A/B.
    Training note: ``bounded_softmax_overshoot`` measures the live bound
    slack; recommend PF_BOUNDED_SOFTMAX=0 when aggressively fine-tuning
    qk-norm gains (slack drifting toward ~100 log2 units)."""
    import os
    env = os.environ.get("PF_BOUNDED_SOFTMAX")
    if env == "1":
        return True
    if env == "0":
        return False
    return bool(bounded)


def _fwd(q, k, v, time_q, time_kv, causal, sm_scale, block_q, block_k,
         bounded=False):
    if bounded:
        return _fwd_bounded(q, k, v, time_q, time_kv, causal, sm_scale,
                            block_q, block_k)
    return _run_fwd(_fwd_kernel, q, k, v, time_q, time_kv, causal, sm_scale,
                    block_q, block_k)


# ============================================================= backward
def _bwd_dkv_kernel(types_ref, tq_ref, tk_ref, q_ref, k_ref, v_ref, do_ref,
                    lse_ref, delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                    *, causal, sm_scale, num_q_blocks):
    b_idx = pl.program_id(0)
    k_idx = pl.program_id(2)
    q_idx = pl.program_id(3)
    tt = types_ref[b_idx, q_idx, k_idx]

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    def _compute(masked: bool):
        q = q_ref[0, 0]        # [bq, d]
        k = k_ref[0, 0]        # [bk, d]
        v = v_ref[0, 0]        # [bk, d]
        do = do_ref[0, 0]      # [bq, d]
        # per-q-row stats arrive as lane rows (same layout as the time ids);
        # relayout to columns for broadcasting against [bq, bk]
        lse = lse_ref[0, 0, 0].reshape(-1, 1)    # [bq, 1]
        delta = delta_ref[0, 0, 0].reshape(-1, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        # p = exp(s - lse). Pad-query rows can have NONZERO p here (under
        # causal a tq=INVALID row sees every key, so its lse is finite);
        # correctness relies on pad rows carrying ZERO upstream gradient —
        # do and delta are 0 there because the caller's loss never reads pad
        # outputs (wrapper-padded rows are sliced off; in-budget INVALID rows
        # are masked out of the loss) — so their p contributes p * 0 to every
        # grad. Rows the forward zeroed via lse=3e38 additionally get p = 0.
        p = jnp.exp(s - lse)
        if masked:
            tq = tq_ref[0, 0].reshape(-1, 1)
            tk = tk_ref[0, 0].reshape(1, -1)
            mask = (tk <= tq) if causal else (tk != INVALID_TIME)
            p = jnp.where(mask, p, 0.0)

        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * sm_scale
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(tt == TILE_FULL)
    def _full():
        _compute(False)

    @pl.when(tt == TILE_MASKED)
    def _masked():
        _compute(True)

    @pl.when(q_idx == num_q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(types_ref, tq_ref, tk_ref, q_ref, k_ref, v_ref, do_ref,
                   lse_ref, delta_ref, dq_ref, dq_scr,
                   *, causal, sm_scale, num_k_blocks):
    b_idx = pl.program_id(0)
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)
    tt = types_ref[b_idx, q_idx, kv_idx]

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    def _compute(masked: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, 0].reshape(-1, 1)    # [bq, 1] (see dkv kernel)
        delta = delta_ref[0, 0, 0].reshape(-1, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        p = jnp.exp(s - lse)
        if masked:
            tq = tq_ref[0, 0].reshape(-1, 1)
            tk = tk_ref[0, 0].reshape(1, -1)
            mask = (tk <= tq) if causal else (tk != INVALID_TIME)
            p = jnp.where(mask, p, 0.0)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * sm_scale
        dq_scr[...] += jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(tt == TILE_FULL)
    def _full():
        _compute(False)

    @pl.when(tt == TILE_MASKED)
    def _masked():
        _compute(True)

    @pl.when(kv_idx == num_k_blocks - 1)
    def _store():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd(q, k, v, time_q, time_kv, o, lse, do, causal, sm_scale, block_q, block_k):
    lq0, lk0 = q.shape[2], k.shape[2]
    # the backward keeps more live tensors per tile (q, k, v, do, lse, delta,
    # two accumulators): clamp to its known-good VMEM regime independently of
    # the forward's (taller) tiles. The forward only padded to ITS block
    # multiples (e.g. 1536), so re-pad to this pass's: extra rows are inert —
    # zero q gives s=0 and zero do/delta kill every gradient term, INVALID
    # times make the tile classifier skip/mask them.
    block_q = min(block_q, 1024)
    block_k = min(block_k, 1024)
    q = _pad_to(q, 2, block_q)
    o = _pad_to(o, 2, block_q)
    do = _pad_to(do, 2, block_q)
    lse = _pad_to(lse, 2, block_q)
    time_q = _pad_to(time_q, 1, block_q, value=int(INVALID_TIME))
    k = _pad_to(k, 2, block_k)
    v = _pad_to(v, 2, block_k)
    time_kv = _pad_to(time_kv, 1, block_k, value=int(INVALID_TIME))
    b, h, lq, d = q.shape
    lk = k.shape[2]
    nq, nk = lq // block_q, lk // block_k

    types = _tile_types(time_q, time_kv, block_q, block_k, causal)
    # per-q-row stats stay lane rows (the kernels relayout per tile) —
    # broadcasting to NUM_LANES here would materialize and stream
    # B*H*L*128*4 bytes per array from HBM for data the kernel reads once.
    # Carried as [B, H, 1, L] (same trick as the forward's lse output and
    # the time-id rows): Mosaic requires the second-to-last BLOCK dim to be
    # 8-divisible or equal to the array dim, so blocking [B, H, L] with
    # (1, 1, block_q) is illegal whenever H not in {1, block}, while
    # (1, 1, 1, block_q) over the explicit singleton axis always lowers.
    delta = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    lse_r = lse.astype(jnp.float32)[:, :, None]
    delta_r = delta[:, :, None]

    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, nk, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda b, h, i, j, t: (b, 0, j)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j, t: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j, t: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j, t: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j, t: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j, t: (b, h, j, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j, t: (b, h, 0, j)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j, t: (b, h, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j, t: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j, t: (b, h, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, causal=causal, sm_scale=sm_scale, num_q_blocks=nq
        ),
        grid_spec=dkv_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(types, time_q[:, None], time_kv[:, None], q, k, v, do, lse_r, delta_r)

    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda b, h, i, j, t: (b, 0, i)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j, t: (b, 0, j)),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j, t: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j, t: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j, t: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j, t: (b, h, i, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j, t: (b, h, 0, i)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j, t: (b, h, 0, i)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda b, h, i, j, t: (b, h, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
    )
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, causal=causal, sm_scale=sm_scale, num_k_blocks=nk
        ),
        grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(types, time_q[:, None], time_kv[:, None], q, k, v, do, lse_r, delta_r)
    return dq[:, :, :lq0], dk[:, :, :lk0], dv[:, :, :lk0]


# ============================================================== public API
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash(q, k, v, time_q, time_kv, causal, sm_scale, block_q, block_k,
           bounded):
    o, _ = _fwd(q, k, v, time_q, time_kv, causal, sm_scale, block_q, block_k,
                bounded)
    return o


def _flash_fwd(q, k, v, time_q, time_kv, causal, sm_scale, block_q, block_k,
               bounded):
    o, lse = _fwd(q, k, v, time_q, time_kv, causal, sm_scale, block_q,
                  block_k, bounded)
    return o, (q, k, v, time_q, time_kv, o, lse)


def _flash_bwd(causal, sm_scale, block_q, block_k, bounded, res, do):
    # backward is identical for both forwards: it consumes the (same
    # mathematical) lse
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
    bounded: Optional[bool] = None,
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
    # any head_dim works: the ones-column denominator pads v to the next
    # 128-lane multiple that fits it (d=64 -> 128 lanes, d=128 -> 256)

    lq, lk = q.shape[2], k.shape[2]
    is_bounded = _resolve_bounded(bounded)
    hs = _bounded_hs(q.shape[1]) if is_bounded else 1

    def round_up(x, m):
        return -(-x // m) * m

    def auto_block_k(l):
        # Re-swept on v5e with the pad-aware tile types + bounded kernel
        # (b=2, h=24, d=64, real pyramid layouts, 2 seeds): tall tiles now
        # win — (2048, 1024) beats the old (1024, 2048) by ~2-3% at long L
        # (768p units, L>=10k) and (1024, 512) beats (512, 1024) by ~2% at
        # short L (384p, L~3.2k). Larger q-tiles amortize the per-row
        # prefetch; smart tile-typing makes the extra q padding free (pure
        # pad q-tiles skip). The hs=2 bounded kernel keeps the same bk
        # optima (swept in tools/exp_flash_h2.py).
        big = 1024 if l > 4096 else 512
        return min(big, round_up(max(l, 128), 128))

    def auto_block_q(l):
        lp = round_up(max(l, 128), 128)
        # hs=2 doubles the per-cell VMEM (two q/k/v/acc sets): bq=2048
        # exceeds scoped VMEM at d=64, and (1024, 1024) measured fastest
        # anyway (1.124x over the hs=1 kernel at the 768p layout)
        cap = 1024 if hs > 1 else (2048 if l > 4096 else 1024)
        return min(cap, lp)

    import os
    env_blk = os.environ.get("PF_FLASH_BLOCK")
    if env_blk:  # blunt bench knob: forces BOTH tile sizes, wins over args
        block_q = block_k = int(env_blk)
    else:
        # A/B overrides for the L-dependent defaults: "bq,bk" pairs. Only
        # fill sizes the caller left unset, and pick each side's regime by
        # its own length (they differ for cross-attention layouts).
        def env_pair(l, idx):
            s = os.environ.get(
                "PF_FLASH_BLOCKS_LONG" if l > 4096 else "PF_FLASH_BLOCKS_SHORT")
            return int(s.split(",")[idx]) if s else None

        if block_q is None:
            block_q = env_pair(lq, 0)
        if block_k is None:
            block_k = env_pair(lk, 1)
    bq = block_q if block_q is not None else auto_block_q(lq)
    bk = block_k if block_k is not None else auto_block_k(lk)

    qp = _pad_to(q, 2, bq)
    kp = _pad_to(k, 2, bk)
    vp = _pad_to(v, 2, bk)
    tqp = _pad_to(time_q.astype(jnp.int32), 1, bq, value=int(INVALID_TIME))
    tkp = _pad_to(time_kv.astype(jnp.int32), 1, bk, value=int(INVALID_TIME))

    o = _flash(qp, kp, vp, tqp, tkp, causal, float(sm_scale), bq, bk,
               is_bounded)
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
