"""EXPERIMENT: two heads per flash grid cell (docs/DESIGN.md known-gaps).

Hypothesis: the bounded-softmax forward is VPU-bound at d=64 (measured
62 TF/s ceiling, VPU exp2 chain serializing against the two MXU matmuls).
Processing TWO heads per grid cell gives Mosaic two independent
matmul->exp2->matmul chains in one kernel body, so head B's q@kT (MXU) can
issue while head A's exp2 pass (VPU) drains — classic ILP cure for a
VPU/MXU serialization, with zero extra FLOPs.

Usage:  python tools/exp_flash_h2.py            # correctness + timing
        python tools/exp_flash_h2.py --full     # all-FULL-tile ceiling too

Verdict lands in docs/DESIGN.md either way (shipped or measured-rejected).
"""

import argparse
import functools
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyramid_flow_tpu.ops.flash_attention import (  # noqa: E402
    DEFAULT_MASK_VALUE, INVALID_TIME, LOG2E, _interpret, _ones_column_pad,
    _pad_to, _tile_types, TILE_FULL, TILE_MASKED, attention_reference,
    flash_attention)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# --------------------------------------- multi-head-per-cell bounded forward
def _fwd_kernel_bounded_hn(types_ref, tq_ref, tk_ref, mb_ref, q_ref, k_ref,
                           v_ref, o_ref, lse_ref, acc_scr,
                           *, causal, sm_scale, num_k_blocks, hs):
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
        # hs independent chains, interleaved so the scheduler can overlap
        # head (i+1)'s MXU work with head i's VPU (exp2) work
        ss = []
        for h in range(hs):
            s = _scores(h)
            if mask is not None:
                s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
            ss.append(s)
        for h in range(hs):
            mb = mb_ref[0, h, 0].reshape(-1, 1)
            p = jnp.exp2(ss[h] - mb).astype(v_ref.dtype)
            acc_scr[h] += jax.lax.dot(p, v_ref[0, h],
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
        for hh in range(hs):
            acc = acc_scr[hh]
            l = acc[:, acc.shape[-1] - 1:]
            l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
            o_ref[0, hh] = (acc[:, :o_ref.shape[-1]] * l_inv).astype(
                o_ref.dtype)
            mb = mb_ref[0, hh, 0].reshape(-1, 1)
            lse = jnp.where(l == 0.0, jnp.float32(3e38),
                            mb * jnp.float32(1.0 / LOG2E) + jnp.log(l))
            lse_ref[0, hh, 0] = lse[:, 0].astype(jnp.float32)


def flash_h2(q, k, v, time_q, time_kv=None, *, causal=True, sm_scale=None,
             block_q=2048, block_k=1024, return_lse=False, hs=2):
    if time_kv is None:
        time_kv = time_q
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    lq0 = q.shape[2]
    q = _pad_to(q, 2, block_q)
    k = _pad_to(k, 2, block_k)
    v = _pad_to(v, 2, block_k)
    time_q = _pad_to(time_q.astype(jnp.int32), 1, block_q,
                     value=int(INVALID_TIME))
    time_kv = _pad_to(time_kv.astype(jnp.int32), 1, block_k,
                      value=int(INVALID_TIME))
    b, h, lq, d = q.shape
    lk = k.shape[2]
    assert h % hs == 0
    nq, nk = lq // block_q, lk // block_k

    types = _tile_types(time_q, time_kv, block_q, block_k, causal)
    vp = _ones_column_pad(v)
    vw = vp.shape[-1]

    qn = jnp.sqrt(jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1))
    kn = jnp.sqrt(jnp.sum(jnp.square(k.astype(jnp.float32)), axis=-1))
    kmax = jnp.max(kn, axis=-1, keepdims=True)
    mb = (qn * kmax * jnp.float32(sm_scale * LOG2E) + 1.0)[:, :, None, :]

    row_spec = pl.BlockSpec((1, hs, 1, block_q),
                            lambda b, h, i, j, types: (b, h, 0, i))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h // hs, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda b, h, i, j, t: (b, 0, i)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j, t: (b, 0, j)),
            row_spec,
            pl.BlockSpec((1, hs, block_q, d), lambda b, h, i, j, t: (b, h, i, 0)),
            pl.BlockSpec((1, hs, block_k, d), lambda b, h, i, j, t: (b, h, j, 0)),
            pl.BlockSpec((1, hs, block_k, vw),
                         lambda b, h, i, j, t: (b, h, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, hs, block_q, d), lambda b, h, i, j, t: (b, h, i, 0)),
            row_spec,
        ],
        scratch_shapes=[pltpu.VMEM((hs, block_q, vw), jnp.float32)],
    )
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_bounded_hn, causal=causal,
                          sm_scale=float(sm_scale), num_k_blocks=nk, hs=hs),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, lq), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=_interpret(),
    )(types, time_q[:, None], time_kv[:, None], mb, q, k, vp)
    if return_lse:
        return o[:, :, :lq0], lse[:, :, 0, :lq0]
    return o[:, :, :lq0]


def reference_lse(q, k, time_q, time_kv=None, *, causal=True, sm_scale=None):
    """Natural-log row logsumexp with the oracle's mask semantics; empty
    rows (no visible key) get the kernel's 3e38 sentinel (ADVICE r3)."""
    if time_kv is None:
        time_kv = time_q
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    valid_k = (time_kv != INVALID_TIME)[:, None, None, :]
    if causal:
        mask = valid_k & (
            time_kv[:, None, None, :] <= time_q[:, None, :, None])
    else:
        mask = jnp.broadcast_to(valid_k, s.shape)
    lse = jax.scipy.special.logsumexp(jnp.where(mask, s, -jnp.inf), axis=-1)
    return jnp.where(jnp.any(mask, axis=-1), lse, jnp.float32(3e38))


# -------------------------------------------------------------- harness
def _force(x):
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def time_chained(fn, q, *args, iters=8):
    """Time inside ONE program via fori_loop chaining (o feeds back as q) —
    per-dispatch timing through the device relay lies (DESIGN.md)."""
    @jax.jit
    def chained(q):
        return jax.lax.fori_loop(
            0, iters, lambda i, qq: fn(qq, *args).astype(qq.dtype), q)

    _force(chained(q))  # compile+warm
    t0 = time.time()
    _force(chained(q))
    return (time.time() - t0) / iters


def layout_768p_stage2():
    """Realistic final-unit 768p stage-2 layout: text(128,t=0) + cond
    budget + INVALID pad + current clip."""
    b, nh, d = 2, 24, 64
    h_lat, w_lat = 96, 160
    cur = (h_lat // 2) * (w_lat // 2)  # 3840 current-clip tokens at stage 2
    cond = 7000                        # AR history tokens (~15 units)
    budget = -(-(128 + cond) // 512) * 512
    pad = budget - 128 - cond
    L = budget + cur
    # history built to EXACTLY cond elements (ceil-repeat then trim) so no
    # intended current-clip token silently becomes padding (ADVICE r3)
    hist = np.repeat(np.arange(1, 16, dtype=np.int32), -(-cond // 15))[:cond]
    assert hist.shape[0] == cond, (hist.shape[0], cond)
    t = np.concatenate([
        np.zeros(128, np.int32),                     # text
        hist,
        np.full(pad, INVALID_TIME, np.int32),
        np.full(cur, 16, np.int32),
    ])
    assert t.shape[0] == L, (t.shape[0], L)
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (b, nh, L, d), jnp.bfloat16) * 0.3
    tq = jnp.asarray(t)[None].repeat(b, 0)
    return q, tq, L


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also measure the all-FULL-tile ceiling")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    # correctness first (small, with mixed tile types)
    b, nh, L, d = 2, 4, 640, 64
    rng = jax.random.PRNGKey(1)
    q = jax.random.normal(rng, (b, nh, L, d), jnp.bfloat16) * 0.3
    k = jax.random.normal(jax.random.PRNGKey(2), q.shape, jnp.bfloat16) * 0.3
    v = jax.random.normal(jax.random.PRNGKey(3), q.shape, jnp.bfloat16)
    t = np.concatenate([np.zeros(64, np.int32),
                        np.repeat(np.arange(1, 5), 96),
                        np.full(L - 64 - 384, INVALID_TIME, np.int32)])
    tq = jnp.asarray(t)[None].repeat(b, 0)
    for causal in (True, False):
        got, got_lse = flash_h2(q, k, v, tq, causal=causal, block_q=256,
                                block_k=256, return_lse=True)
        want = attention_reference(q, k, v, tq, causal=causal)
        want_lse = reference_lse(q, k, tq, causal=causal)
        valid = (t != INVALID_TIME)
        err = jnp.max(jnp.abs(
            got[:, :, valid].astype(jnp.float32)
            - want[:, :, valid].astype(jnp.float32)))
        lse_err = jnp.max(jnp.abs(got_lse[:, :, valid]
                                  - want_lse[:, :, valid]))
        log(f"correctness causal={causal}: max|err| = {err:.5f}, "
            f"max|lse err| = {lse_err:.5f}")
        assert float(err) < 0.035, "h2 kernel mismatch"
        assert float(lse_err) < 0.02, "h2 lse mismatch"

    # empty-row 3e38 handling: every key invisible => lse sentinel, o == 0
    tq_v = jnp.ones((b, L), jnp.int32)
    tk_inv = jnp.full((b, L), INVALID_TIME, jnp.int32)
    o_e, lse_e = flash_h2(q, k, v, tq_v, tk_inv, causal=False, block_q=256,
                          block_k=256, return_lse=True)
    assert bool(jnp.all(lse_e == jnp.float32(3e38))), "empty-row lse"
    assert float(jnp.max(jnp.abs(o_e.astype(jnp.float32)))) == 0.0, \
        "empty-row o"
    log("correctness empty-row: lse==3e38, o==0 OK")

    # timing at the 768p stage-2 layout
    q, tq, L = layout_768p_stage2()
    base = time_chained(
        lambda qq: flash_attention(qq, qq, qq, tq, causal=True, bounded=True),
        q, iters=args.iters)
    log(f"bounded (shipped)  L={L}: {base*1e3:.2f} ms")
    for hs, bq, bk in ((2, 1024, 1024), (2, 1024, 512), (2, 512, 1024),
                       (2, 512, 512), (3, 1024, 512), (3, 512, 512),
                       (4, 512, 512), (4, 1024, 512), (4, 512, 1024),
                       (6, 512, 512)):
        try:
            t2 = time_chained(
                lambda qq: flash_h2(qq, qq, qq, tq, causal=True,
                                    block_q=bq, block_k=bk, hs=hs),
                q, iters=args.iters)
            log(f"h{hs} bq={bq} bk={bk}  L={L}: {t2*1e3:.2f} ms "
                f"({base/t2:.3f}x vs shipped)")
        except Exception as e:
            log(f"h{hs} bq={bq} bk={bk}: FAILED {type(e).__name__}: "
                f"{str(e)[:160]}")

    if args.full:
        # ceiling probe: every tile FULL (all same time id)
        tq_full = jnp.ones_like(tq)
        basef = time_chained(
            lambda qq: flash_attention(qq, qq, qq, tq_full, causal=True,
                                       bounded=True),
            q, iters=args.iters)
        log(f"[FULL] bounded (shipped): {basef*1e3:.2f} ms")
        t2f = time_chained(
            lambda qq: flash_h2(qq, qq, qq, tq_full, causal=True,
                                block_q=1024, block_k=1024),
            q, iters=args.iters)
        log(f"[FULL] h2 1024/1024:      {t2f*1e3:.2f} ms "
            f"({basef/t2f:.3f}x vs shipped)")


if __name__ == "__main__":
    main()
