"""Training telemetry: bounded-softmax exactness-envelope monitoring.

The DiT trains (and serves) with the bounded flash forward by default: the
kernel replaces the running row max with an a-priori score bound derived
from |q|,|k| (``ops/flash_attention.py``), which is exact only while
``bound - true_max_score`` stays well under ~120 log2 units (bf16/fp32
exponent range). Both DiT variants qk-norm q/k so released weights sit in
the low tens — but a fine-tune that grows the qk-norm gains can drift out
of the envelope and would otherwise *silently* denormalize attention
(VERDICT r4 #5). This module turns the existing debug probe into live
training telemetry:

* the attention modules ``sow`` batch-row-0 post-RoPE q/k into a
  ``telemetry`` collection (a no-op — traced then DCE'd — unless the
  collection is made mutable);
* :func:`make_bound_overshoot_probe` builds a jitted probe that runs ONE
  representative DiT forward with telemetry capture and returns the max
  overshoot across every attention layer;
* the train CLI logs it as ``train/bound_overshoot_log2`` every
  ``--bound_probe_freq`` steps and warns past :data:`OVERSHOOT_WARN_LOG2`.

There is no auto-fallback mid-run: the kernel choice is baked into the
already-compiled train step at trace time, so flipping ``PF_BOUNDED_SOFTMAX``
would only affect later compiles. The honest remedy — restart the run with
``PF_BOUNDED_SOFTMAX=0`` — is what the warning says.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.flash_attention import INVALID_TIME, bounded_softmax_overshoot
from ..pipeline.noising import add_pyramid_noise_stage, latent_pyramid
from ..pipeline.packing import pack_clips

__all__ = ["OVERSHOOT_WARN_LOG2", "make_bound_overshoot_probe",
           "overshoot_from_telemetry"]

# warn threshold: exactness dies near ~120 log2 units (exp2 underflow of the
# row max itself); released/in-envelope models measure in the low tens
OVERSHOOT_WARN_LOG2 = 100.0


def overshoot_from_telemetry(telemetry, time_q) -> jnp.ndarray:
    """Max ``bounded_softmax_overshoot`` over every sown (q, k) pair.

    ``telemetry``: the mutated 'telemetry' collection from ``dit.apply(...,
    mutable=["telemetry"])`` — each attention layer holds ``q``/``k`` leaves
    of shape [1, H, L, D] (unscanned) or [layers, 1, H, L, D] (under
    nn.scan). ``time_q``: [1, L] model-level time ids ([text; latent])."""
    flat = jax.tree_util.tree_flatten_with_path(telemetry)[0]
    qs = {}
    ks = {}
    for path, leaf in flat:
        # sow stores a 1-tuple, so paths end (..., DictKey('q'|'k'),
        # SequenceKey(0)); group q/k by the enclosing module path
        name = getattr(path[-2], "key", None)
        parent = tuple(str(p) for p in path[:-2])
        assert name in ("q", "k"), path
        (qs if name == "q" else ks)[parent] = leaf
    assert qs and sorted(qs) == sorted(ks), (sorted(qs), sorted(ks))

    worst = jnp.float32(-jnp.inf)
    for parent in sorted(qs):
        q, k = qs[parent], ks[parent]
        if q.ndim == 4:  # unscanned layer
            q, k = q[None], k[None]
        assert q.ndim == 5, q.shape

        def per_layer(qk):
            ql, kl = qk
            return bounded_softmax_overshoot(ql, kl, time_q)

        worst = jnp.maximum(worst, jnp.max(jax.lax.map(per_layer, (q, k))))
    return worst


def make_bound_overshoot_probe(dit, scheduler, stage: Optional[int] = None,
                               pos_offset_fn=None):
    """Build ``probe(params, latents, text_emb, text_mask, pooled, rng) ->
    scalar overshoot`` (jitted).

    Runs batch row 0 through ONE noised DiT forward at the final pyramid
    stage (the longest sequence the trainer produces; overshoot shrinks
    with more visible keys, so shorter stages can only measure lower) with
    the ``telemetry`` collection mutable, then reduces the sown q/k pairs.
    ``dit`` is rebuilt with ``remat=False``: the probe never differentiates,
    and sown collections do not flow out of ``nn.remat``."""
    probe_dit = dit.clone(remat=False)
    num_stages = scheduler.stages
    probe_stage = num_stages - 1 if stage is None else stage

    @jax.jit
    def probe(params, latents, text_emb, text_mask, pooled, rng):
        lat1 = latents[:1]
        pyramid = latent_pyramid(lat1, num_stages)
        sb = add_pyramid_noise_stage(rng, scheduler, pyramid, probe_stage,
                                     num_stages)
        tokens, positions, time_ids, _ = pack_clips(sb.clips)
        b = tokens.shape[0]
        pos = jnp.broadcast_to(jnp.asarray(positions)[None],
                               (b,) + positions.shape)
        times = jnp.broadcast_to(jnp.asarray(time_ids)[None],
                                 (b,) + time_ids.shape)
        extra = ()
        if pos_offset_fn is not None:
            extra = (pos_offset_fn(sb, b),)
        _, mut = probe_dit.apply(
            params, tokens.astype(text_emb.dtype), pos, times,
            text_emb[:1], text_mask[:1], pooled[:1], sb.timesteps, *extra,
            mutable=["telemetry"])
        # model-level attention time ids: [text (0 / INVALID); latent]
        text_time = jnp.where(text_mask[:1], 0, INVALID_TIME).astype(jnp.int32)
        tq = jnp.concatenate([text_time, times[:1].astype(jnp.int32)], axis=1)
        return overshoot_from_telemetry(mut["telemetry"], tq)

    return probe


def mmdit_pos_offset_fn(pos_embed_max_size: int):
    """`pos_offset_fn` for the SD3/mmdit variant: the sincos table crop
    origin for the probe stage's grid (same math as the trainer/pipeline)."""
    def fn(sb, b):
        h_s, w_s = sb.clips[0].shape[2], sb.clips[0].shape[3]
        g = pos_embed_max_size
        off = jnp.asarray([[(g - h_s // 2) // 2, (g - w_s // 2) // 2]],
                          jnp.float32)
        return jnp.broadcast_to(off, (b, 2))
    return fn
