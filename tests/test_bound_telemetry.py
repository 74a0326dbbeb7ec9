"""Bounded-softmax envelope telemetry (VERDICT r4 #5).

The DiT trains with the bounded flash forward by default; a fine-tune that
inflates qk-norm gains would silently denormalize attention once the score
bound overshoots the exp2 range. These tests pin the telemetry that
announces it: the chunked probe math, the sow -> probe plumbing on both DiT
variants, and the drifted-gains alarm.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyramid_flow_tpu.ops.flash_attention import (
    INVALID_TIME, LOG2E, bounded_softmax_overshoot)
from pyramid_flow_tpu.schedulers.flow_matching import (
    PyramidFlowMatchEulerDiscreteScheduler)
from pyramid_flow_tpu.training.telemetry import (
    OVERSHOOT_WARN_LOG2, make_bound_overshoot_probe, mmdit_pos_offset_fn)


def test_chunked_overshoot_matches_dense():
    """The q-chunked implementation == the dense formula (incl. pad rows)."""
    rng = np.random.default_rng(0)
    b, h, L, d = 2, 3, 37, 8  # L deliberately not a chunk multiple
    q = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    t = np.concatenate([np.zeros(5, np.int32),
                        np.full(4, INVALID_TIME, np.int32),
                        np.repeat(np.arange(1, 5, dtype=np.int32), 7)])
    tq = jnp.asarray(t)[None].repeat(b, 0)

    sm = d ** -0.5
    qn = jnp.linalg.norm(q, axis=-1)
    kn = jnp.linalg.norm(k, axis=-1)
    mb = qn * jnp.max(kn, -1, keepdims=True) * (sm * LOG2E) + 1.0
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (sm * LOG2E)
    vis = (tq != INVALID_TIME)[:, None, None, :]
    vis = vis & (tq[:, None, None, :] <= tq[:, None, :, None])
    smax = jnp.max(jnp.where(vis, s, -jnp.inf), axis=-1)
    validq = (tq != INVALID_TIME)[:, None, :]
    dense = float(jnp.max(jnp.where(validq, mb - smax, -jnp.inf)))

    got = float(bounded_softmax_overshoot(q, k, tq, causal=True, chunk=8))
    np.testing.assert_allclose(got, dense, rtol=1e-6)


def _scale_qk_gains(params, factor):
    """Multiply every qk-norm gain (norm_q/norm_k/norm_added_*/norm_add_*)
    by ``factor`` — the drift a runaway fine-tune produces."""
    def visit(path, leaf):
        names = {getattr(p, "key", "") for p in path}
        if names & {"norm_q", "norm_k", "norm_added_q", "norm_added_k",
                    "norm_add_q", "norm_add_k"}:
            return leaf * factor
        return leaf
    return jax.tree_util.tree_map_with_path(visit, params)


@pytest.fixture(scope="module")
def flux_probe_setup():
    from pyramid_flow_tpu.models.flux.model import (
        FluxConfig, PyramidFluxTransformer)

    cfg = FluxConfig(in_channels=16, num_layers=1, num_single_layers=1,
                     attention_head_dim=8, num_attention_heads=2,
                     joint_attention_dim=16, pooled_projection_dim=8,
                     axes_dims_rope=(4, 2, 2))
    dit = PyramidFluxTransformer(config=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    latents = jnp.asarray(rng.standard_normal((2, 1, 8, 8, 4)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    mask = jnp.ones((2, 5), bool)
    pooled = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    b = 2
    params = dit.init(
        jax.random.PRNGKey(0), jnp.zeros((b, 16, 16)), jnp.zeros((b, 16, 3)),
        jnp.zeros((b, 16), jnp.int32), text, mask, pooled, jnp.zeros((b,)))
    return dit, params, (latents, text, mask, pooled)


def test_probe_reports_in_envelope_flux(flux_probe_setup):
    dit, params, (latents, text, mask, pooled) = flux_probe_setup
    probe = make_bound_overshoot_probe(
        dit, PyramidFlowMatchEulerDiscreteScheduler())
    v = float(probe(params, latents, text, mask, pooled,
                    jax.random.PRNGKey(2)))
    assert np.isfinite(v)
    assert v < OVERSHOOT_WARN_LOG2, v  # unit gains sit deep in the envelope


def test_probe_alarms_on_drifted_gains(flux_probe_setup):
    """gains x30 (what a runaway fine-tune does) must cross the warn bar."""
    dit, params, (latents, text, mask, pooled) = flux_probe_setup
    probe = make_bound_overshoot_probe(
        dit, PyramidFlowMatchEulerDiscreteScheduler())
    key = jax.random.PRNGKey(2)
    v0 = float(probe(params, latents, text, mask, pooled, key))
    drifted = _scale_qk_gains(params, 30.0)
    v1 = float(probe(drifted, latents, text, mask, pooled, key))
    assert v1 > v0, (v0, v1)
    assert v1 > OVERSHOOT_WARN_LOG2, v1


def test_probe_runs_on_mmdit():
    from pyramid_flow_tpu.models.mmdit.model import (
        MMDiTConfig, PyramidDiffusionMMDiT)

    cfg = MMDiTConfig(sample_size=8, in_channels=4, num_layers=2,
                      attention_head_dim=8, num_attention_heads=2,
                      caption_projection_dim=16, pooled_projection_dim=8,
                      joint_attention_dim=16, pos_embed_max_size=16)
    dit = PyramidDiffusionMMDiT(config=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    latents = jnp.asarray(rng.standard_normal((1, 1, 8, 8, 4)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 5, 16)), jnp.float32)
    mask = jnp.ones((1, 5), bool)
    pooled = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    params = dit.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 4 * cfg.in_channels)),
        jnp.zeros((1, 16, 3)), jnp.zeros((1, 16), jnp.int32), text, mask,
        pooled, jnp.zeros((1,)), jnp.zeros((1, 2)))
    probe = make_bound_overshoot_probe(
        dit, PyramidFlowMatchEulerDiscreteScheduler(),
        pos_offset_fn=mmdit_pos_offset_fn(cfg.pos_embed_max_size))
    v = float(probe(params, latents, text, mask, pooled,
                    jax.random.PRNGKey(4)))
    assert np.isfinite(v)


def test_sow_is_inert_without_mutable(flux_probe_setup):
    """The hot path is untouched: a normal apply (no mutable telemetry)
    returns exactly what it did before the sow was added — no telemetry
    collection leaks into the output params/variables."""
    dit, params, (latents, text, mask, pooled) = flux_probe_setup
    b = 2
    tok = jnp.zeros((b, 16, 16))
    out = dit.apply(params, tok, jnp.zeros((b, 16, 3)),
                    jnp.zeros((b, 16), jnp.int32), text, mask, pooled,
                    jnp.zeros((b,)))
    assert out.shape == (b, 16, 16)
    assert "telemetry" not in params
