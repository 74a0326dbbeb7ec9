"""EMA evaluation path (VERDICT r1 #7).

The reference maintains an EMA copy of the DiT during training and ships it
for inference (`train/train_pyramid_flow.py:451-486`). Here:
* ``PyramidFlowPipeline.from_train_state(..., use_ema=True)`` selects the
  EMA tree;
* ``export_ema_params``/``load_ema_params`` round-trip the EMA weights
  standalone (no optimizer-state structure needed at load time).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyramid_flow_tpu.models.flux.model import FluxConfig, PyramidFluxTransformer
from pyramid_flow_tpu.pipeline.pyramid_pipeline import PyramidFlowPipeline
from pyramid_flow_tpu.training.train_state import TrainConfig, create_train_state
from pyramid_flow_tpu.utils.checkpoint import export_ema_params, load_ema_params

CFG = FluxConfig(
    in_channels=16, num_layers=1, num_single_layers=1, attention_head_dim=8,
    num_attention_heads=4, joint_attention_dim=32, pooled_projection_dim=24,
    axes_dims_rope=(4, 2, 2),
)


def _tiny_state():
    dit = PyramidFluxTransformer(config=CFG, dtype=jnp.float32)
    params = dit.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16)), jnp.zeros((1, 16, 3)),
        jnp.zeros((1, 16), jnp.int32), jnp.zeros((1, 8, 32)),
        jnp.ones((1, 8), bool), jnp.zeros((1, 24)), jnp.zeros((1,)))
    state = create_train_state(params, TrainConfig(
        learning_rate=1e-2, ema_decay=0.5))
    # take one (fake) gradient step so params and ema_params diverge
    grads = jax.tree.map(lambda p: jnp.ones_like(p), state.params)
    state = state.apply_gradients(grads, loss=jnp.float32(0.1))
    return dit, state


@pytest.mark.slow  # two full generate() passes (~58 s); EMA export/load
# weight selection stays fast via test_ema_export_roundtrip
def test_from_train_state_selects_ema():
    dit, state = _tiny_state()
    raw = PyramidFlowPipeline.from_train_state(
        dit, state, latent_channels=4, dtype=jnp.float32)
    ema = PyramidFlowPipeline.from_train_state(
        dit, state, use_ema=True, latent_channels=4, dtype=jnp.float32)

    # the two pipelines must hold different weights...
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         raw.dit_params, ema.dit_params)
    assert max(jax.tree.leaves(diffs)) > 1e-4

    # ...and produce different generations from the same seed
    k = jax.random.PRNGKey(7)
    emb = jax.random.normal(k, (1, 8, 32))
    mask = jnp.ones((1, 8), bool)
    pooled = jax.random.normal(k, (1, 24))
    common = dict(height=64, width=64, temp=1,
                  num_inference_steps=[2, 2, 2], guidance_scale=3.0,
                  output_type="latent")
    out_raw = np.asarray(raw.generate(
        jax.random.PRNGKey(1), emb, mask, pooled, emb * 0, mask, pooled * 0,
        **common))
    out_ema = np.asarray(ema.generate(
        jax.random.PRNGKey(1), emb, mask, pooled, emb * 0, mask, pooled * 0,
        **common))
    assert out_raw.shape == out_ema.shape
    assert np.abs(out_raw - out_ema).max() > 1e-6


def test_ema_export_roundtrip(tmp_path):
    dit, state = _tiny_state()
    path = export_ema_params(str(tmp_path), 3, state.ema_params)
    assert path.endswith("checkpoint-3-ema")

    # restore without a target (raw arrays) picking the newest export
    restored = load_ema_params(str(tmp_path))
    orig_leaves = jax.tree.leaves(state.ema_params)
    rest_leaves = jax.tree.leaves(restored)
    assert len(orig_leaves) == len(rest_leaves)
    for a, b in zip(orig_leaves, rest_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restore with a target (structure + dtypes preserved)
    target = jax.tree.map(jnp.zeros_like, state.ema_params)
    restored2 = load_ema_params(path, target)
    for a, b in zip(jax.tree.leaves(state.ema_params),
                    jax.tree.leaves(restored2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
