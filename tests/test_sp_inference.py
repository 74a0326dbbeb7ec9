"""Sequence-parallel inference test: pipeline.generate under an sp mesh must
match the single-device result (the reference's multi-GPU SP inference,
`inference_multigpu.py` — here a mesh config, not a process launcher)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyramid_flow_tpu.models.flux.model import FluxConfig, PyramidFluxTransformer
from pyramid_flow_tpu.parallel.mesh import MeshConfig, make_mesh
from pyramid_flow_tpu.pipeline.pyramid_pipeline import PyramidFlowPipeline

pytestmark = pytest.mark.slow

CFG = FluxConfig(
    in_channels=16,
    num_layers=1,
    num_single_layers=1,
    attention_head_dim=8,
    num_attention_heads=8,   # divisible by sp
    joint_attention_dim=32,
    pooled_projection_dim=24,
    axes_dims_rope=(4, 2, 2),
)


def _make(mesh=None):
    dit = PyramidFluxTransformer(config=CFG, dtype=jnp.float32, mesh=mesh)
    tokens = jnp.zeros((2, 16, 16))
    params = dit.init(
        jax.random.PRNGKey(0), tokens, jnp.zeros((2, 16, 3)),
        jnp.zeros((2, 16), jnp.int32), jnp.zeros((2, 8, 32)),
        jnp.ones((2, 8), bool), jnp.zeros((2, 24)), jnp.zeros((2,)))
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    params = jax.tree.unflatten(
        treedef,
        [0.03 * jax.random.normal(k, p.shape, p.dtype) for k, p in zip(keys, leaves)],
    )
    return PyramidFlowPipeline(dit, params, latent_channels=4, dtype=jnp.float32)


def test_sp_generation_matches_single_device():
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 32))
    mask = jnp.ones((1, 8), bool)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (1, 24))
    kwargs = dict(
        height=64, width=64, temp=2,
        num_inference_steps=[2, 2, 2], video_num_inference_steps=[1, 1, 1],
        output_type="latent",
    )

    single = _make(mesh=None)
    out_single = single.generate(
        jax.random.PRNGKey(4), emb, mask, pooled, emb * 0, mask, pooled * 0,
        **kwargs)

    mesh = make_mesh(MeshConfig(dp=1, fsdp=4, sp=2))
    sp = _make(mesh=mesh)
    sp.dit_params = single.dit_params  # identical weights
    with jax.set_mesh(mesh):
        out_sp = sp.generate(
            jax.random.PRNGKey(4), emb, mask, pooled, emb * 0, mask, pooled * 0,
            **kwargs)

    np.testing.assert_allclose(
        np.asarray(out_sp), np.asarray(out_single), atol=2e-4, rtol=1e-3)
