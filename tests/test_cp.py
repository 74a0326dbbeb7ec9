"""Context-parallel halo-exchange tests (CPU 8-device mesh).

The CP-sharded encoder must match monolithic encoding EXACTLY: halo
exchange supplies the same frames the causal zero-padding convs would see.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pyramid_flow_tpu.models.vae.model import CausalVideoVAE, VAEConfig
from pyramid_flow_tpu.parallel.cp import cp_context, cp_vae_apply, halo_exchange
from pyramid_flow_tpu.parallel.mesh import MeshConfig, make_mesh

TINY = VAEConfig(
    latent_channels=4,
    block_out_channels=(8, 8, 16, 16),
    encoder_layers_per_block=(1, 1, 1, 1),
    decoder_layers_per_block=(1, 1, 1, 1),
    num_groups=4,
)


def test_halo_exchange_semantics():
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()).reshape(4, 2), ("cp", "x"))
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 8, 1, 1, 1)
    x = jnp.broadcast_to(x, (1, 8, 2, 2, 1))

    def f(shard):
        return halo_exchange(shard, 2, "cp")

    out = jax.shard_map(
        f, mesh=mesh, in_specs=P(None, "cp"), out_specs=P(None, "cp"),
        check_vma=False,
    )(x)
    # each device's 2 frames become 4 (2 halo + 2 own); device 0 halo = 0
    assert out.shape == (1, 16, 2, 2, 1)
    got = np.asarray(out[0, :, 0, 0, 0])
    base = np.asarray(x[0, :, 0, 0, 0])
    np.testing.assert_allclose(got[:4], [0, 0, base[0], base[1]])
    np.testing.assert_allclose(got[4:8], [base[0], base[1], base[2], base[3]])


@pytest.mark.slow
def test_cp_encode_matches_monolithic():
    devices = np.asarray(jax.devices()[:2]).reshape(2)
    mesh = jax.sharding.Mesh(devices, ("cp",))

    model = CausalVideoVAE(config=TINY)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(1), x[:, :1], rng=jax.random.PRNGKey(2))

    mono = model.apply(variables, x, method=model.encode)

    def enc(shard):
        return model.apply(variables, shard, method=model.encode)

    x_sharded = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, P(None, "cp")))
    cp_out = cp_vae_apply(enc, mesh, x_sharded, axis_name="cp")
    assert cp_out.shape == mono.shape
    np.testing.assert_allclose(
        np.asarray(cp_out), np.asarray(mono), atol=2e-5)


def test_cp_context_is_scoped():
    from pyramid_flow_tpu.parallel.cp import current_cp_axis

    assert current_cp_axis() is None
    with cp_context("cp"):
        assert current_cp_axis() == "cp"
        with cp_context("other"):
            assert current_cp_axis() == "other"
        assert current_cp_axis() == "cp"
    assert current_cp_axis() is None


@pytest.mark.slow
def test_cp_decode_matches_monolithic_tail():
    """CP decode must match monolithic decode exactly (the upsample
    frame-drop is globalized via a reverse ppermute shift)."""
    from pyramid_flow_tpu.parallel.cp import cp_vae_decode

    devices = np.asarray(jax.devices()[:2]).reshape(2)
    mesh = jax.sharding.Mesh(devices, ("cp",))

    model = CausalVideoVAE(config=TINY)
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 1, 16, 16, 3)),
        rng=jax.random.PRNGKey(2))

    z = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 2, 2, 4))
    mono = model.apply(variables, z, method=model.decode)  # [1, 25, 16, 16, 3]

    z_sharded = jax.device_put(
        z, jax.sharding.NamedSharding(mesh, P(None, "cp")))
    out = cp_vae_decode(model, variables, z_sharded, mesh, axis_name="cp")
    assert out.shape == mono.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(mono), atol=2e-5)
