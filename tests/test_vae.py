"""Causal VAE tests.

The key invariants (reference has no tests — SURVEY.md §4 defines these):
1. geometry: 8x8x8 compression with the +1 leading frame convention
2. temporal causality: changing future input frames never changes past outputs
3. streaming equivalence: chunked encode/decode == monolithic (bit-tolerance)
4. tiled encode/decode produce the right shapes and approximate the untiled path
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyramid_flow_tpu.models.vae.model import (
    CausalVideoVAE,
    VAEConfig,
    chunk_decode,
    chunk_encode,
    gaussian_kl,
    gaussian_mode,
    gaussian_sample,
    plan_axis,
    tiled_decode,
    tiled_decode_planned,
    tiled_encode,
)

# Tiny config: same topology (4 levels, same down/up pattern), small widths.
TINY = VAEConfig(
    latent_channels=4,
    block_out_channels=(8, 8, 16, 16),
    encoder_layers_per_block=(1, 1, 1, 1),
    decoder_layers_per_block=(1, 1, 1, 1),
    num_groups=4,
)


@pytest.fixture(scope="module")
def vae_and_params():
    model = CausalVideoVAE(config=TINY)
    x = jnp.zeros((1, 9, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, rng=jax.random.PRNGKey(1))
    return model, variables


@pytest.mark.slow
def test_encode_decode_geometry(vae_and_params):
    model, variables = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 17, 32, 32, 3))
    moments = model.apply(variables, x, method=model.encode)
    # 17 frames -> 1 + 16/8 = 3 latent frames; 32 -> 4 spatial
    assert moments.shape == (1, 3, 4, 4, 8)
    z = gaussian_mode(moments)
    assert z.shape == (1, 3, 4, 4, 4)
    dec = model.apply(variables, z, method=model.decode)
    assert dec.shape == (1, 17, 32, 32, 3)


@pytest.mark.slow
def test_single_image(vae_and_params):
    model, variables = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 32, 32, 3))
    moments = model.apply(variables, x, method=model.encode)
    assert moments.shape == (2, 1, 4, 4, 8)
    dec = model.apply(variables, gaussian_mode(moments), method=model.decode)
    assert dec.shape == (2, 1, 32, 32, 3)


def test_temporal_causality(vae_and_params):
    """Perturbing frames 9.. must not change latents for frames 0..8."""
    model, variables = vae_and_params
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (1, 17, 32, 32, 3))
    x2 = x.at[:, 9:].set(jax.random.normal(jax.random.PRNGKey(5), (1, 8, 32, 32, 3)))
    m1 = model.apply(variables, x, method=model.encode)
    m2 = model.apply(variables, x2, method=model.encode)
    # frames 0..8 -> latent frames 0..1 (1 + 8/8)
    np.testing.assert_allclose(m1[:, :2], m2[:, :2], atol=1e-5)
    assert not np.allclose(m1[:, 2:], m2[:, 2:], atol=1e-5)


@pytest.mark.slow
def test_chunk_encode_matches_monolithic(vae_and_params):
    model, variables = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 17, 16, 16, 3))
    mono = model.apply(variables, x, method=model.encode)
    chunked = chunk_encode(model, variables, x, window_size=8)
    assert chunked.shape == mono.shape
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(mono), atol=2e-4)


@pytest.mark.slow
def test_chunk_decode_matches_monolithic(vae_and_params):
    model, variables = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(7), (1, 5, 4, 4, 4))
    mono = model.apply(variables, z, method=model.decode)
    chunked = chunk_decode(model, variables, z, window_size=2)
    assert chunked.shape == mono.shape
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(mono), atol=2e-4)


@pytest.mark.slow  # sweeps every split point (~37 s); the single-split
# exactness case stays fast via test_chunk_decode_matches_monolithic's
# planned-stitch sibling (test_planned_stitch_positions_exact)
def test_chunk_decode_any_split_is_exact(vae_and_params):
    """Streaming is exact under ANY window split: the production decode
    uses a 1-frame init window (memory high-water fix) instead of the
    reference's ``window+1`` first chunk — both must equal monolithic."""
    model, variables = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(7), (1, 6, 4, 4, 4))
    mono = model.apply(variables, z, method=model.decode)
    for iw in (1, 2, 3):
        chunked = chunk_decode(model, variables, z, window_size=2,
                               init_window=iw)
        assert chunked.shape == mono.shape, iw
        np.testing.assert_allclose(
            np.asarray(chunked), np.asarray(mono), atol=2e-4,
            err_msg=f"init_window={iw}")


def test_plan_axis_properties():
    """Planned tiling: uniform tile size, even integral stride, exact flush
    cover, overlap >= the blend minimum."""
    for extent in (12, 48, 96, 157, 160):
        for tile_max in (8, 20, 48, 83, 200):
            for ov in (2, 6):
                if tile_max <= ov:
                    continue
                tile, pos = plan_axis(extent, tile_max, ov)
                assert pos[0] == 0 and pos[-1] + tile == extent
                if len(pos) == 1:
                    assert tile == extent
                else:
                    assert tile <= tile_max
                    strides = {b - a for a, b in zip(pos, pos[1:])}
                    assert len(strides) == 1, (extent, tile_max, ov, pos)
                    assert tile - strides.pop() >= ov


def test_planned_stitch_positions_exact(vae_and_params):
    """Prove the planned-tile stitch arithmetic with a positional fake
    decoder (nearest-neighbor 8x upsample): overlapping tiles then see
    IDENTICAL pixels, so blending is a no-op and any position/crop bug
    shows up as a hard mismatch."""
    model, _ = vae_and_params
    ds = model.config.downsample_scale

    def fake(tile):
        up = jnp.repeat(jnp.repeat(tile[..., :3], ds, axis=2), ds, axis=3)
        return up

    z = jax.random.normal(jax.random.PRNGKey(11), (1, 2, 12, 20, 4))
    ref = fake(z)
    for th, tw in [(8, 9), (12, 7), (5, 20), (12, 20)]:
        out = tiled_decode_planned(model, None, z, tile_h=th, tile_w=tw,
                                   min_overlap=2, _decode_fn=fake)
        assert out.shape == ref.shape, (th, tw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, err_msg=f"tile {th}x{tw}")


@pytest.mark.slow
def test_planned_strip_decode_shapes(vae_and_params):
    """Real decoder through the planned path: full-height window-1 strips
    (the released-DiT 768p plan) produce the right geometry and finite
    pixels."""
    model, variables = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(12), (1, 3, 8, 16, 4))
    out = tiled_decode_planned(model, variables, z, tile_h=8, tile_w=10,
                               min_overlap=2, window_size=1)
    assert out.shape == (1, 17, 64, 128, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_spatial_attention_chunked_matches_direct(monkeypatch):
    """The big-frame chunked-query attention path (peak-memory fix for
    untiled/strip decode) must be bit-for-bit the math of the direct path:
    lower the chunk threshold so a small frame takes the chunked branch and
    compare against the same frame through the direct branch."""
    import pyramid_flow_tpu.models.vae.layers as L

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 8, 12, 32))
    attn = L.SpatialAttention(num_groups=4)
    variables = attn.init(jax.random.PRNGKey(4), x)
    direct = attn.apply(variables, x)

    monkeypatch.setattr(L, "ATTN_CHUNK_TOKENS", 16)
    chunked = attn.apply(variables, x)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(direct),
                               atol=1e-6)


def test_gaussian_helpers():
    moments = jnp.concatenate(
        [jnp.ones((1, 1, 2, 2, 4)), jnp.zeros((1, 1, 2, 2, 4))], axis=-1
    )
    assert gaussian_mode(moments).shape == (1, 1, 2, 2, 4)
    np.testing.assert_allclose(np.asarray(gaussian_mode(moments)), 1.0)
    # KL(N(1,1) || N(0,1)) = 0.5 per dim, 16 dims
    np.testing.assert_allclose(np.asarray(gaussian_kl(moments)), 8.0, rtol=1e-5)
    s = gaussian_sample(moments, jax.random.PRNGKey(0))
    assert s.shape == (1, 1, 2, 2, 4)


@pytest.mark.slow
def test_tiled_roundtrip_shapes(vae_and_params):
    model, variables = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 9, 64, 64, 3))
    moments = tiled_encode(model, variables, x, tile_sample_min_size=32)
    assert moments.shape == (1, 2, 8, 8, 8)
    dec = tiled_decode(model, variables, gaussian_mode(moments), tile_sample_min_size=32)
    assert dec.shape == (1, 9, 64, 64, 3)


@pytest.mark.slow
def test_training_forward(vae_and_params):
    model, variables = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 9, 16, 16, 3))
    moments, dec = model.apply(variables, x, rng=jax.random.PRNGKey(10))
    assert moments.shape == (1, 2, 2, 2, 8)
    assert dec.shape == (1, 9, 16, 16, 3)


@pytest.mark.slow
def test_reconstruct_facade(vae_and_params):
    from pyramid_flow_tpu.models.vae.model import reconstruct
    model, variables = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 17, 32, 32, 3)) * 0.3
    out = reconstruct(model, variables, x, window_size=8)
    assert out.shape == x.shape
    # decode window = encode window / 8 -> equals explicit chunked path
    moments = chunk_encode(model, variables, x, window_size=8)
    ref = chunk_decode(model, variables, gaussian_mode(moments), window_size=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_2d_block_variants():
    """Non-causal 2D twin blocks selected via config block-type strings."""
    cfg2d = VAEConfig(
        latent_channels=4, block_out_channels=(8, 8, 16, 16),
        encoder_layers_per_block=(1, 1, 1, 1),
        decoder_layers_per_block=(1, 1, 1, 1), num_groups=4,
        down_block_types=("DownEncoderBlock2D",) * 4,
        up_block_types=("UpDecoderBlock2D",) * 4,
        mid_block_type="UNetMidBlock2D",
        temporal_down_sample=(False,) * 4)
    model = CausalVideoVAE(config=cfg2d)
    x = jnp.zeros((1, 2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, rng=jax.random.PRNGKey(1))
    moments = model.apply(variables, x, method=model.encode)
    assert moments.shape == (1, 2, 4, 4, 8)  # spatial 8x, no temporal down
    dec = model.apply(variables, gaussian_mode(moments), method=model.decode)
    assert dec.shape[2:] == (32, 32, 3)
