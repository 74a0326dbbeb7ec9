"""VAE GAN training tests: LPIPS, discriminators, full two-optimizer step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyramid_flow_tpu.models.vae.discriminator import (
    PatchDiscriminator2D,
    PatchDiscriminator3D,
)
from pyramid_flow_tpu.models.vae.lpips import LPIPS
from pyramid_flow_tpu.models.vae.model import CausalVideoVAE, VAEConfig
from pyramid_flow_tpu.training.vae_trainer import (
    VAETrainConfig,
    create_vae_train_state,
    make_vae_train_step,
)

pytestmark = pytest.mark.slow

TINY_VAE = VAEConfig(
    latent_channels=2,
    block_out_channels=(4, 4, 8, 8),
    encoder_layers_per_block=(1, 1, 1, 1),
    decoder_layers_per_block=(1, 1, 1, 1),
    num_groups=2,
)


def test_lpips_shapes_and_zero():
    lpips = LPIPS()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3)) * 0.5
    params = lpips.init(jax.random.PRNGKey(1), x, x)
    same = lpips.apply(params, x, x)
    assert same.shape == (2, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(same), 0.0, atol=1e-6)
    y = jnp.clip(x + 0.5, -1, 1)
    diff = lpips.apply(params, x, y)
    # nonzero for different inputs (sign depends on lin weights; the released
    # checkpoint's lin weights are non-negative)
    assert np.isfinite(np.asarray(diff)).all()
    assert float(np.abs(diff).min()) > 0


def test_lpips_matches_torch_vgg_structure():
    """Converter round-trip against a torch LPIPS-style state dict."""
    torch = pytest.importorskip("torch")
    from pyramid_flow_tpu.models.vae.lpips import _SLICES, convert_lpips

    # build a synthetic torch state dict with the reference's key layout
    sd = {}
    rng = np.random.default_rng(0)
    tidx = 0
    in_ch = 3
    for channels, slice_name in _SLICES:
        start = tidx
        for ch in channels:
            sd[f"net.{slice_name}.{tidx}.weight"] = rng.standard_normal(
                (ch, in_ch, 3, 3)).astype(np.float32) * 0.01
            sd[f"net.{slice_name}.{tidx}.bias"] = np.zeros(ch, np.float32)
            tidx += 2  # conv + relu
            in_ch = ch
        tidx += 1  # pool
    for k, ch in enumerate([64, 128, 256, 512, 512]):
        sd[f"lin{k}.model.1.weight"] = np.abs(
            rng.standard_normal((1, ch, 1, 1))).astype(np.float32)

    params = convert_lpips(sd)
    lpips = LPIPS()
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3)) * 0.3
    y = x * 0.5
    out = lpips.apply(params, x, y)
    assert np.isfinite(np.asarray(out)).all() and float(out.sum()) != 0


def test_discriminators():
    d2 = PatchDiscriminator2D(ndf=8, n_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    p2 = d2.init(jax.random.PRNGKey(1), x)
    out = d2.apply(p2, x)
    assert out.shape[0] == 2 and out.shape[-1] == 1

    d3 = PatchDiscriminator3D(ndf=8, n_layers=2)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 32, 32, 3))
    p3 = d3.init(jax.random.PRNGKey(3), v)
    out3 = d3.apply(p3, v)
    assert out3.shape[0] == 1 and out3.shape[-1] == 1


def test_vae_gan_train_step():
    """One compiled step exercises BOTH disc-off (step 0 < disc_start=1) and
    disc-on (step 1) paths via the in-graph gating."""
    vae = CausalVideoVAE(config=TINY_VAE)
    lpips = LPIPS()
    disc = PatchDiscriminator2D(ndf=8, n_layers=2)

    video = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 32, 3)) * 0.5
    vae_params = vae.init(jax.random.PRNGKey(1), video, rng=jax.random.PRNGKey(2))
    lpips_params = lpips.init(
        jax.random.PRNGKey(3), video[:, 0], video[:, 0])
    disc_params = disc.init(jax.random.PRNGKey(4), video[:, 0])

    cfg = VAETrainConfig(disc_start=1, learning_rate=1e-4)
    state = create_vae_train_state(vae_params, disc_params, cfg)
    step = make_vae_train_step(vae, lpips, lpips_params, disc, donate=False)

    # step 0: discriminator gated OFF
    state1, m0 = step(state, video, jax.random.PRNGKey(5))
    assert int(state1.step) == 1
    assert np.isfinite(float(m0["vae/total_loss"]))
    assert float(m0["vae/rec_loss"]) > 0
    assert float(m0["vae/d_weight"]) == 0
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.disc_params, state1.disc_params)
    assert max(jax.tree.leaves(diff)) == 0
    gdiff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.gen_params["vae"], state1.gen_params["vae"])
    assert max(jax.tree.leaves(gdiff)) > 0

    # step 1: discriminator ON (same compiled program)
    state2, m1 = step(state1, video, jax.random.PRNGKey(5))
    assert float(m1["vae/d_weight"]) > 0
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state1.disc_params, state2.disc_params)
    assert max(jax.tree.leaves(diff)) > 0
