"""Context-parallel VAE GAN training exactness (CPU multi-device mesh).

The reference trains the stage-2 VAE on long clips with the time axis
sharded across GPUs (`causal_video_vae_wrapper.py:106-135`,
`scripts/train_causal_video_vae.sh:53-57`). Our TPU form shards time over a
``cp`` mesh axis inside ``make_vae_train_step``; these tests assert the
sharded step produces the same losses, adaptive weight, and RAW GRADIENTS
as the monolithic step on the same data.

Gradients (not post-Adam params) are the comparison object: Adam divides by
sqrt(second moment), so on noise-dominated elements a ~1e-7 fp-association
difference in a tiny gradient flips the update's SIGN at full ±lr
magnitude — an artifact of the optimizer's conditioning, not a parallelism
bug. Raw gradients compare at fp32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

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

TINY = VAEConfig(
    latent_channels=2,
    block_out_channels=(4, 4, 8, 8),
    encoder_layers_per_block=(1, 1, 1, 1),
    decoder_layers_per_block=(1, 1, 1, 1),
    num_groups=2,
)


def _setup(use_3d_disc):
    vae = CausalVideoVAE(config=TINY)
    lpips = LPIPS()
    disc = (PatchDiscriminator3D(ndf=8, n_layers=2) if use_3d_disc
            else PatchDiscriminator2D(ndf=8, n_layers=2))

    # T=32 global: 16 frames/device at cp=2, 2 latent frames/device (>= the
    # k_t-1=2 halo the deepest decoder convs need).
    video = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 32, 3)) * 0.5
    vae_params = vae.init(jax.random.PRNGKey(1), video[:, :8],
                          rng=jax.random.PRNGKey(2))
    lpips_params = lpips.init(jax.random.PRNGKey(3), video[:, 0], video[:, 0])
    disc_params = disc.init(
        jax.random.PRNGKey(4), video if use_3d_disc else video[:, 0])

    cfg = VAETrainConfig(disc_start=1, learning_rate=1e-4)
    state = create_vae_train_state(vae_params, disc_params, cfg)
    return vae, lpips, lpips_params, disc, video, state


def _grads_close(a, b, tol=1e-3):
    """Per-leaf comparison scaled to the leaf's own gradient magnitude.

    The scale is floored at 1e-2x the tree-global max: leaves whose TRUE
    gradient is ~0 (e.g. attention key bias — softmax is shift-invariant in
    k; pre-norm conv biases — the norm cancels the shift) contain only
    fp-association noise (~1e-7 relative to the global scale), which is not
    a parallelism bug. The floor admits absolute errors up to 1e-5x the
    global gradient magnitude — far below any real sharding bug, which
    perturbs gradients at the scale of the gradients themselves.
    """
    flat_a, _ = jax.tree_util.tree_flatten_with_path(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    gmax = max((float(np.abs(np.asarray(l, np.float32)).max())
                for l in flat_b), default=0.0)
    for (path, la), lb in zip(flat_a, flat_b):
        la = np.asarray(la, np.float32)
        lb = np.asarray(lb, np.float32)
        scale = max(float(np.abs(la).max()), float(np.abs(lb).max()),
                    1e-2 * gmax, 1e-8)
        np.testing.assert_allclose(
            la, lb, atol=tol * scale, rtol=5e-3,
            err_msg="/".join(str(p) for p in path))


def _compare_metrics(mm, mc, step_idx):
    for k in sorted(mm):
        np.testing.assert_allclose(
            float(mm[k]), float(mc[k]), atol=3e-5, rtol=2e-4,
            err_msg=f"metric {k} diverged at step {step_idx}")


@pytest.mark.parametrize("use_3d_disc", [False, True])
def test_cp_vae_train_step_matches_unsharded(use_3d_disc):
    """cp=2 sharded GAN step == monolithic: metrics AND raw gradients.

    Runs from TWO states (fresh, and post-one-Adam-step) so both the
    disc-off (step 0) and disc-on + adaptive d_weight (step 1) code paths
    are compared. Both sides always see the IDENTICAL state (advanced by the
    monolithic optimizer) so differences cannot accumulate.
    """
    vae, lpips, lpips_params, disc, video, state0 = _setup(use_3d_disc)

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:2]), ("cp",))
    kw = dict(use_3d_disc=use_3d_disc, donate=False, is_init=False)
    step_mono = make_vae_train_step(vae, lpips, lpips_params, disc, **kw)
    grads_mono = make_vae_train_step(vae, lpips, lpips_params, disc,
                                     grads_only=True, **kw)
    grads_cp = make_vae_train_step(vae, lpips, lpips_params, disc,
                                   grads_only=True, mesh=mesh, cp_axis="cp",
                                   **kw)

    video_sharded = jax.device_put(
        video, jax.sharding.NamedSharding(mesh, P(None, "cp")))

    rng = jax.random.PRNGKey(5)
    sm = state0
    for step_idx in range(2):
        gm, dm, mm = grads_mono(sm, video, rng)
        gc, dc, mc = grads_cp(sm, video_sharded, rng)
        _compare_metrics(mm, mc, step_idx)
        _grads_close(gm, gc)
        _grads_close(dm, dc)
        if step_idx == 1:
            assert float(mc["vae/d_weight"]) > 0  # adaptive path exercised
        sm, _ = step_mono(sm, video, rng)


def test_cp_plus_dp_vae_train_step():
    """(dp=2, cp=2) combined batch+time sharding matches monolithic."""
    vae, lpips, lpips_params, disc, video, state0 = _setup(False)
    video = jnp.concatenate([video, video[:, :, ::-1]], axis=0)  # B=2

    mesh = jax.sharding.Mesh(
        np.asarray(jax.devices()[:4]).reshape(2, 2), ("dp", "cp"))
    kw = dict(donate=False, is_init=False, grads_only=True)
    grads_mono = make_vae_train_step(vae, lpips, lpips_params, disc, **kw)
    grads_cp = make_vae_train_step(vae, lpips, lpips_params, disc,
                                   mesh=mesh, cp_axis="cp", dp_axis="dp", **kw)

    video_sharded = jax.device_put(
        video, jax.sharding.NamedSharding(mesh, P("dp", "cp")))

    rng = jax.random.PRNGKey(7)
    gm, dm, mm = grads_mono(state0, video, rng)
    gc, dc, mc = grads_cp(state0, video_sharded, rng)
    _compare_metrics(mm, mc, 0)
    _grads_close(gm, gc)
    _grads_close(dm, dc)
