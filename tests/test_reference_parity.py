"""Parity against the ACTUAL reference implementation (/root/reference).

Unlike tests/test_torch_oracle.py / test_vae_torch_oracle.py (whose oracles
are torch models re-derived from the reference's formulas), these tests
import the reference's OWN modules — `diffusion_schedulers`,
`pyramid_dit.flux_modules.modeling_pyramid_flux`,
`pyramid_dit.mmdit_modules.modeling_pyramid_mmdit`,
`video_vae.modeling_causal_vae`, `video_vae.modeling_lpips` — through the
dependency shims in tests/refshims, push their state dicts through
utils/converters.py, and assert activation agreement (VERDICT round-1
item #1).

Configs are reduced-depth but real-width for the DiTs (inner dim 1536) and
reduced-width for the VAE (conv3d stacks at full width are too slow on the
CPU test runner; the converter/layout logic is width-agnostic).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_loader import load_reference_module

pytestmark = pytest.mark.slow


def _rerandomize_zeros(module: torch.nn.Module, seed: int, std: float = 0.02):
    """The reference zero-inits adaLN modulation and output projections
    (modeling_pyramid_flux.py:171-183) — a zero proj_out would make parity
    trivially vacuous. Replace all-zero tensors with small random values."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            if p.abs().max() == 0:
                p.copy_(torch.randn(p.shape, generator=g) * std)


def _sd_numpy(module: torch.nn.Module):
    return {k: v.detach().float().numpy() for k, v in module.state_dict().items()}


# ================================================================ scheduler
@pytest.mark.parametrize("shift", [1.0, 3.0])
def test_scheduler_matches_reference(shift):
    m = load_reference_module("diffusion_schedulers.scheduling_flow_matching")
    ref = m.PyramidFlowMatchEulerDiscreteScheduler(
        shift=shift, stages=3, stage_range=[0, 1 / 3, 2 / 3, 1], gamma=1 / 3)

    from pyramid_flow_tpu.schedulers.flow_matching import (
        PyramidFlowMatchEulerDiscreteScheduler, euler_step)
    ours = PyramidFlowMatchEulerDiscreteScheduler(
        shift=shift, stages=3, stage_range=(0, 1 / 3, 2 / 3, 1), gamma=1 / 3)

    for i_s in range(3):
        assert ref.start_sigmas[i_s] == pytest.approx(ours.start_sigmas[i_s],
                                                      abs=1e-6)
        assert ref.end_sigmas[i_s] == pytest.approx(ours.end_sigmas[i_s],
                                                    abs=1e-6)
        assert ref.ori_start_sigmas[i_s] == pytest.approx(
            ours.ori_start_sigmas[i_s], abs=1e-6)
        np.testing.assert_allclose(
            ref.timesteps_per_stage[i_s].numpy(),
            ours.timesteps_per_stage[i_s], atol=2e-3, rtol=1e-5)
        np.testing.assert_allclose(
            ref.sigmas_per_stage[i_s].numpy(),
            ours.sigmas_per_stage[i_s], atol=1e-6)

    # full per-stage denoise trajectories through the reference's own step()
    rng = np.random.default_rng(0)
    for i_s, steps in ((0, 7), (1, 5), (2, 10)):
        ref.set_timesteps(steps, i_s)
        timesteps, sigmas = ours.inference_tables(steps, i_s)
        np.testing.assert_allclose(ref.timesteps.numpy(), timesteps,
                                   atol=2e-3, rtol=1e-5)
        np.testing.assert_allclose(ref.sigmas.numpy(), sigmas, atol=1e-6)

        x_ref = torch.tensor(rng.standard_normal((2, 4)).astype(np.float32))
        x_ours = jnp.asarray(x_ref.numpy())
        for i, t in enumerate(ref.timesteps):
            v = torch.tensor(
                rng.standard_normal((2, 4)).astype(np.float32))
            x_ref = ref.step(v, t, x_ref, return_dict=False)[0]
            x_ours = euler_step(x_ours, jnp.asarray(v.numpy()),
                                sigmas[i], sigmas[i + 1])
        np.testing.assert_allclose(np.asarray(x_ours), x_ref.numpy(),
                                   atol=1e-5, rtol=1e-5)


# ================================================================== miniFLUX
def test_flux_forward_matches_reference():
    """Reference PyramidFluxTransformer (2 dual + 2 single, real 1536 width,
    temporal-causal SDPA path) vs our packed-token flax model through
    convert_flux_dit — 3 pyramid stages, the highest with an AR history clip
    list, partially masked text."""
    m = load_reference_module(
        "pyramid_dit.flux_modules.modeling_pyramid_flux")
    torch.manual_seed(0)
    # NB: the released config's patch_size arg is 1 (the token patchify is
    # hard-coded to 2 separately, modeling_pyramid_flux.py:147); proj_out's
    # width depends on the CONFIG arg (:137), so pass 1 as released.
    ref = m.PyramidFluxTransformer(
        patch_size=1, in_channels=64, num_layers=2, num_single_layers=2,
        attention_head_dim=64, num_attention_heads=24,
        joint_attention_dim=512, pooled_projection_dim=96,
        axes_dims_rope=[16, 24, 24], use_flash_attn=False,
        use_temporal_causal=True, interp_condition_pos=True).eval()
    _rerandomize_zeros(ref, seed=1)

    from pyramid_flow_tpu.models.flux.model import (
        FluxConfig, PyramidFluxTransformer)
    from pyramid_flow_tpu.pipeline.packing import pack_clips, unpatchify
    from pyramid_flow_tpu.utils.converters import convert_flux_dit

    variables = convert_flux_dit(_sd_numpy(ref))
    cfg = FluxConfig(
        in_channels=64, num_layers=2, num_single_layers=2,
        attention_head_dim=64, num_attention_heads=24,
        joint_attention_dim=512, pooled_projection_dim=96,
        axes_dims_rope=(16, 24, 24), use_temporal_causal=True)
    model = PyramidFluxTransformer(config=cfg)

    rng = np.random.default_rng(7)
    C = 16  # VAE channels; in_channels = patch^2 * C

    # stage layouts (low -> high), highest stage with AR history clips
    stage_clips = [
        [(1, C, 2, 4, 4)],                                  # stage 0: T=2
        [(1, C, 2, 8, 8)],                                  # stage 1
        [(1, C, 1, 4, 4), (1, C, 1, 8, 8), (1, C, 2, 16, 16)],  # stage 2 AR
    ]
    clips_np = [[rng.standard_normal(s).astype(np.float32) * 0.5
                 for s in stage] for stage in stage_clips]

    B, lt = 3, 6
    text = rng.standard_normal((B, lt, 512)).astype(np.float32)
    mask = np.ones((B, lt), np.int64)
    mask[:, 4:] = 0  # padded text tail
    pooled = rng.standard_normal((B, 96)).astype(np.float32)
    ts = np.asarray([999.0, 600.0, 25.0], np.float32)

    with torch.no_grad():
        # merge_input iterates each stage as a list of clips
        sample = [[torch.tensor(c) for c in stage] for stage in clips_np]
        ref_out = ref(
            sample=sample,
            encoder_hidden_states=torch.tensor(text),
            encoder_attention_mask=torch.tensor(mask),
            pooled_projections=torch.tensor(pooled),
            timestep_ratio=torch.tensor(ts),
        )

    for i_s, stage in enumerate(clips_np):
        # ours: channels-last clips, one batch row per (sample, stage)
        clips = [jnp.asarray(c.transpose(0, 2, 3, 4, 1)) for c in stage]
        tokens, pos, times, trainable = pack_clips(clips)
        out = model.apply(
            variables, tokens,
            jnp.broadcast_to(jnp.asarray(pos)[None], (1,) + pos.shape),
            jnp.broadcast_to(jnp.asarray(times)[None], (1,) + times.shape),
            jnp.asarray(text[i_s::3]), jnp.asarray(mask[i_s::3] > 0),
            jnp.asarray(pooled[i_s::3]), jnp.asarray(ts[i_s::3]))
        out = out[:, -trainable:]
        last = stage[-1]
        ours = unpatchify(out, last.shape[2], last.shape[3], last.shape[4])
        ours = np.asarray(ours).transpose(0, 4, 1, 2, 3)  # -> b c t h w
        ref_np = ref_out[i_s].numpy()
        np.testing.assert_allclose(
            ours, ref_np, atol=2e-3, rtol=2e-3,
            err_msg=f"flux stage {i_s} mismatch vs reference forward")


# ==================================================================== MMDiT
def test_mmdit_forward_matches_reference():
    """Reference PyramidDiffusionMMDiT (3 joint blocks incl. the
    context_pre_only tail, real 1536 width, sincos spatial + temporal RoPE,
    temporal-causal SDPA) vs ours through convert_mmdit."""
    m = load_reference_module(
        "pyramid_dit.mmdit_modules.modeling_pyramid_mmdit")
    torch.manual_seed(0)
    ref = m.PyramidDiffusionMMDiT(
        sample_size=32, patch_size=2, in_channels=16, num_layers=3,
        attention_head_dim=64, num_attention_heads=24,
        caption_projection_dim=1536, pooled_projection_dim=128,
        pos_embed_max_size=48, joint_attention_dim=512,
        pos_embed_type="sincos", temp_pos_embed_type="rope",
        use_flash_attn=False, use_temporal_causal=True,
        use_t5_mask=True, add_temp_pos_embed=True,
        interp_condition_pos=True).eval()
    _rerandomize_zeros(ref, seed=2)

    from pyramid_flow_tpu.models.mmdit.model import (
        MMDiTConfig, PyramidDiffusionMMDiT)
    from pyramid_flow_tpu.pipeline.packing import pack_clips, unpatchify
    from pyramid_flow_tpu.utils.converters import convert_mmdit

    variables = convert_mmdit(_sd_numpy(ref))
    cfg = MMDiTConfig(
        sample_size=32, in_channels=16, num_layers=3,
        attention_head_dim=64, num_attention_heads=24,
        caption_projection_dim=1536, pooled_projection_dim=128,
        joint_attention_dim=512, pos_embed_max_size=48,
        use_temporal_causal=True)
    model = PyramidDiffusionMMDiT(config=cfg)

    rng = np.random.default_rng(13)
    C = 16
    stage_clips = [
        [(1, C, 2, 8, 8)],
        [(1, C, 1, 8, 8), (1, C, 2, 16, 16)],  # AR history at half res
    ]
    clips_np = [[rng.standard_normal(s).astype(np.float32) * 0.5
                 for s in stage] for stage in stage_clips]

    B, lt = 2, 5
    text = rng.standard_normal((B, lt, 512)).astype(np.float32)
    mask = np.ones((B, lt), np.int64)
    mask[:, 4:] = 0
    pooled = rng.standard_normal((B, 128)).astype(np.float32)
    ts = np.asarray([800.0, 40.0], np.float32)

    with torch.no_grad():
        sample = [[torch.tensor(c) for c in stage] for stage in clips_np]
        ref_out = ref(
            sample=sample,
            encoder_hidden_states=torch.tensor(text),
            encoder_attention_mask=torch.tensor(mask),
            pooled_projections=torch.tensor(pooled),
            timestep_ratio=torch.tensor(ts),
        )

    num_stages = len(clips_np)
    g = cfg.pos_embed_max_size
    for i_s, stage in enumerate(clips_np):
        clips = [jnp.asarray(c.transpose(0, 2, 3, 4, 1)) for c in stage]
        tokens, pos, times, trainable = pack_clips(clips)
        last = stage[-1]
        # SD3 crop origin for the CURRENT clip's full-res grid
        top = (g - last.shape[3] // 2) // 2
        left = (g - last.shape[4] // 2) // 2
        offset = jnp.asarray([[top, left]], jnp.float32)
        out = model.apply(
            variables, tokens,
            jnp.broadcast_to(jnp.asarray(pos)[None], (1,) + pos.shape),
            jnp.broadcast_to(jnp.asarray(times)[None], (1,) + times.shape),
            jnp.asarray(text[i_s::num_stages]),
            jnp.asarray(mask[i_s::num_stages] > 0),
            jnp.asarray(pooled[i_s::num_stages]),
            jnp.asarray(ts[i_s::num_stages]), offset)
        out = out[:, -trainable:]
        ours = unpatchify(out, last.shape[2], last.shape[3], last.shape[4])
        ours = np.asarray(ours).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(
            ours, ref_out[i_s].numpy(), atol=2e-3, rtol=2e-3,
            err_msg=f"mmdit stage {i_s} mismatch vs reference forward")


# ====================================================================== VAE
def _build_ref_vae(m):
    torch.manual_seed(0)
    return m.CausalVideoVAE(
        encoder_in_channels=3, encoder_out_channels=8,
        encoder_layers_per_block=(1, 1, 1, 1),
        encoder_block_out_channels=(16, 32, 64, 64),
        encoder_spatial_down_sample=(True, True, True, False),
        encoder_temporal_down_sample=(True, True, True, False),
        encoder_norm_num_groups=8,
        decoder_in_channels=8, decoder_out_channels=3,
        decoder_layers_per_block=(2, 2, 2, 2),
        decoder_block_out_channels=(16, 32, 64, 64),
        decoder_spatial_up_sample=(True, True, True, False),
        decoder_temporal_up_sample=(True, True, True, False),
        decoder_norm_num_groups=8,
        sample_size=256,
    ).eval()


def _our_vae():
    from pyramid_flow_tpu.models.vae.model import CausalVideoVAE, VAEConfig
    cfg = VAEConfig(
        latent_channels=8, block_out_channels=(16, 32, 64, 64),
        encoder_layers_per_block=(1, 1, 1, 1),
        decoder_layers_per_block=(2, 2, 2, 2),
        num_groups=8)
    return CausalVideoVAE(config=cfg)


def test_vae_matches_reference():
    """Reference CausalVideoVAE (its own CausalConv3d / resnet / mid-block
    attention / samplers) vs ours through convert_vae: monolithic encode
    moments, decode pixels, and chunked streaming decode."""
    m = load_reference_module("video_vae.modeling_causal_vae")
    ref = _build_ref_vae(m)

    from pyramid_flow_tpu.models.vae.model import chunk_decode
    from pyramid_flow_tpu.utils.converters import convert_vae

    variables = convert_vae(_sd_numpy(ref))
    model = _our_vae()

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 3, 9, 32, 32)).astype(np.float32)

    with torch.no_grad():
        posterior = ref.encode(torch.tensor(x), return_dict=False)[0]
        moments_ref = posterior.parameters.numpy()  # [B, 2z, T', H', W']
        z = posterior.mode()
        dec_ref = ref.decode(z, is_init_image=True,
                             temporal_chunk=False).sample.numpy()
        dec_chunk_ref = ref.decode(z, is_init_image=True, temporal_chunk=True,
                                   window_size=2).sample.numpy()

    x_ours = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    moments = model.apply(variables, x_ours, method=model.encode)
    # ours returns [B,T',H',W',2z]; torch mean/logvar split is on channel
    np.testing.assert_allclose(
        np.asarray(moments).transpose(0, 4, 1, 2, 3), moments_ref,
        atol=2e-4, rtol=2e-4, err_msg="encoder moments mismatch")

    z_ours = jnp.asarray(z.numpy().transpose(0, 2, 3, 4, 1))
    dec = model.apply(variables, z_ours, method=model.decode)
    np.testing.assert_allclose(
        np.asarray(dec).transpose(0, 4, 1, 2, 3), dec_ref,
        atol=5e-4, rtol=5e-4, err_msg="decoder output mismatch")

    dec_chunk = chunk_decode(model, variables, z_ours, window_size=2)
    np.testing.assert_allclose(
        np.asarray(dec_chunk).transpose(0, 4, 1, 2, 3), dec_chunk_ref,
        atol=5e-4, rtol=5e-4, err_msg="chunked streaming decode mismatch")


def test_vae_chunk_encode_matches_reference():
    m = load_reference_module("video_vae.modeling_causal_vae")
    ref = _build_ref_vae(m)

    from pyramid_flow_tpu.models.vae.model import chunk_encode
    from pyramid_flow_tpu.utils.converters import convert_vae

    variables = convert_vae(_sd_numpy(ref))
    model = _our_vae()

    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 3, 17, 16, 16)).astype(np.float32)

    with torch.no_grad():
        moments_ref = ref.chunk_encode(torch.tensor(x), window_size=8).numpy()

    x_ours = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    moments = chunk_encode(model, variables, x_ours, window_size=8)
    np.testing.assert_allclose(
        np.asarray(moments).transpose(0, 4, 1, 2, 3), moments_ref,
        atol=2e-4, rtol=2e-4, err_msg="chunked streaming encode mismatch")


# ==================================================================== LPIPS
def test_lpips_matches_reference(monkeypatch, tmp_path):
    m = load_reference_module("video_vae.modeling_lpips")
    monkeypatch.setattr(m.LPIPS, "load_from_pretrained", lambda self: None)
    torch.manual_seed(0)
    ref = m.LPIPS().eval()

    from pyramid_flow_tpu.models.vae.lpips import LPIPS, convert_lpips

    variables = convert_lpips(_sd_numpy(ref))
    model = LPIPS()

    rng = np.random.default_rng(5)
    a = (rng.random((2, 3, 32, 32)).astype(np.float32) * 2 - 1)
    b = (rng.random((2, 3, 32, 32)).astype(np.float32) * 2 - 1)

    with torch.no_grad():
        ref_val = ref(torch.tensor(a), torch.tensor(b)).numpy().reshape(-1)

    ours = model.apply(
        variables, jnp.asarray(a.transpose(0, 2, 3, 1)),
        jnp.asarray(b.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours).reshape(-1), ref_val,
                               atol=1e-5, rtol=1e-4)
