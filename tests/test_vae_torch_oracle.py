"""VAE torch-oracle tests: causal conv layout, per-frame group norm, and the
depth-to-space upsampler channel orders (the riskiest conversion details)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pyramid_flow_tpu.models.vae.blocks import TemporalUpsample2x, Upsample2x
from pyramid_flow_tpu.models.vae.layers import CausalConv3d, GroupNorm


def _conv3d_tree(w, b):
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0)),
            "bias": b}


def test_causal_conv_matches_torch():
    """front-padded torch Conv3d == CausalConv3d (NDHWC vs NCDHW)."""
    rng = np.random.default_rng(0)
    cin, cout, kt = 3, 5, 3
    w = rng.standard_normal((cout, cin, kt, 3, 3)).astype(np.float32) * 0.1
    b = rng.standard_normal(cout).astype(np.float32)
    x = rng.standard_normal((2, cin, 7, 8, 8)).astype(np.float32)  # NCDHW

    conv = torch.nn.Conv3d(cin, cout, (kt, 3, 3), stride=(2, 1, 1), padding=0)
    conv.weight.data = torch.tensor(w)
    conv.bias.data = torch.tensor(b)
    xp = torch.nn.functional.pad(torch.tensor(x), (1, 1, 1, 1, kt - 1, 0))
    with torch.no_grad():
        ref = conv(xp).numpy()

    model = CausalConv3d(cout, (kt, 3, 3), stride=(2, 1, 1))
    x_ndhwc = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    out = model.apply({"params": _conv3d_tree(w, b)}, x_ndhwc)
    out_ncdhw = np.asarray(out).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out_ncdhw, ref, atol=2e-5, rtol=1e-4)


def test_group_norm_per_frame_matches_torch():
    """CausalGroupNorm == torch GroupNorm over (b t) c h w."""
    rng = np.random.default_rng(1)
    c, g = 8, 4
    scale = rng.standard_normal(c).astype(np.float32)
    bias = rng.standard_normal(c).astype(np.float32)
    x = rng.standard_normal((2, 3, 4, 4, c)).astype(np.float32)

    gn = torch.nn.GroupNorm(g, c, eps=1e-6)
    gn.weight.data = torch.tensor(scale)
    gn.bias.data = torch.tensor(bias)
    xt = torch.tensor(x.transpose(0, 1, 4, 2, 3)).reshape(6, c, 4, 4)
    with torch.no_grad():
        ref = gn(xt).reshape(2, 3, c, 4, 4).numpy().transpose(0, 1, 3, 4, 2)

    out = GroupNorm(num_groups=g).apply(
        {"params": {"scale": scale, "bias": bias}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)


def test_spatial_upsample_channel_order():
    """'b (c p1 p2) t h w -> b c t (h p1) (w p2)' (modeling_resnet.py:616)."""
    rng = np.random.default_rng(2)
    cin, cout = 4, 2
    w = rng.standard_normal((cout * 4, cin, 3, 3, 3)).astype(np.float32) * 0.1
    b = rng.standard_normal(cout * 4).astype(np.float32)
    x = rng.standard_normal((1, cin, 2, 3, 3)).astype(np.float32)

    conv = torch.nn.Conv3d(cin, cout * 4, 3, padding=0)
    conv.weight.data = torch.tensor(w)
    conv.bias.data = torch.tensor(b)
    xp = torch.nn.functional.pad(torch.tensor(x), (1, 1, 1, 1, 2, 0))
    with torch.no_grad():
        y = conv(xp)  # [1, 4*cout, t, h, w]
    B, _, t, h, wd = y.shape
    ref = (y.view(B, cout, 2, 2, t, h, wd)
            .permute(0, 1, 4, 5, 2, 6, 3)
            .reshape(B, cout, t, h * 2, wd * 2).numpy())

    model = Upsample2x(cout)
    x_ndhwc = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    out = model.apply({"params": {"conv": _conv3d_tree(w, b)}}, x_ndhwc)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("is_init", [True, False])
def test_temporal_upsample_channel_order(is_init):
    """'b (c p) t h w -> b c (t p) h w' + first-frame drop on init
    (modeling_resnet.py:724-728)."""
    rng = np.random.default_rng(3)
    cin, cout = 4, 2
    w = rng.standard_normal((cout * 2, cin, 3, 3, 3)).astype(np.float32) * 0.1
    b = rng.standard_normal(cout * 2).astype(np.float32)
    x = rng.standard_normal((1, cin, 3, 2, 2)).astype(np.float32)

    conv = torch.nn.Conv3d(cin, cout * 2, 3, padding=0)
    conv.weight.data = torch.tensor(w)
    conv.bias.data = torch.tensor(b)
    xp = torch.nn.functional.pad(torch.tensor(x), (1, 1, 1, 1, 2, 0))
    with torch.no_grad():
        y = conv(xp)
    B, _, t, h, wd = y.shape
    ref = (y.view(B, cout, 2, t, h, wd)
            .permute(0, 1, 3, 2, 4, 5)
            .reshape(B, cout, t * 2, h, wd))
    if is_init:
        ref = ref[:, :, 1:]
    ref = ref.numpy()

    model = TemporalUpsample2x(cout)
    x_ndhwc = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    variables = {"params": {"conv": _conv3d_tree(w, b)}}
    if is_init:
        out = model.apply(variables, x_ndhwc, is_init=True)
    else:
        # continuation chunk needs the streaming cache; run init first
        out, mut = model.apply(variables, x_ndhwc, is_init=True,
                               temporal_chunk=True, mutable=["cache"])
        out = model.apply({**variables, **mut}, x_ndhwc, is_init=False,
                          temporal_chunk=True, mutable=["cache"])[0]
        # compare only the depth-to-space order (no drop): conv inputs now
        # include cache frames, so just check shape/finite
        assert out.shape == (1, 6, 2, 2, cout)
        return
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, atol=2e-5, rtol=1e-4)
