"""Cross-framework oracle tests: independent torch implementations of the
highest-risk parity math (RoPE conventions, AdaLN-zero, the full dual-stream
block, sinusoidal timestep embedding), written directly from the reference
formulas, compared against the flax implementations after weight conversion.

These catch exactly the "dozens of easy-to-silently-get-wrong details"
(SURVEY.md §7.3 #3) without needing the released checkpoints.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pyramid_flow_tpu.models.flux.blocks import FluxTransformerBlock
from pyramid_flow_tpu.models.flux.model import timestep_sinusoidal
from pyramid_flow_tpu.ops.rope import apply_rope, rope_freqs
from pyramid_flow_tpu.utils.converters import convert_flux_dit


# ---------------------------------------------------------------- torch side
def torch_rope_table(pos, dim, theta=10000.0):
    """Reference rope(): [b, n, dim/2, 2, 2] rotation matrices
    (modeling_pyramid_flux.py:28-41 formula, re-derived)."""
    scale = torch.arange(0, dim, 2, dtype=torch.float64) / dim
    omega = 1.0 / theta ** scale
    out = torch.einsum("bn,d->bnd", pos.double(), omega)
    cos, sin = torch.cos(out), torch.sin(out)
    mat = torch.stack([cos, -sin, sin, cos], dim=-1)
    return mat.view(pos.shape[0], -1, dim // 2, 2, 2).float()


def torch_multiaxis_rope(positions, axes_dim):
    """EmbedND: concat per-axis tables along the pair dim, + head axis."""
    tables = [
        torch_rope_table(positions[..., i], d) for i, d in enumerate(axes_dim)
    ]
    return torch.cat(tables, dim=-3).unsqueeze(2)  # [b, n, 1, D/2, 2, 2]


def torch_apply_rope(x, freqs):
    """Reference apply_rope (modeling_flux_block.py:34-39): interleaved pairs,
    fp32 math. x: [b, n, h, d]."""
    xf = x.float().reshape(*x.shape[:-1], -1, 1, 2)
    out = freqs[..., 0] * xf[..., 0] + freqs[..., 1] * xf[..., 1]
    return out.reshape(*x.shape).to(x.dtype)


def test_rope_convention_matches_reference_formula():
    b, n = 2, 6
    axes = (4, 2, 2)
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 10, (b, n, 3)).astype(np.float32)
    x = rng.standard_normal((b, 3, n, 8)).astype(np.float32)  # [b, h, n, d]

    # torch reference path
    freqs = torch_multiaxis_rope(torch.tensor(pos), list(axes))
    xt = torch.tensor(x).permute(0, 2, 1, 3)  # [b, n, h, d]
    ref = torch_apply_rope(xt, freqs).permute(0, 2, 1, 3).numpy()

    # flax path
    cos, sin = rope_freqs(jnp.asarray(pos), axes)
    mine = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(mine, ref, atol=1e-5, rtol=1e-5)


def test_timestep_embedding_matches_reference_formula():
    """flip_sin_to_cos=True, downscale_freq_shift=0 (modeling_embedding.py:11-62)."""
    t = np.asarray([0.0, 1.0, 500.0, 999.0], np.float32)
    half = 128
    exponent = -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
    emb = torch.exp(exponent)
    arg = torch.tensor(t)[:, None] * emb[None]
    ref = torch.cat([torch.sin(arg), torch.cos(arg)], dim=-1)
    ref = torch.cat([ref[:, half:], ref[:, :half]], dim=-1).numpy()  # flip
    mine = np.asarray(timestep_sinusoidal(jnp.asarray(t), 256))
    np.testing.assert_allclose(mine, ref, atol=1e-4)  # fp32 trig rounding


# ------------------------------------------------- full dual-stream block
class TorchFluxBlock(torch.nn.Module):
    """Independent torch implementation of the reference FluxTransformerBlock
    (modeling_flux_block.py:945-1044 + normalization/attention semantics)."""

    def __init__(self, dim, heads, head_dim):
        super().__init__()
        self.heads, self.head_dim = heads, head_dim
        LN = lambda: torch.nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.norm1_linear = torch.nn.Linear(dim, 6 * dim)
        self.norm1_ctx_linear = torch.nn.Linear(dim, 6 * dim)
        self.ln = LN()
        self.ln_ctx = LN()
        self.norm2 = LN()
        self.norm2_ctx = LN()
        mk = lambda: torch.nn.Linear(dim, dim, bias=True)
        self.to_q, self.to_k, self.to_v, self.to_out = mk(), mk(), mk(), mk()
        self.add_q, self.add_k, self.add_v, self.to_add_out = mk(), mk(), mk(), mk()
        self.rms_q = torch.nn.Parameter(torch.ones(head_dim))
        self.rms_k = torch.nn.Parameter(torch.ones(head_dim))
        self.rms_aq = torch.nn.Parameter(torch.ones(head_dim))
        self.rms_ak = torch.nn.Parameter(torch.ones(head_dim))
        self.ff_in = torch.nn.Linear(dim, 4 * dim)
        self.ff_out = torch.nn.Linear(4 * dim, dim)
        self.ffc_in = torch.nn.Linear(dim, 4 * dim)
        self.ffc_out = torch.nn.Linear(4 * dim, dim)

    @staticmethod
    def _rms(x, w, eps=1e-6):
        v = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(v + eps) * w).to(x.dtype)

    def forward(self, x, ctx, temb, freqs, tmask):
        def mod6(linear, h):
            e = linear(torch.nn.functional.silu(temb))
            return e.chunk(6, dim=1)

        sh, sc, g, sh2, sc2, g2 = mod6(self.norm1_linear, x)
        csh, csc, cg, csh2, csc2, cg2 = mod6(self.norm1_ctx_linear, ctx)
        nx = self.ln(x) * (1 + sc[:, None]) + sh[:, None]
        nc = self.ln_ctx(ctx) * (1 + csc[:, None]) + csh[:, None]

        B, Lc = ctx.shape[:2]
        hview = lambda t: t.view(B, -1, self.heads, self.head_dim)
        q = self._rms(hview(self.to_q(nx)), self.rms_q)
        k = self._rms(hview(self.to_k(nx)), self.rms_k)
        v = hview(self.to_v(nx))
        cq = self._rms(hview(self.add_q(nc)), self.rms_aq)
        ck = self._rms(hview(self.add_k(nc)), self.rms_ak)
        cv = hview(self.add_v(nc))

        # text-first concat + rope + temporal-causal SDPA
        q = torch.cat([cq, q], dim=1)
        k = torch.cat([ck, k], dim=1)
        v = torch.cat([cv, v], dim=1)
        q = torch_apply_rope(q, freqs)
        k = torch_apply_rope(k, freqs)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        attn_mask = tmask[:, None]  # [B, 1, L, L]
        o = torch.nn.functional.scaled_dot_product_attention(
            q, k, v, attn_mask=attn_mask)
        o = o.transpose(1, 2).flatten(2)
        ctx_o, x_o = o[:, :Lc], o[:, Lc:]
        x_o = self.to_out(x_o)
        ctx_o = self.to_add_out(ctx_o)

        x = x + g[:, None] * x_o
        h = self.norm2(x) * (1 + sc2[:, None]) + sh2[:, None]
        x = x + g2[:, None] * self.ff_out(
            torch.nn.functional.gelu(self.ff_in(h), approximate="tanh"))

        ctx = ctx + cg[:, None] * ctx_o
        hc = self.norm2_ctx(ctx) * (1 + csc2[:, None]) + csh2[:, None]
        ctx = ctx + cg2[:, None] * self.ffc_out(
            torch.nn.functional.gelu(self.ffc_in(hc), approximate="tanh"))
        return x, ctx


def test_dual_stream_block_matches_torch_oracle():
    dim, heads, head_dim = 32, 4, 8
    B, Lc, Lx = 2, 3, 10
    tb = TorchFluxBlock(dim, heads, head_dim).eval()
    for p in tb.parameters():
        p.data = torch.randn_like(p) * 0.1

    # build the torch state dict in the reference's key layout, convert
    sd = {
        "transformer_blocks.0.norm1.linear.weight": tb.norm1_linear.weight,
        "transformer_blocks.0.norm1.linear.bias": tb.norm1_linear.bias,
        "transformer_blocks.0.norm1_context.linear.weight": tb.norm1_ctx_linear.weight,
        "transformer_blocks.0.norm1_context.linear.bias": tb.norm1_ctx_linear.bias,
        "transformer_blocks.0.attn.to_q.weight": tb.to_q.weight,
        "transformer_blocks.0.attn.to_q.bias": tb.to_q.bias,
        "transformer_blocks.0.attn.to_k.weight": tb.to_k.weight,
        "transformer_blocks.0.attn.to_k.bias": tb.to_k.bias,
        "transformer_blocks.0.attn.to_v.weight": tb.to_v.weight,
        "transformer_blocks.0.attn.to_v.bias": tb.to_v.bias,
        "transformer_blocks.0.attn.add_q_proj.weight": tb.add_q.weight,
        "transformer_blocks.0.attn.add_q_proj.bias": tb.add_q.bias,
        "transformer_blocks.0.attn.add_k_proj.weight": tb.add_k.weight,
        "transformer_blocks.0.attn.add_k_proj.bias": tb.add_k.bias,
        "transformer_blocks.0.attn.add_v_proj.weight": tb.add_v.weight,
        "transformer_blocks.0.attn.add_v_proj.bias": tb.add_v.bias,
        "transformer_blocks.0.attn.to_out.0.weight": tb.to_out.weight,
        "transformer_blocks.0.attn.to_out.0.bias": tb.to_out.bias,
        "transformer_blocks.0.attn.to_add_out.weight": tb.to_add_out.weight,
        "transformer_blocks.0.attn.to_add_out.bias": tb.to_add_out.bias,
        "transformer_blocks.0.attn.norm_q.weight": tb.rms_q,
        "transformer_blocks.0.attn.norm_k.weight": tb.rms_k,
        "transformer_blocks.0.attn.norm_added_q.weight": tb.rms_aq,
        "transformer_blocks.0.attn.norm_added_k.weight": tb.rms_ak,
        "transformer_blocks.0.ff.net.0.proj.weight": tb.ff_in.weight,
        "transformer_blocks.0.ff.net.0.proj.bias": tb.ff_in.bias,
        "transformer_blocks.0.ff.net.2.weight": tb.ff_out.weight,
        "transformer_blocks.0.ff.net.2.bias": tb.ff_out.bias,
        "transformer_blocks.0.ff_context.net.0.proj.weight": tb.ffc_in.weight,
        "transformer_blocks.0.ff_context.net.0.proj.bias": tb.ffc_in.bias,
        "transformer_blocks.0.ff_context.net.2.weight": tb.ffc_out.weight,
        "transformer_blocks.0.ff_context.net.2.bias": tb.ffc_out.bias,
        # required scaffolding keys for the converter
        "time_text_embed.timestep_embedder.linear_1.weight": torch.zeros(8, 256),
        "time_text_embed.timestep_embedder.linear_1.bias": torch.zeros(8),
        "time_text_embed.timestep_embedder.linear_2.weight": torch.zeros(8, 8),
        "time_text_embed.timestep_embedder.linear_2.bias": torch.zeros(8),
        "time_text_embed.text_embedder.linear_1.weight": torch.zeros(8, 8),
        "time_text_embed.text_embedder.linear_1.bias": torch.zeros(8),
        "time_text_embed.text_embedder.linear_2.weight": torch.zeros(8, 8),
        "time_text_embed.text_embedder.linear_2.bias": torch.zeros(8),
        "context_embedder.weight": torch.zeros(8, 8),
        "context_embedder.bias": torch.zeros(8),
        "x_embedder.weight": torch.zeros(8, 8),
        "x_embedder.bias": torch.zeros(8),
        "single_transformer_blocks.0.norm.linear.weight": torch.zeros(3 * 8, 8),
        "single_transformer_blocks.0.norm.linear.bias": torch.zeros(3 * 8),
        "single_transformer_blocks.0.attn.to_q.weight": torch.zeros(8, 8),
        "single_transformer_blocks.0.attn.to_q.bias": torch.zeros(8),
        "single_transformer_blocks.0.attn.to_k.weight": torch.zeros(8, 8),
        "single_transformer_blocks.0.attn.to_k.bias": torch.zeros(8),
        "single_transformer_blocks.0.attn.to_v.weight": torch.zeros(8, 8),
        "single_transformer_blocks.0.attn.to_v.bias": torch.zeros(8),
        "single_transformer_blocks.0.attn.norm_q.weight": torch.zeros(8),
        "single_transformer_blocks.0.attn.norm_k.weight": torch.zeros(8),
        "single_transformer_blocks.0.proj_mlp.weight": torch.zeros(8, 8),
        "single_transformer_blocks.0.proj_mlp.bias": torch.zeros(8),
        "single_transformer_blocks.0.proj_out.weight": torch.zeros(8, 8),
        "single_transformer_blocks.0.proj_out.bias": torch.zeros(8),
        "norm_out.linear.weight": torch.zeros(2 * 8, 8),
        "norm_out.linear.bias": torch.zeros(2 * 8),
        "proj_out.weight": torch.zeros(8, 8),
        "proj_out.bias": torch.zeros(8),
    }
    sd_np = {k: v.detach().float().numpy() for k, v in sd.items()}
    stacked = convert_flux_dit(sd_np)["params"]["transformer_blocks"]
    tree = jax.tree.map(lambda x: x[0], stacked)  # layer 0 of the scan stack

    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, Lx, dim)).astype(np.float32)
    ctx = rng.standard_normal((B, Lc, dim)).astype(np.float32)
    temb = rng.standard_normal((B, dim)).astype(np.float32)
    pos = np.zeros((B, Lc + Lx, 3), np.float32)
    times = np.zeros((B, Lc + Lx), np.int32)
    times[:, Lc:] = np.repeat(np.arange(2), Lx // 2)[None]
    pos[..., 0] = times

    # torch forward
    freqs = torch_multiaxis_rope(torch.tensor(pos), [4, 2, 2])
    t_t = torch.tensor(times)
    tmask = (t_t[:, None, :] <= t_t[:, :, None])  # t_k <= t_q
    with torch.no_grad():
        ref_x, ref_ctx = tb(torch.tensor(x), torch.tensor(ctx),
                            torch.tensor(temb), freqs, tmask)

    # flax forward
    blk = FluxTransformerBlock(num_heads=heads, head_dim=head_dim, causal=True)
    cos, sin = rope_freqs(jnp.asarray(pos), (4, 2, 2))
    out_x, out_ctx = blk.apply(
        {"params": tree}, jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(temb),
        cos, sin, jnp.asarray(times))

    np.testing.assert_allclose(np.asarray(out_x), ref_x.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_ctx), ref_ctx.numpy(),
                               atol=2e-4, rtol=1e-3)


class TorchFluxSingleBlock(torch.nn.Module):
    """Independent torch impl of FluxSingleTransformerBlock
    (modeling_flux_block.py:877-942): parallel attn+MLP, fused out proj over
    [attn, mlp] concat, single gate."""

    def __init__(self, dim, heads, head_dim):
        super().__init__()
        self.heads, self.head_dim = heads, head_dim
        self.norm_linear = torch.nn.Linear(dim, 3 * dim)
        self.ln = torch.nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        mk = lambda o=dim: torch.nn.Linear(dim, o, bias=True)
        self.to_q, self.to_k, self.to_v = mk(), mk(), mk()
        self.rms_q = torch.nn.Parameter(torch.ones(head_dim))
        self.rms_k = torch.nn.Parameter(torch.ones(head_dim))
        self.proj_mlp = mk(4 * dim)
        self.proj_out = torch.nn.Linear(5 * dim, dim)

    def forward(self, x, temb, freqs, tmask):
        e = self.norm_linear(torch.nn.functional.silu(temb))
        sh, sc, g = e.chunk(3, dim=1)
        nx = self.ln(x) * (1 + sc[:, None]) + sh[:, None]
        mlp = torch.nn.functional.gelu(self.proj_mlp(nx), approximate="tanh")

        B = x.shape[0]
        hview = lambda t: t.view(B, -1, self.heads, self.head_dim)
        q = TorchFluxBlock._rms(hview(self.to_q(nx)), self.rms_q)
        k = TorchFluxBlock._rms(hview(self.to_k(nx)), self.rms_k)
        v = hview(self.to_v(nx))
        q = torch_apply_rope(q, freqs)
        k = torch_apply_rope(k, freqs)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        o = torch.nn.functional.scaled_dot_product_attention(
            q, k, v, attn_mask=tmask[:, None])
        attn = o.transpose(1, 2).flatten(2)
        return x + g[:, None] * self.proj_out(torch.cat([attn, mlp], dim=2))


def test_single_stream_block_matches_torch_oracle():
    from pyramid_flow_tpu.models.flux.blocks import FluxSingleTransformerBlock

    dim, heads, head_dim = 32, 4, 8
    B, L = 2, 12
    tb = TorchFluxSingleBlock(dim, heads, head_dim).eval()
    for p in tb.parameters():
        p.data = torch.randn_like(p) * 0.1

    sd = {}
    pre = "single_transformer_blocks.0"
    pairs = {
        f"{pre}.norm.linear": tb.norm_linear,
        f"{pre}.attn.to_q": tb.to_q, f"{pre}.attn.to_k": tb.to_k,
        f"{pre}.attn.to_v": tb.to_v, f"{pre}.proj_mlp": tb.proj_mlp,
        f"{pre}.proj_out": tb.proj_out,
    }
    for k_, mod in pairs.items():
        sd[f"{k_}.weight"] = mod.weight.detach().float().numpy()
        sd[f"{k_}.bias"] = mod.bias.detach().float().numpy()
    sd[f"{pre}.attn.norm_q.weight"] = tb.rms_q.detach().numpy()
    sd[f"{pre}.attn.norm_k.weight"] = tb.rms_k.detach().numpy()

    # minimal converter-compatible tree (bypass full convert: build directly)
    from pyramid_flow_tpu.utils.converters import _lin, _set
    tree = {}
    _lin(sd, tree, f"{pre}.norm.linear", "norm/linear")
    for n in ("to_q", "to_k", "to_v"):
        _lin(sd, tree, f"{pre}.attn.{n}", f"attn/{n}")
    _set(tree, "attn/norm_q/scale", sd[f"{pre}.attn.norm_q.weight"])
    _set(tree, "attn/norm_k/scale", sd[f"{pre}.attn.norm_k.weight"])
    _lin(sd, tree, f"{pre}.proj_mlp", "proj_mlp")
    _lin(sd, tree, f"{pre}.proj_out", "proj_out")

    rng = np.random.default_rng(2)
    x = rng.standard_normal((B, L, dim)).astype(np.float32)
    temb = rng.standard_normal((B, dim)).astype(np.float32)
    times = np.zeros((B, L), np.int32)
    times[:, L // 2:] = 1
    pos = np.zeros((B, L, 3), np.float32)
    pos[..., 0] = times

    freqs = torch_multiaxis_rope(torch.tensor(pos), [4, 2, 2])
    t_t = torch.tensor(times)
    tmask = t_t[:, None, :] <= t_t[:, :, None]
    with torch.no_grad():
        ref = tb(torch.tensor(x), torch.tensor(temb), freqs, tmask).numpy()

    blk = FluxSingleTransformerBlock(num_heads=heads, head_dim=head_dim,
                                     causal=True)
    cos, sin = rope_freqs(jnp.asarray(pos), (4, 2, 2))
    out = blk.apply({"params": tree}, jnp.asarray(x), jnp.asarray(temb),
                    cos, sin, jnp.asarray(times))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_adaln_continuous_scale_shift_order():
    """norm_out: chunk order is (scale, shift) — reference
    modeling_normalization.py:128."""
    from pyramid_flow_tpu.models.flux.blocks import AdaLayerNormContinuous

    dim = 16
    rng = np.random.default_rng(3)
    w = rng.standard_normal((2 * dim, dim)).astype(np.float32) * 0.1
    bias = rng.standard_normal(2 * dim).astype(np.float32) * 0.1
    x = rng.standard_normal((2, 5, dim)).astype(np.float32)
    temb = rng.standard_normal((2, dim)).astype(np.float32)

    e = torch.nn.functional.linear(
        torch.nn.functional.silu(torch.tensor(temb)),
        torch.tensor(w), torch.tensor(bias))
    scale, shift = e.chunk(2, dim=1)
    ln = torch.nn.functional.layer_norm(torch.tensor(x), (dim,), eps=1e-6)
    ref = (ln * (1 + scale[:, None]) + shift[:, None]).numpy()

    tree = {"linear": {"kernel": w.T, "bias": bias}}
    out = AdaLayerNormContinuous().apply(
        {"params": tree}, jnp.asarray(x), jnp.asarray(temb))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)


class TorchFluxModel(torch.nn.Module):
    """Independent torch implementation of the FULL PyramidFluxTransformer
    forward (reference `modeling_pyramid_flux.py:392-542` semantics on the
    packed-token interface), state-dict keyed exactly like the released
    checkpoint so the whole ``convert_flux_dit`` path is exercised."""

    def __init__(self, dim, heads, head_dim, in_ch, joint_dim, pooled_dim,
                 n_dual, n_single):
        super().__init__()
        self.dim = dim

        class _TT(torch.nn.Module):
            def __init__(self):
                super().__init__()

                class _MLP(torch.nn.Module):
                    def __init__(self, i):
                        super().__init__()
                        self.linear_1 = torch.nn.Linear(i, dim)
                        self.linear_2 = torch.nn.Linear(dim, dim)

                    def forward(self, x):
                        return self.linear_2(
                            torch.nn.functional.silu(self.linear_1(x)))

                self.timestep_embedder = _MLP(256)
                self.text_embedder = _MLP(pooled_dim)

        self.time_text_embed = _TT()
        self.context_embedder = torch.nn.Linear(joint_dim, dim)
        self.x_embedder = torch.nn.Linear(in_ch, dim)
        self.transformer_blocks = torch.nn.ModuleList(
            [TorchFluxBlock(dim, heads, head_dim) for _ in range(n_dual)])
        self.single_transformer_blocks = torch.nn.ModuleList(
            [TorchFluxSingleBlock(dim, heads, head_dim) for _ in range(n_single)])
        self.norm_out_linear = torch.nn.Linear(dim, 2 * dim)
        self.proj_out = torch.nn.Linear(dim, in_ch)

    def forward(self, tokens, pos, times, text, pooled, t, axes):
        half = 128
        exponent = -np.log(10000.0) * np.arange(half, dtype=np.float32) / half
        freqs_t = torch.tensor(np.exp(exponent).astype(np.float32))
        arg = t.float()[:, None] * freqs_t[None]
        sin_emb = torch.cat([torch.cos(arg), torch.sin(arg)], dim=-1)
        temb = (self.time_text_embed.timestep_embedder(sin_emb)
                + self.time_text_embed.text_embedder(pooled))

        ctx = self.context_embedder(text)
        x = self.x_embedder(tokens)

        lt = text.shape[1]
        full_pos = torch.cat(
            [torch.zeros(pos.shape[0], lt, 3), pos.float()], dim=1)
        freqs = torch_multiaxis_rope(full_pos, axes)
        full_t = torch.cat(
            [torch.zeros(times.shape[0], lt, dtype=times.dtype), times], dim=1)
        tmask = full_t[:, None, :] <= full_t[:, :, None]

        for blk in self.transformer_blocks:
            x, ctx = blk(x, ctx, temb, freqs, tmask)
        h = torch.cat([ctx, x], dim=1)
        for blk in self.single_transformer_blocks:
            h = blk(h, temb, freqs, tmask)
        x = h[:, lt:]
        e = self.norm_out_linear(torch.nn.functional.silu(temb))
        scale, shift = e.chunk(2, dim=1)
        x = torch.nn.functional.layer_norm(x, (self.dim,), eps=1e-6)
        x = x * (1 + scale[:, None]) + shift[:, None]
        return self.proj_out(x)

    def reference_state_dict(self):
        """Rename to the released checkpoint's key layout."""
        ren = {
            "norm_out_linear.": "norm_out.linear.",
        }
        for i, blk in enumerate(self.transformer_blocks):
            p = f"transformer_blocks.{i}."
            ren.update({
                f"{p}norm1_linear.": f"{p}norm1.linear.",
                f"{p}norm1_ctx_linear.": f"{p}norm1_context.linear.",
                f"{p}to_q.": f"{p}attn.to_q.", f"{p}to_k.": f"{p}attn.to_k.",
                f"{p}to_v.": f"{p}attn.to_v.",
                f"{p}to_out.": f"{p}attn.to_out.0.",
                f"{p}add_q.": f"{p}attn.add_q_proj.",
                f"{p}add_k.": f"{p}attn.add_k_proj.",
                f"{p}add_v.": f"{p}attn.add_v_proj.",
                f"{p}to_add_out.": f"{p}attn.to_add_out.",
                f"{p}rms_q": f"{p}attn.norm_q.weight",
                f"{p}rms_k": f"{p}attn.norm_k.weight",
                f"{p}rms_aq": f"{p}attn.norm_added_q.weight",
                f"{p}rms_ak": f"{p}attn.norm_added_k.weight",
                f"{p}ff_in.": f"{p}ff.net.0.proj.",
                f"{p}ff_out.": f"{p}ff.net.2.",
                f"{p}ffc_in.": f"{p}ff_context.net.0.proj.",
                f"{p}ffc_out.": f"{p}ff_context.net.2.",
            })
        for i, blk in enumerate(self.single_transformer_blocks):
            p = f"single_transformer_blocks.{i}."
            ren.update({
                f"{p}norm_linear.": f"{p}norm.linear.",
                f"{p}to_q.": f"{p}attn.to_q.", f"{p}to_k.": f"{p}attn.to_k.",
                f"{p}to_v.": f"{p}attn.to_v.",
                f"{p}rms_q": f"{p}attn.norm_q.weight",
                f"{p}rms_k": f"{p}attn.norm_k.weight",
            })
        out = {}
        for k, v in self.state_dict().items():
            for old, new in sorted(ren.items(), key=lambda kv: -len(kv[0])):
                if k.startswith(old):
                    k = new + k[len(old):]
                    break
            out[k] = v.detach().float().numpy()
        return out


@pytest.mark.slow
def test_full_flux_model_matches_torch_oracle():
    """End-to-end: torch reference-formula model -> reference-layout state
    dict -> convert_flux_dit -> scanned flax model; activations must agree.
    This exercises the whole converter (stacked scan layout included)."""
    from pyramid_flow_tpu.models.flux.model import (
        FluxConfig, PyramidFluxTransformer)

    dim, heads, head_dim, in_ch = 32, 4, 8, 8
    joint_dim, pooled_dim = 16, 12
    cfg = FluxConfig(
        in_channels=in_ch, num_layers=2, num_single_layers=3,
        attention_head_dim=head_dim, num_attention_heads=heads,
        joint_attention_dim=joint_dim, pooled_projection_dim=pooled_dim,
        axes_dims_rope=(4, 2, 2))
    tm = TorchFluxModel(dim, heads, head_dim, in_ch, joint_dim, pooled_dim,
                        2, 3).eval()
    for p in tm.parameters():
        p.data = torch.randn_like(p) * 0.1

    from pyramid_flow_tpu.utils.converters import convert_flux_dit
    variables = convert_flux_dit(tm.reference_state_dict())

    B, L, lt = 2, 12, 5
    rng = np.random.default_rng(7)
    tokens = rng.standard_normal((B, L, in_ch)).astype(np.float32)
    times = np.repeat(np.arange(3), L // 3)[None].repeat(B, 0).astype(np.int32)
    pos = np.zeros((B, L, 3), np.float32)
    pos[..., 0] = times
    pos[..., 1] = rng.integers(0, 4, (B, L))
    pos[..., 2] = rng.integers(0, 4, (B, L))
    text = rng.standard_normal((B, lt, joint_dim)).astype(np.float32)
    pooled = rng.standard_normal((B, pooled_dim)).astype(np.float32)
    ts = np.asarray([500.0, 25.0], np.float32)

    with torch.no_grad():
        ref = tm(torch.tensor(tokens), torch.tensor(pos), torch.tensor(times),
                 torch.tensor(text), torch.tensor(pooled), torch.tensor(ts),
                 [4, 2, 2]).numpy()

    model = PyramidFluxTransformer(config=cfg)
    out = model.apply(
        variables, jnp.asarray(tokens), jnp.asarray(pos), jnp.asarray(times),
        jnp.asarray(text), jnp.ones((B, lt), bool), jnp.asarray(pooled),
        jnp.asarray(ts))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=2e-3)


class TorchJointBlock(torch.nn.Module):
    """Independent torch impl of the SD3 JointTransformerBlock
    (modeling_mmdit_block.py:396-669), incl. the context_pre_only tail."""

    def __init__(self, dim, heads, head_dim, context_pre_only=False):
        super().__init__()
        self.heads, self.head_dim = heads, head_dim
        self.pre_only = context_pre_only
        LN = lambda: torch.nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.norm1_linear = torch.nn.Linear(dim, 6 * dim)
        self.norm1_ctx_linear = torch.nn.Linear(
            dim, 2 * dim if context_pre_only else 6 * dim)
        self.ln, self.ln_ctx, self.norm2, self.norm2_ctx = LN(), LN(), LN(), LN()
        mk = lambda: torch.nn.Linear(dim, dim, bias=True)
        self.to_q, self.to_k, self.to_v, self.to_out = mk(), mk(), mk(), mk()
        self.add_q, self.add_k, self.add_v = mk(), mk(), mk()
        if not context_pre_only:
            self.to_add_out = mk()
        self.rms_q = torch.nn.Parameter(torch.ones(head_dim))
        self.rms_k = torch.nn.Parameter(torch.ones(head_dim))
        self.rms_aq = torch.nn.Parameter(torch.ones(head_dim))
        self.rms_ak = torch.nn.Parameter(torch.ones(head_dim))
        self.ff_in = torch.nn.Linear(dim, 4 * dim)
        self.ff_out = torch.nn.Linear(4 * dim, dim)
        if not context_pre_only:
            self.ffc_in = torch.nn.Linear(dim, 4 * dim)
            self.ffc_out = torch.nn.Linear(4 * dim, dim)

    def forward(self, x, ctx, temb, freqs, tmask):
        silu = torch.nn.functional.silu
        e = self.norm1_linear(silu(temb))
        sh, sc, g, sh2, sc2, g2 = e.chunk(6, dim=1)
        nx = self.ln(x) * (1 + sc[:, None]) + sh[:, None]
        ec = self.norm1_ctx_linear(silu(temb))
        if self.pre_only:
            csc, csh = ec.chunk(2, dim=1)  # SCALE first (AdaLN-continuous)
            nc = self.ln_ctx(ctx) * (1 + csc[:, None]) + csh[:, None]
        else:
            csh, csc, cg, csh2, csc2, cg2 = ec.chunk(6, dim=1)
            nc = self.ln_ctx(ctx) * (1 + csc[:, None]) + csh[:, None]

        B, Lc = ctx.shape[:2]
        hview = lambda t: t.view(B, -1, self.heads, self.head_dim)
        rms = TorchFluxBlock._rms
        q = rms(hview(self.to_q(nx)), self.rms_q)
        k = rms(hview(self.to_k(nx)), self.rms_k)
        v = hview(self.to_v(nx))
        cq = rms(hview(self.add_q(nc)), self.rms_aq)
        ck = rms(hview(self.add_k(nc)), self.rms_ak)
        cv = hview(self.add_v(nc))
        q = torch_apply_rope(torch.cat([cq, q], dim=1), freqs)
        k = torch_apply_rope(torch.cat([ck, k], dim=1), freqs)
        v = torch.cat([cv, v], dim=1)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        o = torch.nn.functional.scaled_dot_product_attention(
            q, k, v, attn_mask=tmask[:, None])
        o = o.transpose(1, 2).flatten(2)
        ctx_o, x_o = o[:, :Lc], o[:, Lc:]

        x = x + g[:, None] * self.to_out(x_o)
        h = self.norm2(x) * (1 + sc2[:, None]) + sh2[:, None]
        x = x + g2[:, None] * self.ff_out(
            torch.nn.functional.gelu(self.ff_in(h), approximate="tanh"))
        if self.pre_only:
            return x, ctx
        ctx = ctx + cg[:, None] * self.to_add_out(ctx_o)
        hc = self.norm2_ctx(ctx) * (1 + csc2[:, None]) + csh2[:, None]
        ctx = ctx + cg2[:, None] * self.ffc_out(
            torch.nn.functional.gelu(self.ffc_in(hc), approximate="tanh"))
        return x, ctx


@pytest.mark.slow
def test_full_mmdit_model_matches_torch_oracle():
    """Full PyramidDiffusionMMDiT vs a torch reference-formula model through
    ``convert_mmdit`` (stacked scan + final context_pre_only block + sincos
    table + conv-patchify weight reshape)."""
    from pyramid_flow_tpu.models.mmdit.model import (
        MMDiTConfig, PyramidDiffusionMMDiT, sincos_pos_embed_table)
    from pyramid_flow_tpu.utils.converters import convert_mmdit

    dim, heads, head_dim = 32, 4, 8
    in_ch, patch = 4, 2
    joint_dim, pooled_dim = 16, 12
    n_blocks = 3
    cfg = MMDiTConfig(
        sample_size=8, in_channels=in_ch, num_layers=n_blocks,
        attention_head_dim=head_dim, num_attention_heads=heads,
        caption_projection_dim=dim, pooled_projection_dim=pooled_dim,
        joint_attention_dim=joint_dim, pos_embed_max_size=12)

    torch.manual_seed(0)
    blocks = [TorchJointBlock(dim, heads, head_dim, context_pre_only=(i == n_blocks - 1))
              for i in range(n_blocks)]
    te_l1 = torch.nn.Linear(256, dim)
    te_l2 = torch.nn.Linear(dim, dim)
    pe_l1 = torch.nn.Linear(pooled_dim, dim)
    pe_l2 = torch.nn.Linear(dim, dim)
    ctx_emb = torch.nn.Linear(joint_dim, dim)
    proj = torch.nn.Linear(in_ch * patch * patch, dim)
    norm_out_linear = torch.nn.Linear(dim, 2 * dim)
    proj_out = torch.nn.Linear(dim, in_ch * patch * patch)
    for m in blocks + [te_l1, te_l2, pe_l1, pe_l2, ctx_emb, proj,
                       norm_out_linear, proj_out]:
        for p_ in m.parameters():
            p_.data = torch.randn_like(p_) * 0.1

    table = sincos_pos_embed_table(dim, cfg.pos_embed_max_size,
                                   cfg.sample_size // patch)

    # ---- build the reference-layout state dict
    sd = {}
    def put(mod, key):
        sd[key + ".weight"] = mod.weight.detach().float().numpy()
        sd[key + ".bias"] = mod.bias.detach().float().numpy()
    put(te_l1, "time_text_embed.timestep_embedder.linear_1")
    put(te_l2, "time_text_embed.timestep_embedder.linear_2")
    put(pe_l1, "time_text_embed.text_embedder.linear_1")
    put(pe_l2, "time_text_embed.text_embedder.linear_2")
    put(ctx_emb, "context_embedder")
    # linear [D, p1*p2*c] -> conv2d [D, c, p1, p2] (feature order (p1,p2,c))
    W = proj.weight.detach().float().numpy()
    sd["pos_embed.proj.weight"] = np.ascontiguousarray(
        W.reshape(dim, patch, patch, in_ch).transpose(0, 3, 1, 2))
    sd["pos_embed.proj.bias"] = proj.bias.detach().float().numpy()
    sd["pos_embed.pos_embed"] = table.reshape(1, -1, dim)
    for i, b in enumerate(blocks):
        t = f"transformer_blocks.{i}"
        put(b.norm1_linear, f"{t}.norm1.linear")
        put(b.norm1_ctx_linear, f"{t}.norm1_context.linear")
        put(b.to_q, f"{t}.attn.to_q"); put(b.to_k, f"{t}.attn.to_k")
        put(b.to_v, f"{t}.attn.to_v"); put(b.to_out, f"{t}.attn.to_out.0")
        put(b.add_q, f"{t}.attn.add_q_proj"); put(b.add_k, f"{t}.attn.add_k_proj")
        put(b.add_v, f"{t}.attn.add_v_proj")
        if not b.pre_only:
            put(b.to_add_out, f"{t}.attn.to_add_out")
            put(b.ffc_in, f"{t}.ff_context.net.0.proj")
            put(b.ffc_out, f"{t}.ff_context.net.2")
        sd[f"{t}.attn.norm_q.weight"] = b.rms_q.detach().numpy()
        sd[f"{t}.attn.norm_k.weight"] = b.rms_k.detach().numpy()
        sd[f"{t}.attn.norm_add_q.weight"] = b.rms_aq.detach().numpy()
        sd[f"{t}.attn.norm_add_k.weight"] = b.rms_ak.detach().numpy()
        put(b.ff_in, f"{t}.ff.net.0.proj")
        put(b.ff_out, f"{t}.ff.net.2")
    put(norm_out_linear, "norm_out.linear")
    put(proj_out, "proj_out")
    variables = convert_mmdit(sd)

    # ---- inputs: integer spatial positions, zero crop offset
    B, L, lt = 2, 8, 5
    rng = np.random.default_rng(11)
    tokens = rng.standard_normal((B, L, in_ch * patch * patch)).astype(np.float32)
    times = np.repeat(np.arange(2), L // 2)[None].repeat(B, 0).astype(np.int32)
    pos = np.zeros((B, L, 3), np.float32)
    pos[..., 0] = times
    pos[..., 1] = rng.integers(0, 4, (B, L))
    pos[..., 2] = rng.integers(0, 4, (B, L))
    offset = np.full((B, 2), 4.0, np.float32)  # (192 - grid)/2-style origin
    text = rng.standard_normal((B, lt, joint_dim)).astype(np.float32)
    pooled = rng.standard_normal((B, pooled_dim)).astype(np.float32)
    ts = np.asarray([700.0, 30.0], np.float32)

    # ---- torch forward
    with torch.no_grad():
        half = 128
        expo = (-np.log(10000.0) * np.arange(half, dtype=np.float32) / half)
        freqs_t = torch.tensor(np.exp(expo).astype(np.float32))
        arg = torch.tensor(ts)[:, None] * freqs_t[None]
        sin_emb = torch.cat([torch.cos(arg), torch.sin(arg)], dim=-1)
        silu = torch.nn.functional.silu
        temb = te_l2(silu(te_l1(sin_emb))) + pe_l2(silu(pe_l1(torch.tensor(pooled))))
        ctx = ctx_emb(torch.tensor(text))
        x = proj(torch.tensor(tokens))
        yy = (pos[..., 1] + offset[:, :1]).astype(int)
        xx = (pos[..., 2] + offset[:, 1:]).astype(int)
        x = x + torch.tensor(table[yy, xx])
        # temporal rope over the full head dim, text at t=0
        tpos = np.concatenate(
            [np.zeros((B, lt, 1), np.float32), pos[..., :1]], axis=1)
        freqs = torch_multiaxis_rope(torch.tensor(tpos), [head_dim])
        full_t = torch.tensor(np.concatenate(
            [np.zeros((B, lt), np.int32), times], axis=1))
        tmask = full_t[:, None, :] <= full_t[:, :, None]
        for b in blocks:
            x, ctx = b(x, ctx, temb, freqs, tmask)
        e = norm_out_linear(silu(temb))
        scale, shift = e.chunk(2, dim=1)
        x = torch.nn.functional.layer_norm(x, (dim,), eps=1e-6)
        ref = proj_out(x * (1 + scale[:, None]) + shift[:, None]).numpy()

    # ---- flax forward
    model = PyramidDiffusionMMDiT(config=cfg)
    out = model.apply(
        variables, jnp.asarray(tokens), jnp.asarray(pos), jnp.asarray(times),
        jnp.asarray(text), jnp.ones((B, lt), bool), jnp.asarray(pooled),
        jnp.asarray(ts), jnp.asarray(offset))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=2e-3)
