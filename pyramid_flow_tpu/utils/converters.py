"""Torch-checkpoint -> flax parameter converters.

Maps the released Pyramid-Flow checkpoint state dicts (diffusers module
naming, torch [out, in] / [out, in, kt, kh, kw] layouts) onto this
framework's flax trees. Needed for activation-parity with the released
miniFLUX / SD3 / VAE weights (BASELINE.json north star).

All converters take a flat ``{torch_key: np.ndarray}`` dict (use
:func:`load_state_dict` for .safetensors / .bin / .pth files) and return a
nested ``{"params": ...}`` flax variables dict.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

import numpy as np

__all__ = [
    "load_state_dict",
    "strip_component_prefix",
    "convert_flux_dit",
    "convert_mmdit",
    "convert_vae",
    "convert_t5",
    "convert_clip",
]


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file or a diffusers model dir to numpy."""
    if os.path.isdir(path):
        out = {}
        for fname in sorted(os.listdir(path)):
            f = os.path.join(path, fname)
            if fname.endswith(".safetensors"):
                out.update(_load_safetensors(f))
            elif fname.endswith((".bin", ".pth", ".pt")):
                out.update(_load_torch(f))
        return out
    if path.endswith(".safetensors"):
        return _load_safetensors(path)
    return _load_torch(path)


def _load_safetensors(path):
    from safetensors import safe_open
    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            t = f.get_tensor(k)
            out[k] = _to_np(t)
    return out


def _load_torch(path):
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: _to_np(v) for k, v in sd.items()}


def _to_np(t):
    if hasattr(t, "detach"):
        t = t.detach()
        if t.dtype.__str__() == "torch.bfloat16":
            t = t.float()
        return t.cpu().numpy()
    arr = np.asarray(t)
    if arr.dtype == np.dtype("V2") or str(arr.dtype) == "bfloat16":
        import jax.numpy as jnp
        return np.asarray(jnp.asarray(t).astype(jnp.float32))
    return arr


def _stack_trees(trees):
    """Stack identical-structure per-layer trees along a leading layer axis
    (the nn.scan parameter layout)."""
    import jax
    return jax.tree.map(lambda *leaves: np.stack(leaves, axis=0), *trees)


def _set(tree: dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _lin(sd, tree, tkey, fpath, bias=True):
    """torch Linear -> flax Dense (kernel transposed)."""
    _set(tree, f"{fpath}/kernel", np.ascontiguousarray(sd[f"{tkey}.weight"].T))
    if bias and f"{tkey}.bias" in sd:
        _set(tree, f"{fpath}/bias", sd[f"{tkey}.bias"])


def _conv3d(sd, tree, tkey, fpath):
    """torch Conv3d [O,I,kt,kh,kw] -> flax [kt,kh,kw,I,O]."""
    w = sd[f"{tkey}.weight"].transpose(2, 3, 4, 1, 0)
    _set(tree, f"{fpath}/kernel", np.ascontiguousarray(w))
    if f"{tkey}.bias" in sd:
        _set(tree, f"{fpath}/bias", sd[f"{tkey}.bias"])


def _norm(sd, tree, tkey, fpath):
    """GroupNorm/LayerNorm weight/bias -> scale/bias."""
    _set(tree, f"{fpath}/scale", sd[f"{tkey}.weight"])
    if f"{tkey}.bias" in sd:
        _set(tree, f"{fpath}/bias", sd[f"{tkey}.bias"])


def strip_component_prefix(sd: Dict[str, np.ndarray], component: str
                           ) -> Dict[str, np.ndarray]:
    """Extract one component from a reference trainer checkpoint.

    The reference's trained checkpoints prefix keys with the wrapper attr
    (``dit.``/``vae.``; pipeline ``load_checkpoint`` :213-241, wrapper
    ``load_checkpoint`` `causal_video_vae_wrapper.py:65-88`). Returns the
    sub-dict with the prefix removed (keys already unprefixed pass through
    for the dit case, mirroring the reference's fallback).
    """
    prefix = component + "."
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
        elif component == "dit" and not k.startswith(("vae.", "text_encoder")):
            out[k] = v
    return out


# ================================================================== flux DiT
def convert_flux_dit(sd: Dict[str, np.ndarray]) -> dict:
    """Reference ``PyramidFluxTransformer`` state dict -> our flax tree."""
    p: dict = {}

    _lin(sd, p, "time_text_embed.timestep_embedder.linear_1",
         "time_text_embed/timestep_embedder_1")
    _lin(sd, p, "time_text_embed.timestep_embedder.linear_2",
         "time_text_embed/timestep_embedder_2")
    _lin(sd, p, "time_text_embed.text_embedder.linear_1",
         "time_text_embed/text_embedder_1")
    _lin(sd, p, "time_text_embed.text_embedder.linear_2",
         "time_text_embed/text_embedder_2")
    if "time_text_embed.guidance_embedder.linear_1.weight" in sd:
        # guidance-distilled variant (CombinedTimestepGuidanceTextProj)
        _lin(sd, p, "time_text_embed.guidance_embedder.linear_1",
             "time_text_embed/guidance_embedder_1")
        _lin(sd, p, "time_text_embed.guidance_embedder.linear_2",
             "time_text_embed/guidance_embedder_2")
    _lin(sd, p, "context_embedder", "context_embedder")
    _lin(sd, p, "x_embedder", "x_embedder")

    # scanned blocks: per-layer trees stacked along a leading layer axis
    n_dual = 1 + max(
        int(m.group(1)) for k in sd
        if (m := re.match(r"transformer_blocks\.(\d+)\.", k)))
    layers = []
    for i in range(n_dual):
        t = f"transformer_blocks.{i}"
        q: dict = {}
        _lin(sd, q, f"{t}.norm1.linear", "norm1/linear")
        _lin(sd, q, f"{t}.norm1_context.linear", "norm1_context/linear")
        for name in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                     "add_v_proj", "to_add_out"):
            _lin(sd, q, f"{t}.attn.{name}", f"attn/{name}")
        _lin(sd, q, f"{t}.attn.to_out.0", "attn/to_out")
        for name in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            _set(q, f"attn/{name}/scale", sd[f"{t}.attn.{name}.weight"])
        _lin(sd, q, f"{t}.ff.net.0.proj", "ff/proj_in")
        _lin(sd, q, f"{t}.ff.net.2", "ff/proj_out")
        _lin(sd, q, f"{t}.ff_context.net.0.proj", "ff_context/proj_in")
        _lin(sd, q, f"{t}.ff_context.net.2", "ff_context/proj_out")
        layers.append(q)
    p["transformer_blocks"] = _stack_trees(layers)

    n_single = 1 + max(
        int(m.group(1)) for k in sd
        if (m := re.match(r"single_transformer_blocks\.(\d+)\.", k)))
    layers = []
    for i in range(n_single):
        t = f"single_transformer_blocks.{i}"
        q = {}
        _lin(sd, q, f"{t}.norm.linear", "norm/linear")
        for name in ("to_q", "to_k", "to_v"):
            _lin(sd, q, f"{t}.attn.{name}", f"attn/{name}")
        for name in ("norm_q", "norm_k"):
            _set(q, f"attn/{name}/scale", sd[f"{t}.attn.{name}.weight"])
        _lin(sd, q, f"{t}.proj_mlp", "proj_mlp")
        _lin(sd, q, f"{t}.proj_out", "proj_out")
        layers.append(q)
    p["single_transformer_blocks"] = _stack_trees(layers)

    _lin(sd, p, "norm_out.linear", "norm_out/linear")
    _lin(sd, p, "proj_out", "proj_out")
    return {"params": p}


# ================================================================== mmdit
def convert_mmdit(sd: Dict[str, np.ndarray]) -> dict:
    """Reference ``PyramidDiffusionMMDiT`` state dict -> our flax tree."""
    p: dict = {}

    _lin(sd, p, "time_text_embed.timestep_embedder.linear_1",
         "time_text_embed/timestep_embedder_1")
    _lin(sd, p, "time_text_embed.timestep_embedder.linear_2",
         "time_text_embed/timestep_embedder_2")
    _lin(sd, p, "time_text_embed.text_embedder.linear_1",
         "time_text_embed/text_embedder_1")
    _lin(sd, p, "time_text_embed.text_embedder.linear_2",
         "time_text_embed/text_embedder_2")
    _lin(sd, p, "context_embedder", "context_embedder")

    # PatchEmbed3D: conv2d [D, C, p1, p2] -> Dense over (p1, p2, c) features
    w = sd["pos_embed.proj.weight"]
    dout, c, p1, p2 = w.shape
    _set(p, "pos_embed_proj/kernel",
         np.ascontiguousarray(w.transpose(2, 3, 1, 0).reshape(p1 * p2 * c, dout)))
    _set(p, "pos_embed_proj/bias", sd["pos_embed.proj.bias"])
    if "pos_embed.pos_embed" in sd:
        table = sd["pos_embed.pos_embed"]  # [1, G*G, D]
        g = int(np.sqrt(table.shape[1]))
        _set(p, "pos_embed_table", table.reshape(g, g, -1))

    n = 1 + max(
        int(m.group(1)) for k in sd
        if (m := re.match(r"transformer_blocks\.(\d+)\.", k)))

    def _one_block(i):
        t = f"transformer_blocks.{i}"
        q: dict = {}
        _lin(sd, q, f"{t}.norm1.linear", "norm1/linear")
        _lin(sd, q, f"{t}.norm1_context.linear", "norm1_context/linear")
        for name in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                     "add_v_proj"):
            _lin(sd, q, f"{t}.attn.{name}", f"attn/{name}")
        _lin(sd, q, f"{t}.attn.to_out.0", "attn/to_out")
        if f"{t}.attn.to_add_out.weight" in sd:
            _lin(sd, q, f"{t}.attn.to_add_out", "attn/to_add_out")
        for name in ("norm_q", "norm_k", "norm_add_q", "norm_add_k"):
            _set(q, f"attn/{name}/scale", sd[f"{t}.attn.{name}.weight"])
        _lin(sd, q, f"{t}.ff.net.0.proj", "ff/proj_in")
        _lin(sd, q, f"{t}.ff.net.2", "ff/proj_out")
        if f"{t}.ff_context.net.0.proj.weight" in sd:
            _lin(sd, q, f"{t}.ff_context.net.0.proj", "ff_context/proj_in")
            _lin(sd, q, f"{t}.ff_context.net.2", "ff_context/proj_out")
        return q

    # first n-1 uniform blocks stacked for nn.scan; context_pre_only last
    # block separate
    p["transformer_blocks"] = _stack_trees([_one_block(i) for i in range(n - 1)])
    p["final_block"] = _one_block(n - 1)

    _lin(sd, p, "norm_out.linear", "norm_out/linear")
    _lin(sd, p, "proj_out", "proj_out")
    return {"params": p}


# ==================================================================== VAE
def _resnet(sd, p, t, f):
    _norm(sd, p, f"{t}.norm1", f"{f}/norm1")
    _conv3d(sd, p, f"{t}.conv1.conv", f"{f}/conv1")
    _norm(sd, p, f"{t}.norm2", f"{f}/norm2")
    _conv3d(sd, p, f"{t}.conv2.conv", f"{f}/conv2")
    if f"{t}.conv_shortcut.conv.weight" in sd:
        _conv3d(sd, p, f"{t}.conv_shortcut.conv", f"{f}/conv_shortcut")


def _mid_block(sd, p, t, f):
    _resnet(sd, p, f"{t}.resnets.0", f"{f}/resnets_0")
    i = 0
    while f"{t}.attentions.{i}.to_q.weight" in sd:
        a, fa = f"{t}.attentions.{i}", f"{f}/attentions_{i}"
        _norm(sd, p, f"{a}.group_norm", f"{fa}/group_norm")
        for name in ("to_q", "to_k", "to_v"):
            _lin(sd, p, f"{a}.{name}", f"{fa}/{name}")
        _lin(sd, p, f"{a}.to_out.0", f"{fa}/to_out")
        _resnet(sd, p, f"{t}.resnets.{i+1}", f"{f}/resnets_{i+1}")
        i += 1


def convert_vae(sd: Dict[str, np.ndarray]) -> dict:
    """Reference ``CausalVideoVAE`` state dict -> our flax tree."""
    p: dict = {}
    for side in ("encoder", "decoder"):
        _conv3d(sd, p, f"{side}.conv_in.conv", f"{side}/conv_in")
        _mid_block(sd, p, f"{side}.mid_block", f"{side}/mid_block")
        _norm(sd, p, f"{side}.conv_norm_out", f"{side}/conv_norm_out")
        _conv3d(sd, p, f"{side}.conv_out.conv", f"{side}/conv_out")

    i = 0
    while f"encoder.down_blocks.{i}.resnets.0.norm1.weight" in sd:
        t, f = f"encoder.down_blocks.{i}", f"encoder/down_blocks_{i}"
        j = 0
        while f"{t}.resnets.{j}.norm1.weight" in sd:
            _resnet(sd, p, f"{t}.resnets.{j}", f"{f}/resnets_{j}")
            j += 1
        if f"{t}.downsamplers.0.conv.conv.weight" in sd:
            _conv3d(sd, p, f"{t}.downsamplers.0.conv.conv", f"{f}/downsampler/conv")
        if f"{t}.temporal_downsamplers.0.conv.conv.weight" in sd:
            _conv3d(sd, p, f"{t}.temporal_downsamplers.0.conv.conv",
                    f"{f}/temporal_downsampler/conv")
        i += 1

    i = 0
    while f"decoder.up_blocks.{i}.resnets.0.norm1.weight" in sd:
        t, f = f"decoder.up_blocks.{i}", f"decoder/up_blocks_{i}"
        j = 0
        while f"{t}.resnets.{j}.norm1.weight" in sd:
            _resnet(sd, p, f"{t}.resnets.{j}", f"{f}/resnets_{j}")
            j += 1
        if f"{t}.upsamplers.0.conv.conv.weight" in sd:
            _conv3d(sd, p, f"{t}.upsamplers.0.conv.conv", f"{f}/upsampler/conv")
        if f"{t}.temporal_upsamplers.0.conv.conv.weight" in sd:
            _conv3d(sd, p, f"{t}.temporal_upsamplers.0.conv.conv",
                    f"{f}/temporal_upsampler/conv")
        i += 1

    _conv3d(sd, p, "quant_conv.conv", "quant_conv")
    _conv3d(sd, p, "post_quant_conv.conv", "post_quant_conv")
    return {"params": p}


# ==================================================================== text
def convert_t5(sd: Dict[str, np.ndarray]) -> dict:
    """HF ``T5EncoderModel`` state dict -> our ``T5Encoder`` tree."""
    p: dict = {}
    embed = sd.get("shared.weight", sd.get("encoder.embed_tokens.weight"))
    _set(p, "embed_tokens/embedding", embed)
    _set(p, "relative_attention_bias",
         sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"])

    i = 0
    while f"encoder.block.{i}.layer.0.SelfAttention.q.weight" in sd:
        t = f"encoder.block.{i}"
        f = f"block_{i}"
        for name in ("q", "k", "v", "o"):
            _lin(sd, p, f"{t}.layer.0.SelfAttention.{name}", f"{f}/attn/{name}",
                 bias=False)
        _set(p, f"{f}/ln_attn/weight", sd[f"{t}.layer.0.layer_norm.weight"])
        for name in ("wi_0", "wi_1", "wo"):
            _lin(sd, p, f"{t}.layer.1.DenseReluDense.{name}", f"{f}/{name}",
                 bias=False)
        _set(p, f"{f}/ln_ff/weight", sd[f"{t}.layer.1.layer_norm.weight"])
        i += 1

    _set(p, "final_layer_norm/weight", sd["encoder.final_layer_norm.weight"])
    return {"params": p}


def convert_clip(sd: Dict[str, np.ndarray]) -> dict:
    """HF ``CLIPTextModel[WithProjection]`` state dict -> our tree."""
    p: dict = {}
    _set(p, "token_embedding/embedding",
         sd["text_model.embeddings.token_embedding.weight"])
    _set(p, "position_embedding",
         sd["text_model.embeddings.position_embedding.weight"])

    i = 0
    while f"text_model.encoder.layers.{i}.self_attn.q_proj.weight" in sd:
        t = f"text_model.encoder.layers.{i}"
        f = f"layers_{i}"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _lin(sd, p, f"{t}.self_attn.{name}", f"{f}/self_attn/{name}")
        _norm(sd, p, f"{t}.layer_norm1", f"{f}/layer_norm1")
        _norm(sd, p, f"{t}.layer_norm2", f"{f}/layer_norm2")
        _lin(sd, p, f"{t}.mlp.fc1", f"{f}/fc1")
        _lin(sd, p, f"{t}.mlp.fc2", f"{f}/fc2")
        i += 1

    _norm(sd, p, "text_model.final_layer_norm", "final_layer_norm")
    if "text_projection.weight" in sd:
        _lin(sd, p, "text_projection", "text_projection", bias=False)
    return {"params": p}
