"""Online text-encoder training (VERDICT r1 #5).

The reference can train from raw ``text`` strings, running frozen T5/CLIP
inside the step with the 10% CFG drop
(`pyramid_dit_for_video_gen_pipeline.py:597-614`,
`train/train_pyramid_flow.py:381-445`). This exercises the equivalent path
end-to-end at tiny configs: {latent, text} jsonl with NO pre-extracted
features -> dataset(load_text_fea=False) -> bucketed loader (raw-text
passthrough) -> ``fill_text_features`` (the train CLI's per-batch encoder
hook) -> one jitted train step.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, "/root/repo")  # tools/ is not a package

from pyramid_flow_tpu.data.datasets import LengthGroupedVideoTextDataset
from pyramid_flow_tpu.data.loaders import (
    create_length_grouped_video_text_dataloader,
)
from pyramid_flow_tpu.models.flux.model import FluxConfig, PyramidFluxTransformer
from pyramid_flow_tpu.models.text.clip import CLIPTextConfig
from pyramid_flow_tpu.models.text.encoder import FluxTextEncoder
from pyramid_flow_tpu.models.text.t5 import T5Config
from pyramid_flow_tpu.schedulers.flow_matching import (
    PyramidFlowMatchEulerDiscreteScheduler,
)
from pyramid_flow_tpu.training.train_state import TrainConfig, create_train_state
from pyramid_flow_tpu.training.trainer import make_train_step

T5_CFG = T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                  num_layers=1, num_heads=4)
CLIP_CFG = CLIPTextConfig(vocab_size=128, hidden_size=24,
                          intermediate_size=48, num_layers=1, num_heads=4,
                          eos_token_id=2)
DIT_CFG = FluxConfig(
    in_channels=16, num_layers=1, num_single_layers=1, attention_head_dim=8,
    num_attention_heads=4, joint_attention_dim=32, pooled_projection_dim=24,
    axes_dims_rope=(4, 2, 2),
)


class FakeTokenizer:
    """Hash-bucket tokenizer with the transformers call signature."""

    model_max_length = 16

    def __call__(self, prompts, padding=None, max_length=16, truncation=True,
                 return_tensors="np"):
        max_length = min(max_length, 16)
        ids = np.zeros((len(prompts), max_length), np.int32)
        mask = np.zeros((len(prompts), max_length), np.int32)
        for i, p in enumerate(prompts):
            toks = [3 + (hash(w) % 100) for w in p.split()][: max_length - 1]
            toks = toks + [2]  # eos
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def _tiny_text_encoder():
    te = FluxTextEncoder(
        clip_params=None, t5_params=None, model_path=None,
        clip_config=CLIP_CFG, t5_config=T5_CFG,
        tokenizers=(FakeTokenizer(), FakeTokenizer()),
        max_sequence_length=8, dtype=jnp.float32)
    te.clip_params = te.clip.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32))
    te.t5_params = te.t5.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32))
    return te


def test_raw_text_training_step(tmp_path):
    # jsonl with raw latents + text, NO text_fea field
    anno = tmp_path / "anno.jsonl"
    rng = np.random.default_rng(0)
    with open(anno, "w") as f:
        for i in range(4):
            lat = rng.standard_normal((3, 8, 8, 4)).astype(np.float32)
            p = tmp_path / f"lat{i}.npy"
            np.save(p, lat)
            f.write(json.dumps({"latent": str(p),
                                "text": f"a tiny test video {i}"}) + "\n")

    ds = LengthGroupedVideoTextDataset(str(anno), max_frames=3,
                                       latent_channels=4,
                                       load_text_fea=False)
    loader = create_length_grouped_video_text_dataloader(
        ds, batch_size=2, rank=0, world=1, sync_group=1)

    from tools.train_pyramid_flow import fill_text_features

    te = _tiny_text_encoder()
    batch_np = next(iter(loader))
    assert "text" in batch_np and "text_emb" not in batch_np
    batch_np = fill_text_features(batch_np, te)
    assert batch_np["text_emb"].shape == (2, 8, 32)
    assert batch_np["pooled"].shape == (2, 24)
    assert batch_np["text_mask"].any()

    # null features from the empty prompt (what the CLI caches once)
    nemb, _, npooled = te("")
    batch = {
        "latents": jnp.asarray(batch_np["latents"]
                               if "latents" in batch_np
                               else batch_np["latent"]),
        "text_emb": jnp.asarray(batch_np["text_emb"]),
        "text_mask": jnp.asarray(batch_np["text_mask"]),
        "pooled": jnp.asarray(batch_np["pooled"]),
        "null_text_emb": jnp.broadcast_to(
            jnp.asarray(nemb), batch_np["text_emb"].shape),
        "null_pooled": jnp.broadcast_to(
            jnp.asarray(npooled), batch_np["pooled"].shape),
    }

    dit = PyramidFluxTransformer(config=DIT_CFG, dtype=jnp.float32)
    params = dit.init(
        jax.random.PRNGKey(2), jnp.zeros((2, 16, 16)), jnp.zeros((2, 16, 3)),
        jnp.zeros((2, 16), jnp.int32), jnp.zeros((2, 8, 32)),
        jnp.ones((2, 8), bool), jnp.zeros((2, 24)), jnp.zeros((2,)))
    state = create_train_state(params, TrainConfig(learning_rate=1e-3))
    params_before = jax.tree.map(np.asarray, state.params)  # pre-donation copy
    sched = PyramidFlowMatchEulerDiscreteScheduler()
    step_fn = make_train_step(dit, sched, sample_ratios=(1, 1),
                              use_temporal_pyramid=False, frame_per_unit=1)
    state2, metrics = step_fn(state, batch, jax.random.PRNGKey(3),
                              num_units_per_stage=(1, 1))
    assert np.isfinite(float(metrics["train/loss"]))
    # parameters actually moved
    moved = jax.tree.map(lambda a, b: float(np.abs(a - np.asarray(b)).max()),
                         params_before, state2.params)
    assert max(jax.tree.leaves(moved)) > 0
