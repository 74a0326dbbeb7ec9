"""Text encoder parity tests: flax T5/CLIP vs HF torch implementations.

These are REAL parity oracles: we instantiate tiny HF torch models, convert
their weights with ``utils.converters``, and require activation agreement.
This validates both the flax re-implementations (relative-position buckets,
no-scale T5 attention, quick-gelu CLIP, EOS pooling) and the converters.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from pyramid_flow_tpu.models.text.clip import CLIPTextConfig, CLIPTextEncoder
from pyramid_flow_tpu.models.text.t5 import T5Config, T5Encoder
from pyramid_flow_tpu.utils.converters import convert_clip, convert_t5


def _sd_numpy(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def t5_pair():
    hf_cfg = transformers.T5Config(
        vocab_size=256, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
    )
    torch_model = transformers.T5EncoderModel(hf_cfg).eval()
    cfg = T5Config(
        vocab_size=256, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
    )
    flax_model = T5Encoder(config=cfg)
    params = convert_t5(_sd_numpy(torch_model))
    return torch_model, flax_model, params


def test_t5_parity(t5_pair):
    torch_model, flax_model, params = t5_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, (2, 20))
    mask = np.ones((2, 20), np.int64)
    mask[0, 15:] = 0
    with torch.no_grad():
        ref = torch_model(
            torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    out = flax_model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    # compare only unmasked positions (HF zeroes nothing, but masked-key rows
    # still agree; masked-query rows can differ in ref impl details)
    np.testing.assert_allclose(
        np.asarray(out)[0, :15], ref[0, :15], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out)[1], ref[1], atol=2e-4, rtol=1e-3)


@pytest.fixture(scope="module")
def clip_pair():
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, eos_token_id=99,
        bos_token_id=98, hidden_act="quick_gelu",
    )
    torch_model = transformers.CLIPTextModel(hf_cfg).eval()
    cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, eos_token_id=99,
    )
    flax_model = CLIPTextEncoder(config=cfg)
    params = convert_clip(_sd_numpy(torch_model))
    return torch_model, flax_model, params


def test_clip_parity(clip_pair):
    torch_model, flax_model, params = clip_pair
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 97, (2, 77))
    ids[:, 0] = 98
    ids[0, 10] = 99  # EOS mid-sequence
    ids[1, 76] = 99
    with torch.no_grad():
        ref = torch_model(torch.tensor(ids))
        ref_hidden = ref.last_hidden_state.numpy()
        ref_pooled = ref.pooler_output.numpy()
    hidden, pooled = flax_model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=2e-4, rtol=1e-3)


def test_clip_projection():
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, eos_token_id=99, bos_token_id=98,
        hidden_act="gelu", projection_dim=16,
    )
    torch_model = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
    cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, eos_token_id=99, hidden_act="gelu",
        use_projection=True, projection_dim=16,
    )
    flax_model = CLIPTextEncoder(config=cfg)
    params = convert_clip(
        {k: v.detach().float().numpy() for k, v in torch_model.state_dict().items()})
    ids = np.random.default_rng(2).integers(1, 97, (2, 77))
    ids[:, -1] = 99
    with torch.no_grad():
        ref = torch_model(torch.tensor(ids)).text_embeds.numpy()
    _, pooled = flax_model.apply(params, jnp.asarray(ids))
    # fp32 accumulation-order noise through 2 layers + projection: ~5e-4 abs
    np.testing.assert_allclose(np.asarray(pooled), ref, atol=1e-3, rtol=1e-3)
