"""Flash attention kernel vs naive XLA oracle (forward + gradients).

Runs the Pallas kernels in interpreter mode on the CPU test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyramid_flow_tpu.ops.flash_attention import (
    INVALID_TIME,
    attention_reference,
    flash_attention,
)


def make_inputs(key, b=2, h=2, l=256, d=64, text_len=16, pad=10, frames=4):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, h, l, d), jnp.float32) * 0.5
    k = jax.random.normal(ks[1], (b, h, l, d), jnp.float32) * 0.5
    v = jax.random.normal(ks[2], (b, h, l, d), jnp.float32)
    # layout: [text_len text tokens (t=0, last `pad` invalid), latent tokens
    # with frame times 1..frames]
    n_lat = l - text_len
    per_frame = n_lat // frames
    times = np.zeros((b, l), np.int32)
    times[:, text_len - pad: text_len] = int(INVALID_TIME)
    for f in range(frames):
        s = text_len + f * per_frame
        e = text_len + (f + 1) * per_frame if f < frames - 1 else l
        times[:, s:e] = f + 1
    return q, k, v, jnp.asarray(times)


@pytest.mark.parametrize("causal", [True, False])
def test_forward_matches_reference(causal):
    q, k, v, t = make_inputs(jax.random.PRNGKey(0))
    out = flash_attention(q, k, v, t, causal=causal)
    ref = attention_reference(q, k, v, t, causal=causal)
    valid = np.asarray(t[0]) != int(INVALID_TIME)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, valid], np.asarray(ref)[:, :, valid], atol=2e-5
    )


def test_forward_unpadded_short():
    # L < block size exercises the padding path
    q, k, v, t = make_inputs(jax.random.PRNGKey(1), l=192, text_len=64, pad=7)
    out = flash_attention(q, k, v, t, causal=True)
    ref = attention_reference(q, k, v, t, causal=True)
    valid = np.asarray(t[0]) != int(INVALID_TIME)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, valid], np.asarray(ref)[:, :, valid], atol=2e-5
    )


def test_temporal_causality_semantics():
    """Latents at frame f must ignore later-frame keys; text (t=0) sees only
    text and frame-0 tokens (there are none here), every latent sees text."""
    key = jax.random.PRNGKey(2)
    q, k, v, t = make_inputs(key, b=1, h=1, l=256, text_len=16, pad=0, frames=4)
    out1 = flash_attention(q, k, v, t, causal=True)
    # perturb v on the LAST frame's tokens: earlier-frame outputs unchanged
    per_frame = (256 - 16) // 4
    v2 = v.at[:, :, -per_frame:].set(0.0)
    out2 = flash_attention(q, k, v2, t, causal=True)
    np.testing.assert_allclose(
        np.asarray(out1)[:, :, : 256 - per_frame],
        np.asarray(out2)[:, :, : 256 - per_frame],
        atol=1e-6,
    )
    assert not np.allclose(out1[:, :, -per_frame:], out2[:, :, -per_frame:])


@pytest.mark.parametrize("causal", [True, False])
def test_gradients_match_reference(causal):
    q, k, v, t = make_inputs(jax.random.PRNGKey(3), b=1, h=2, l=256)
    valid = (np.asarray(t[0]) != int(INVALID_TIME)).astype(np.float32)
    w = jnp.asarray(valid)[None, None, :, None]

    def loss_flash(q, k, v):
        return jnp.sum((flash_attention(q, k, v, t, causal=causal) * w) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((attention_reference(q, k, v, t, causal=causal) * w) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3,
            err_msg=f"grad {name}",
        )


def test_gradients_with_non_1024_multiple_block():
    """Forward blocks > 1024 that are NOT multiples of 1024 (e.g. the
    PF_FLASH_BLOCK=1536 A/B knob): the backward clamps its tiles to 1024 and
    must re-pad to ITS block multiples — regression for a silent gradient
    truncation where dq rows past the last full 1024 tile were never
    written."""
    q, k, v, t = make_inputs(jax.random.PRNGKey(9), b=1, h=2, l=1200)
    valid = (np.asarray(t[0]) != int(INVALID_TIME)).astype(np.float32)
    w = jnp.asarray(valid)[None, None, :, None]

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, t, causal=True,
                              block_q=1536, block_k=1536)
        return jnp.sum((out * w) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((attention_reference(q, k, v, t, causal=True) * w) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3,
            err_msg=f"grad {name}",
        )


def test_bf16_forward():
    q, k, v, t = make_inputs(jax.random.PRNGKey(4), l=128)
    out = flash_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), t
    )
    ref = attention_reference(q, k, v, t)
    assert out.dtype == jnp.bfloat16
    valid = np.asarray(t[0]) != int(INVALID_TIME)
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[:, :, valid],
        np.asarray(ref)[:, :, valid],
        atol=3e-2,
    )


@pytest.mark.parametrize("causal", [True, False])
def test_bounded_softmax_matches_reference(causal, monkeypatch):
    """The bounded-softmax forward (PF_BOUNDED_SOFTMAX=1): replacing the
    running row max with the Cauchy-Schwarz bound |q||k|max is exact by
    softmax shift invariance. Forward AND gradients (the backward consumes
    the bounded lse) must match the oracle."""
    monkeypatch.setenv("PF_BOUNDED_SOFTMAX", "1")
    q, k, v, t = make_inputs(jax.random.PRNGKey(5))
    out = flash_attention(q, k, v, t, causal=causal)
    ref = attention_reference(q, k, v, t, causal=causal)
    valid = np.asarray(t[0]) != int(INVALID_TIME)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, valid], np.asarray(ref)[:, :, valid], atol=2e-5)

    vm = jnp.asarray(valid, jnp.float32)[None, None, :, None]

    def loss_f(q, k, v):
        return jnp.sum((flash_attention(q, k, v, t, causal=causal) * vm) ** 2)

    def loss_r(q, k, v):
        return jnp.sum((attention_reference(q, k, v, t, causal=causal) * vm) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a)[:, :, valid], np.asarray(b_)[:, :, valid],
            atol=5e-4)


def test_bounded_softmax_large_scale_scores(monkeypatch):
    """Scores at the top of the qk-norm operating envelope (|q|,|k| rows
    ~2x unit-RMS): the Cauchy-Schwarz bound overshoots the true max by tens
    of log2 units; outputs must still match exactly (exponent headroom).
    The envelope: overshoot must stay < ~120 log2 units, guaranteed when
    q/k are RMS-normalized with O(1) gains — which both DiT variants apply
    (qk-norm). Unnormalized 4x-sigma inputs DO underflow; that is outside
    the documented contract (see _fwd_bounded docs)."""
    monkeypatch.setenv("PF_BOUNDED_SOFTMAX", "1")
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    b, h, l, d = 1, 2, 256, 64
    q = jax.random.normal(ks[0], (b, h, l, d), jnp.float32) * 2.0
    k = jax.random.normal(ks[1], (b, h, l, d), jnp.float32) * 2.0
    v = jax.random.normal(ks[2], (b, h, l, d), jnp.float32)
    t = jnp.zeros((b, l), jnp.int32)
    out = flash_attention(q, k, v, t, causal=True)
    ref = attention_reference(q, k, v, t, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("bounded", [False, True])
def test_head_dim_128(bounded):
    # d=128 needs the v pad to grow to 256 lanes for the ones-column
    # denominator; verify both kernels stay exact there
    q, k, v, t = make_inputs(jax.random.PRNGKey(5), l=256, d=128)
    out = flash_attention(q, k, v, t, causal=True, bounded=bounded)
    ref = attention_reference(q, k, v, t, causal=True)
    valid = np.asarray(t[0]) != int(INVALID_TIME)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, valid], np.asarray(ref)[:, :, valid], atol=2e-5
    )


def test_bounded_overshoot_probe():
    """The debug probe reports small slack for qk-norm-scale inputs and
    -inf-free finite values; rows of pad are excluded."""
    from pyramid_flow_tpu.ops.flash_attention import bounded_softmax_overshoot

    q, k, v, t = make_inputs(jax.random.PRNGKey(6))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True) * 8.0  # qk-normed-ish
    k = k / jnp.linalg.norm(k, axis=-1, keepdims=True) * 8.0
    over = float(bounded_softmax_overshoot(q, k, t, causal=True))
    assert np.isfinite(over)
    assert 0.0 < over < 40.0  # Cauchy-Schwarz slack, far from the 120 cliff


def test_tile_types_pad_aware():
    """Direct check of the tile classifier: pure-pad q-tiles SKIP everything;
    mixed valid+pad q-tiles still skip k-tiles their valid rows cannot see;
    mixed-validity k-tiles are never FULL."""
    from pyramid_flow_tpu.ops.flash_attention import (
        TILE_FULL, TILE_MASKED, TILE_SKIP, _tile_types)

    INV = int(INVALID_TIME)
    # 6 tiles of 4: [text t=0 | frame1 | frame2 | pad | pad+frame3 | frame3]
    t = np.array([[0, 0, 0, 0,
                   1, 1, 1, 1,
                   2, 2, 2, 2,
                   INV, INV, INV, INV,
                   INV, INV, 3, 3,
                   3, 3, 3, 3]], np.int32)
    tt = np.asarray(_tile_types(jnp.asarray(t), jnp.asarray(t), 4, 4,
                                causal=True))[0]
    # pure-pad q-tile (row 3) skips every k-tile
    assert (tt[3] == TILE_SKIP).all()
    # frame-1 queries (q-tile 1): see text+frame1 fully, skip frames 2/3 AND
    # both pad-containing tiles (kmin=INV or kmin>1)
    assert tt[1, 0] == TILE_FULL and tt[1, 1] == TILE_FULL
    assert (tt[1, 2:] == TILE_SKIP).all()
    # mixed pad+frame3 q-tile (4): pad rows must NOT disable skips for the
    # frame-3 rows; tiles visible to frame 3 are FULL/MASKED, none skipped
    assert tt[4, 0] == TILE_FULL          # text fully visible
    assert tt[4, 4] == TILE_MASKED        # its own mixed tile: masked
    # mixed-validity k-tile (4) is never FULL for any q-tile
    assert (tt[:, 4] != TILE_FULL).all()
    # non-causal: pure-pad q-tile skips, pure-pad k-tile skipped by all
    tn = np.asarray(_tile_types(jnp.asarray(t), jnp.asarray(t), 4, 4,
                                causal=False))[0]
    assert (tn[3] == TILE_SKIP).all()
    assert (tn[:, 3] == TILE_SKIP).all()


@pytest.mark.parametrize("h", [3, 2])
def test_bounded_heads_per_cell_paths(h, monkeypatch):
    """Both hs regimes of the bounded forward: odd head counts fall back to
    hs=1 (the default tests all use even heads, which take the hs=2 ILP
    path — a fallback regression would otherwise ship silently), and
    PF_FLASH_HS must override cleanly. Forward AND gradients (the backward
    consumes the hs-kernel's lse) vs the oracle."""
    from pyramid_flow_tpu.ops.flash_attention import _bounded_hs

    monkeypatch.setenv("PF_BOUNDED_SOFTMAX", "1")
    assert _bounded_hs(3) == 1 and _bounded_hs(2) == 2
    monkeypatch.setenv("PF_FLASH_HS", "1")
    assert _bounded_hs(24) == 1
    monkeypatch.delenv("PF_FLASH_HS")

    q, k, v, t = make_inputs(jax.random.PRNGKey(7), h=h)
    out = flash_attention(q, k, v, t, causal=True)
    ref = attention_reference(q, k, v, t, causal=True)
    valid = np.asarray(t[0]) != int(INVALID_TIME)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, valid], np.asarray(ref)[:, :, valid], atol=2e-5)

    vm = jnp.asarray(valid, jnp.float32)[None, None, :, None]
    gf = jax.grad(lambda q: jnp.sum(
        (flash_attention(q, k, v, t, causal=True) * vm) ** 2))(q)
    gr = jax.grad(lambda q: jnp.sum(
        (attention_reference(q, k, v, t, causal=True) * vm) ** 2))(q)
    np.testing.assert_allclose(
        np.asarray(gf)[:, :, valid], np.asarray(gr)[:, :, valid], atol=5e-4)
