"""Pallas causal-conv3d kernel vs lax.conv oracle (CPU interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyramid_flow_tpu.ops.causal_conv3d import (
    pallas_causal_conv3d, supports_pallas_conv)


@pytest.mark.parametrize("shape", [
    (1, 3, 16, 128, 128, 128),
    (2, 1, 16, 128, 128, 128),   # image frame
    (1, 2, 32, 256, 128, 256),   # channel change
])
def test_matches_lax_conv(shape):
    b, t, h, w, c, co = shape
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, h, w, c), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, c, co)) * 0.02
    bias = jax.random.normal(jax.random.PRNGKey(2), (co,))
    assert supports_pallas_conv(x.shape, k.shape, (1, 1, 1))
    out = pallas_causal_conv3d(x, k, bias)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(2, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_unsupported_shapes_detected():
    assert not supports_pallas_conv((1, 3, 16, 128, 64), (3, 3, 3, 64, 64),
                                    (1, 1, 1))   # c % 128
    assert not supports_pallas_conv((1, 3, 16, 128, 128), (3, 3, 3, 128, 128),
                                    (1, 2, 2))   # strided
