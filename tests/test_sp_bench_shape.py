"""SP at BENCH shapes: de-risk ``BENCH_SP`` before multi-chip hardware.

The first real multi-chip bench (``BENCH_SP=8`` on a v5p-8, BASELINE.json
config 5 / `scripts/inference_multidevice.sh`) must not be the first-ever
execution of the SP path at 768p-class token counts (VERDICT r3 #7). These
tests run ``sp_flash_attention`` on the virtual CPU mesh at the EXACT
sequence lengths the 768p bench produces — including the shard-divisibility
padding branch — and assert equality with the single-device kernel.

Reference analogue: `scripts/inference_multigpu.sh` (2/4-GPU SP configs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyramid_flow_tpu.ops.flash_attention import INVALID_TIME, flash_attention
from pyramid_flow_tpu.parallel.mesh import MeshConfig, make_mesh
from pyramid_flow_tpu.parallel.sp import sp_flash_attention

pytestmark = pytest.mark.slow


def _bench_768p_times(cur=3840, cond=7000, text=128):
    """The 768p final-unit layout: text + 15-unit AR history + pad + clip
    (same construction as tools/exp_flash_h2.py / the real pipeline)."""
    budget = -(-(text + cond) // 512) * 512
    pad = budget - text - cond
    hist = np.repeat(np.arange(1, 16, dtype=np.int32), -(-cond // 15))[:cond]
    t = np.concatenate([
        np.zeros(text, np.int32), hist,
        np.full(pad, INVALID_TIME, np.int32),
        np.full(cur, 16, np.int32)])
    return t


@pytest.mark.parametrize("sp", [2, 8])
def test_sp_flash_at_768p_bench_length(sp):
    """sp=2 divides L=11008 exactly (no pad); sp=8 forces the pad-to-
    sp*128 branch (11008 % 1024 != 0). Heads=8 covers the bench's
    heads-divide-sp contract (24 % 8 == 0 on the real model)."""
    # bench.py's partial-host mesh construction: first sp devices
    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, sp=sp),
                     devices=jax.devices()[:sp])
    t = _bench_768p_times()
    L = t.shape[0]
    assert L == 11008
    b, h, d = 1, 8, 16  # tiny dims, real token counts
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, L, d)) * 0.3
    k = jax.random.normal(ks[1], (b, h, L, d)) * 0.3
    v = jax.random.normal(ks[2], (b, h, L, d))
    tq = jnp.asarray(t)[None]

    ref = flash_attention(q, k, v, tq, causal=True, bounded=True)
    got = jax.jit(lambda *a: sp_flash_attention(
        *a, mesh=mesh, causal=True, bounded=True))(q, k, v, tq)
    valid = t != INVALID_TIME
    np.testing.assert_allclose(
        np.asarray(got)[:, :, valid], np.asarray(ref)[:, :, valid],
        atol=3e-5, err_msg=f"sp={sp} diverges from single-device at bench L")


def test_sp_bench_mesh_matches_bench_py():
    """bench.py's BENCH_SP mesh construction (dp=1, fsdp=1, sp=N) builds and
    carries the sp axis the model reads — the exact lines the v5p-8 bench
    will execute (bench.py main(): make_mesh(MeshConfig(dp=1, fsdp=fsdp,
    sp=sp)))."""
    n = len(jax.devices())
    sp = 8
    assert n % sp == 0, (n, sp)
    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, sp=sp))
    assert mesh.shape["sp"] == sp
    assert mesh.shape["dp"] == 1 and mesh.shape["fsdp"] == 1
