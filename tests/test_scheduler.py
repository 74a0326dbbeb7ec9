"""Scheduler unit tests: sigma tables and Euler step vs hand-computed values.

The reference publishes the start/end sigmas at default config in its startup
log; we re-derive them here from first principles (shifted-sigma formula +
gamma correction) rather than from the reference code.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from pyramid_flow_tpu.schedulers.flow_matching import (
    PyramidFlowMatchEulerDiscreteScheduler,
    euler_step,
)


@pytest.fixture(scope="module")
def sched():
    return PyramidFlowMatchEulerDiscreteScheduler()


def _expected_sigma(i, n=1000, shift=1.0):
    # global table entry i: descending timesteps n..1 normalized, then shifted
    t = (n - i) / n
    return shift * t / (1 + (shift - 1) * t)


def test_global_sigma_table(sched):
    n = sched.num_train_timesteps
    for i in [0, 1, 333, 500, 666, 999]:
        assert sched.sigmas[i] == pytest.approx(_expected_sigma(i), abs=1e-6)
    assert sched.sigma_max == pytest.approx(1.0)
    assert sched.sigma_min == pytest.approx(1.0 / n)


def test_stage_windows_default_config(sched):
    # stage 0 starts at sigma=1.0 exactly
    assert sched.start_sigmas[0] == pytest.approx(1.0)
    assert sched.ori_start_sigmas[0] == pytest.approx(1.0)

    # stage boundaries: indices 333 and 666 of the (unshifted) table
    s333 = _expected_sigma(333)
    s666 = _expected_sigma(666)
    assert sched.end_sigmas[0] == pytest.approx(s333, abs=1e-6)
    assert sched.ori_start_sigmas[1] == pytest.approx(s333, abs=1e-6)
    assert sched.end_sigmas[1] == pytest.approx(s666, abs=1e-6)
    assert sched.ori_start_sigmas[2] == pytest.approx(s666, abs=1e-6)
    assert sched.end_sigmas[2] == 0.0

    # gamma-corrected start sigma for stage s>0:
    #   ori = 1 - s;  corrected = ori / (2*(1-ori) + ori)  [gamma=1/3 => sqrt(1+3)=2]
    for i_s in (1, 2):
        s = sched.ori_start_sigmas[i_s]
        ori = 1 - s
        corrected = ori / (math.sqrt(4.0) * (1 - ori) + ori)
        assert sched.start_sigmas[i_s] == pytest.approx(1 - corrected, abs=1e-6)


def test_stage_timestep_tables(sched):
    n = sched.num_train_timesteps
    for i_s in range(3):
        ts = sched.timesteps_per_stage[i_s]
        assert ts.shape == (n,)
        # descending inside the stage window
        assert ts[0] > ts[-1]
        sig = sched.sigmas_per_stage[i_s]
        assert sig[0] == pytest.approx(1.0)
        # linspace(1, 0, n+1)[:-1] => last entry = 1/n
        assert sig[-1] == pytest.approx(1.0 / n, abs=1e-6)


def test_timestep_ratio_partition(sched):
    # ratios partition [0, 1]
    assert sched.timestep_ratios[0][0] == 0.0
    assert sched.timestep_ratios[2][1] == 1.0
    for i_s in range(2):
        assert sched.timestep_ratios[i_s][1] == pytest.approx(
            sched.timestep_ratios[i_s + 1][0]
        )


def test_inference_tables(sched):
    for i_s in range(3):
        ts, sig = sched.inference_tables(10, i_s)
        assert ts.shape == (10,)
        assert sig.shape == (11,)
        assert sig[0] == pytest.approx(1.0)
        assert sig[-1] == 0.0
        # endpoints match the stage tables
        assert ts[0] == pytest.approx(sched.timesteps_per_stage[i_s][0])
        assert ts[-1] == pytest.approx(sched.timesteps_per_stage[i_s][-1])


def test_euler_step_math():
    x = jnp.ones((2, 3), jnp.bfloat16) * 2.0
    v = jnp.ones((2, 3), jnp.bfloat16) * 4.0
    out = euler_step(x, v, jnp.float32(0.8), jnp.float32(0.5))
    # 2 + (0.5-0.8)*4 = 0.8
    np.testing.assert_allclose(np.asarray(out, np.float32), 0.8, rtol=1e-2)
    assert out.dtype == jnp.bfloat16


def test_transition_coefficients(sched):
    # alpha^2 + beta^2*gamma-block-structure preserves variance at transition:
    # for gamma=1/3: alpha = 1/(2*(1-ori)+ori), beta = alpha*(1-ori)*sqrt(3)
    for i_s in (1, 2):
        alpha, beta = sched.transition_coefficients(i_s)
        ori = 1 - sched.ori_start_sigmas[i_s]
        assert alpha == pytest.approx(1 / (2 * (1 - ori) + ori))
        assert beta == pytest.approx(alpha * (1 - ori) * math.sqrt(3.0))


def test_sample_stage_timesteps(sched):
    u = jnp.array([0.0, 0.5, 0.999999])
    ts, ratios = sched.sample_stage_timesteps(u, 0)
    assert ts[0] == pytest.approx(sched.timesteps_per_stage[0][0])
    assert ratios[0] == pytest.approx(1.0)
    assert ts[-1] == pytest.approx(sched.timesteps_per_stage[0][-1])


def test_shift_config():
    s = PyramidFlowMatchEulerDiscreteScheduler(shift=3.0)
    # shifted sigma at i=500: t=0.5 -> 3*0.5/(1+2*0.5) = 0.75
    assert s.sigmas[500] == pytest.approx(0.75, abs=1e-6)
