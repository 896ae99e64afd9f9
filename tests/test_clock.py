"""Gait-clock parity tests: JAX pchip vs scipy, clock builder vs reference
create_phase_reward semantics."""
import numpy as np
import jax.numpy as jnp
import pytest

from apex_tpu.rewards.clock import (
    GaitClock,
    STANCE_AERIAL,
    STANCE_GROUNDED,
    STANCE_ZERO,
    build_clock,
    speed_to_durations,
)
from apex_tpu.utils.pchip import pchip, pchip_derivatives


def test_pchip_matches_scipy():
    from scipy.interpolate import PchipInterpolator

    rng = np.random.RandomState(0)
    x = np.sort(rng.uniform(0, 10, 15))
    x += np.arange(15) * 1e-3  # ensure strictly increasing
    y = rng.randn(15)
    ref = PchipInterpolator(x, y)
    t = np.linspace(x[0], x[-1], 200)
    got = pchip(jnp.asarray(x), jnp.asarray(y), jnp.asarray(t))
    np.testing.assert_allclose(got, ref(t), rtol=1e-4, atol=1e-5)  # f32


def test_pchip_monotone_data_stays_monotone():
    x = jnp.asarray(np.arange(8.0))
    y = jnp.asarray([0.0, 0.1, 0.5, 0.9, 1.0, 1.0, 1.0, 1.0])
    t = jnp.asarray(np.linspace(0, 7, 100))
    v = pchip(x, y, t)
    assert np.all(np.diff(np.asarray(v)) >= -1e-7)
    assert float(v.max()) <= 1.0 + 1e-6


def _ref_clock(swing, stance, relaxer, mode, incentive, freq):
    """Reference create_phase_reward via scipy (port of
    phase_function.py:5-136 used only as a test oracle)."""
    from scipy.interpolate import PchipInterpolator

    sw, st = swing * freq, stance * freq
    total = 2 * sw + 2 * st
    osw, ost = sw * relaxer, st * relaxer
    x8 = np.array([osw, sw - osw, sw + ost, sw + st - ost,
                   sw + st + osw, 2 * sw + st - osw,
                   2 * sw + st + ost, total - ost])
    inc = 1.0 if incentive else 0.0
    l_frc = np.zeros(8)
    l_vel = np.zeros(8)
    r_frc = np.zeros(8)
    r_vel = np.zeros(8)
    # right swing
    l_vel[0:2] = -1; r_frc[0:2] = -1; l_frc[0:2] = inc; r_vel[0:2] = inc
    # left swing
    l_frc[4:6] = -1; r_vel[4:6] = -1; l_vel[4:6] = inc; r_frc[4:6] = inc
    for cols in (slice(2, 4), slice(6, 8)):
        if mode == "grounded":
            if incentive:
                l_frc[cols] = r_frc[cols] = 1
                l_vel[cols] = r_vel[cols] = -1
            else:
                l_frc[cols] = -1; r_vel[cols] = -1
                r_frc[cols] = 0; l_vel[cols] = 0
        elif mode == "aerial":
            l_frc[cols] = r_frc[cols] = -1
            if incentive:
                l_vel[cols] = r_vel[cols] = 1
    x24 = np.concatenate([x8 - total, x8, x8 + total])
    mk = lambda y: PchipInterpolator(x24, np.concatenate([y, y, y]))
    return (mk(l_frc), mk(l_vel), mk(r_frc), mk(r_vel)), total


@pytest.mark.parametrize("mode,onehot", [
    ("grounded", STANCE_GROUNDED), ("aerial", STANCE_AERIAL),
    ("zero", STANCE_ZERO)])
@pytest.mark.parametrize("incentive", [True, False])
def test_build_clock_matches_reference_splines(mode, onehot, incentive):
    swing, stance = 0.25, 0.15
    clock = build_clock(jnp.asarray(swing), jnp.asarray(stance), onehot,
                        0.1, incentive, 40.0)
    (l_frc, l_vel, r_frc, r_vel), total = _ref_clock(
        swing, stance, 0.1, mode, incentive, 40.0)
    np.testing.assert_allclose(float(clock.phaselen), total, rtol=1e-6)
    phases = np.linspace(0, total, 50)
    got = np.stack([np.asarray(clock.eval(jnp.asarray(p))) for p in phases])
    want = np.stack([[l_frc(p), l_vel(p), r_frc(p), r_vel(p)]
                     for p in phases])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_speed_to_durations_matches_reference_formula():
    """cassie.py:556-558."""
    for speed in [0.0, 1.0, 2.5, 4.0, -0.3]:
        sw, st = speed_to_durations(jnp.asarray(speed))
        total = (0.9 - 0.25 / 3.0 * abs(speed)) / 2
        np.testing.assert_allclose(
            float(sw), (0.30 + 0.40 / 3 * abs(speed)) * total, rtol=1e-6)
        np.testing.assert_allclose(
            float(st), (0.70 - 0.40 / 3 * abs(speed)) * total, rtol=1e-6)
