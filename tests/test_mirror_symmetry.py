"""Engine-level chirality (mirror-symmetry) tests — VERDICT r4 task 2.

The round-4 5k matrix showed a 7x left/right tilt-terrain pass-rate
asymmetry with no test capable of localizing it. These tests pin the
physics engine itself: starting from the symmetric standing pose, a
rollout driven by a mirrored action sequence on a mirrored floor tilt
must produce the y-plane mirror of the original trajectory.

Derivation notes (probed empirically against the engine's own FK at the
rest pose, residual 0.0):
  * hinge qpos mirror = swap legs with signs [-roll, -yaw, +pitch,
    +knee, +shin, +tarsus, +heel, +crank, +plantar, +foot] — matching
    the reference's motor mirror signs (rl/envs/wrappers.py mirror
    index lists);
  * pelvis pos (x,-y,z), pelvis quat (w,-x,y,-z), floor quat likewise;
  * comparisons avoid the achilles-rod ball quats (their local frames
    are not related by a signed permutation; world-space FK positions of
    the rod-connected bodies cover them instead).

f32 reduction-order noise (sums over dofs/bodies change order under the
leg swap) grows under the stiff 2 kHz dynamics: measured mirror error is
~2e-6 at 10 substeps, ~1e-3 at 200. Tolerances are set ~10x above the
measured envelope; a genuine chirality bug (e.g. a signed term dropped
on one leg, a tilt-sign error in the hfield/floor-quat path) produces
O(1e-1) divergence immediately.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apex_tpu.physics.cassie_sim import (
    CASSIE_QPOS_INIT,
    CassiePhysState,
    NEUTRAL_OFFSET,
    PDCommand,
    cassie_model,
    pd_scan,
)
from apex_tpu.physics.engine import PhysParams, forward_kinematics
from apex_tpu.utils.quaternion import euler2quat

HINGE_L = [7, 8, 9, 14, 15, 16, 17, 18, 19, 20]
HINGE_R = [21, 22, 23, 28, 29, 30, 31, 32, 33, 34]
SGN_H = np.array([-1, -1, 1, 1, 1, 1, 1, 1, 1, 1], float)
MOTOR_SGN = np.array([-1, -1, 1, 1, 1], float)
MIR_POS = np.array([1, -1, 1], float)
MIR_QUAT = np.array([1, -1, 1, -1], float)


def _mirror_action(a):
    return np.concatenate([a[5:10] * MOTOR_SGN, a[0:5] * MOTOR_SGN])


def _rollout(model, params, actions, roll, nsub):
    p = params.replace(floor_quat=euler2quat(
        z=jnp.zeros(()), y=jnp.zeros(()), x=jnp.asarray(roll, jnp.float32)))
    phys = CassiePhysState(
        qpos=jnp.asarray(CASSIE_QPOS_INIT, jnp.float32),
        qvel=jnp.zeros((model.nv,), jnp.float32),
        qacc=jnp.zeros((model.nv,), jnp.float32))
    for a in actions:
        cmd = PDCommand.from_targets(
            jnp.asarray(a + NEUTRAL_OFFSET, jnp.float32))
        phys = pd_scan(model, p, phys, cmd, nsub)[0]
    return phys


def _mirror_errors(model, params, ph1, ph2):
    names = list(model.body_names)
    q1 = np.asarray(ph1.qpos, float)
    q2 = np.asarray(ph2.qpos, float)
    errs = {
        "pelvis_pos": np.abs(q1[0:3] * MIR_POS - q2[0:3]).max(),
        "pelvis_quat": np.abs(q1[3:7] * MIR_QUAT - q2[3:7]).max(),
        "hinges": np.abs(q1[HINGE_L] * SGN_H - q2[HINGE_R]).max(),
    }
    kin1 = forward_kinematics(model, params, jnp.asarray(q1, jnp.float32))
    kin2 = forward_kinematics(model, params, jnp.asarray(q2, jnp.float32))
    xp1, xp2 = np.asarray(kin1.xpos), np.asarray(kin2.xpos)
    fe = 0.0
    for nm in ("left-foot", "left-tarsus", "left-knee",
               "left-achilles-rod"):
        i = names.index(nm)
        j = names.index("right-" + nm[5:])
        fe = max(fe, np.abs(xp1[i] * MIR_POS - xp2[j]).max())
        fe = max(fe, np.abs(xp1[j] * MIR_POS - xp2[i]).max())
    errs["body_world"] = fe
    return errs


@pytest.mark.parametrize("roll_deg", [0.0, 3.0])
def test_engine_mirror_symmetry(roll_deg):
    model = cassie_model()
    params = PhysParams.from_model(model)
    rng = np.random.default_rng(3)
    acts = [rng.normal(0, 0.15, 10) for _ in range(2)]
    roll = np.deg2rad(roll_deg)
    ph1 = _rollout(model, params, acts, roll, 25)
    ph2 = _rollout(model, params, [_mirror_action(a) for a in acts],
                   -roll, 25)
    errs = _mirror_errors(model, params, ph1, ph2)
    # measured envelope at 50 substeps: ~1e-3 max; assert 10x headroom
    for k, v in errs.items():
        assert v < 1e-2, f"chirality violation in {k}: {v:.3e} ({errs})"


def test_engine_mirror_symmetry_short_horizon_tight():
    """10 substeps: before chaos amplification, mirror symmetry must hold
    to ~f32 reduction noise."""
    model = cassie_model()
    params = PhysParams.from_model(model)
    rng = np.random.default_rng(7)
    acts = [rng.normal(0, 0.15, 10)]
    ph1 = _rollout(model, params, acts, 0.0, 10)
    ph2 = _rollout(model, params, [_mirror_action(acts[0])], 0.0, 10)
    errs = _mirror_errors(model, params, ph1, ph2)
    for k, v in errs.items():
        assert v < 1e-3, f"chirality violation in {k}: {v:.3e} ({errs})"
