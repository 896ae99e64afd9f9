"""Whole-substep Pallas kernel generator (physics/fleet_kernel.py) vs the
per-env engine, on models small enough to compile on XLA:CPU in seconds.

The Cassie-sized kernel (~70k eqns) is impractical to compile on the 2-vCPU
CI host; its parity on real TPU is driven by tools/check_megakernel.py
(qpos 4e-7 / qvel 2e-3 / qacc 4.0 abs vs the fleet path, measured on v5e).
These tests pin the GENERATOR's math -- tree-sparse LTDL factorization and
solves, RNEA/CRBA recursions, penalty contacts, integration -- through the
emulated (plain-array) execution path, which runs the identical generated
graph without Mosaic.
"""
import jax
import jax.numpy as jnp
import numpy as np

from apex_tpu.physics import fleet_kernel
from apex_tpu.physics.engine import PhysParams
from apex_tpu.physics.engine import _step_single
from apex_tpu.physics.mjcf import parse_mjcf_string

from tests.test_physics import BALL_DROP_XML, DOUBLE_PENDULUM_XML


def _run_kernel(model, qpos_b, qvel_b):
    B = qpos_b.shape[0]
    params = PhysParams.from_model(model)
    to_bt = lambda x: jnp.moveaxis(x, 0, -1)
    params_bt = jax.tree_util.tree_map(
        lambda x: to_bt(jnp.tile(x, (B,) + (1,) * jnp.ndim(x))), params)
    cmd_rows = jnp.zeros((5 * model.nu, B))
    qpos2, qvel2, qacc2, _ = jax.jit(
        lambda p, q, v, cd: fleet_kernel.emulated_pd_substep(
            model, p, q, v, cd)
    )(params_bt, to_bt(qpos_b), to_bt(qvel_b), cmd_rows)

    outs = []
    for i in range(B):
        out = jax.jit(lambda q, v: _step_single(
            model, params, q, v, jnp.zeros(model.nu)))(qpos_b[i], qvel_b[i])
        outs.append(out)
    qpos_ref = np.stack([np.asarray(o.qpos) for o in outs])
    qvel_ref = np.stack([np.asarray(o.qvel) for o in outs])
    qacc_ref = np.stack([np.asarray(o.qacc) for o in outs])
    return (np.asarray(qpos2).T, np.asarray(qvel2).T, np.asarray(qacc2).T,
            qpos_ref, qvel_ref, qacc_ref)


def test_kernel_double_pendulum_matches_engine():
    """Unconstrained chain: FK + CRBA + RNEA + LTDL solve path."""
    model = parse_mjcf_string(DOUBLE_PENDULUM_XML)
    B = 3
    rng = np.random.default_rng(0)
    qpos = jnp.asarray(rng.normal(0, 0.5, (B, model.nq)).astype(np.float32))
    qvel = jnp.asarray(rng.normal(0, 0.5, (B, model.nv)).astype(np.float32))
    qp, qv, qa, qp_r, qv_r, qa_r = _run_kernel(model, qpos, qvel)
    np.testing.assert_allclose(qp, qp_r, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(qv, qv_r, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(qa, qa_r, rtol=1e-3, atol=1e-2)


def test_kernel_ball_drop_contact_matches_engine():
    """Penalty contact branch (sphere on plane) incl. the per-body spatial
    Delassus computed via sparse solves."""
    model = parse_mjcf_string(BALL_DROP_XML)
    B = 4
    rng = np.random.default_rng(1)
    # free joint: 3 slides + ball quat. One ball in flight, one resting
    # at contact depth, two brushing the surface.
    pos = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 0.0999],
                    [0.1, -0.2, 0.1004], [0.0, 0.3, 0.1001]])
    quat = rng.normal(0, 1, (B, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    qpos = jnp.asarray(np.concatenate([pos, quat], axis=1)[:, :model.nq]
                       .astype(np.float32))
    qvel = jnp.asarray((0.1 * rng.normal(0, 1, (B, model.nv))).astype(
        np.float32))
    qp, qv, qa, qp_r, qv_r, qa_r = _run_kernel(model, qpos, qvel)
    np.testing.assert_allclose(qp, qp_r, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(qv, qv_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(qa, qa_r, rtol=1e-3, atol=1e-1)


def test_kernel_hfield_contact_matches_engine():
    """Heightfield contact branch: the kernel's gather-free tent-weight
    bilinear lookup (h, dhdx, dhdy + tilted normal) must match the per-env
    engine's hfield_lookup path (engine.py:99-118, :615-624) including the
    per-env hfield_active select."""
    import dataclasses

    from apex_tpu.utils.terrain import noise_hfield

    model = dataclasses.replace(parse_mjcf_string(BALL_DROP_XML),
                                enable_hfield=True)
    B = 4
    rng = np.random.default_rng(2)
    pos = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 0.0999],
                    [0.4, -0.7, 0.15], [-1.3, 0.9, 0.12]])
    quat = rng.normal(0, 1, (B, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    qpos_b = jnp.asarray(np.concatenate([pos, quat], axis=1)[:, :model.nq]
                         .astype(np.float32))
    qvel_b = jnp.asarray((0.1 * rng.normal(0, 1, (B, model.nv))).astype(
        np.float32))

    params = PhysParams.from_model(model)
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    hfs = jax.vmap(lambda k: noise_hfield(k, amplitude=0.08))(keys)
    active = jnp.asarray([1.0, 1.0, 1.0, 0.0])   # env 3 exercises the
    # plane fallback select inside an hfield-enabled model

    to_bt = lambda x: jnp.moveaxis(x, 0, -1)
    params_bt = jax.tree_util.tree_map(
        lambda x: to_bt(jnp.tile(x, (B,) + (1,) * jnp.ndim(x))), params)
    params_bt = params_bt.replace(hfield=to_bt(hfs), hfield_active=active)
    cmd_rows = jnp.zeros((5 * model.nu, B))
    qpos2, qvel2, qacc2, _ = jax.jit(
        lambda p, q, v, cd: fleet_kernel.emulated_pd_substep(
            model, p, q, v, cd)
    )(params_bt, to_bt(qpos_b), to_bt(qvel_b), cmd_rows)

    for i in range(B):
        params_i = params.replace(hfield=hfs[i], hfield_active=active[i])
        out = jax.jit(lambda q, v, p: _step_single(
            model, p, q, v, jnp.zeros(model.nu)))(qpos_b[i], qvel_b[i],
                                                  params_i)
        np.testing.assert_allclose(np.asarray(qpos2)[:, i],
                                   np.asarray(out.qpos), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(qvel2)[:, i],
                                   np.asarray(out.qvel), rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(qacc2)[:, i],
                                   np.asarray(out.qacc), rtol=1e-3,
                                   atol=1e-1)


def test_pd_indices_match_cassie_motor_maps():
    """The kernel derives PD q/qd indices from the actuators' joints; for
    Cassie these must equal the cassie_sim MOTOR index tables."""
    from apex_tpu.physics.cassie_sim import (MOTOR_QPOS_IDX, MOTOR_QVEL_IDX,
                                             cassie_model)

    m = cassie_model()
    mqpos = [m.joints[a.joint].qposadr for a in m.actuators]
    mqvel = [m.joints[a.joint].dofadr for a in m.actuators]
    assert mqpos == list(MOTOR_QPOS_IDX)
    assert mqvel == list(MOTOR_QVEL_IDX)
