"""Fleet (batch-last) physics vs the per-env engine: vmap(engine.step)
dispatches to physics/fleet.py through a custom batching rule; these tests
pin that the rerouted fleet computes the same physics as the per-env
pipeline (same math, different layout -- only fp reassociation noise is
allowed)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apex_tpu.physics import engine
from apex_tpu.physics.cassie_sim import CassiePhysState, cassie_model
from apex_tpu.physics.engine import PhysParams


def _rand_cassie_batch(B, key):
    m = cassie_model()
    k1, k2, k3 = jax.random.split(key, 3)
    qpos = jnp.tile(jnp.asarray(CassiePhysState.standing().qpos), (B, 1))
    qpos = qpos + 0.01 * jax.random.normal(k1, (B, m.nq))
    # renormalize the ball-joint quaternions after perturbation
    for j in m.joints:
        if j.jtype.name == "BALL":
            q = qpos[:, j.qposadr:j.qposadr + 4]
            qpos = qpos.at[:, j.qposadr:j.qposadr + 4].set(
                q / jnp.linalg.norm(q, axis=1, keepdims=True))
    qvel = 0.1 * jax.random.normal(k2, (B, m.nv))
    ctrl = 0.3 * jax.random.normal(k3, (B, m.nu))
    return m, qpos, qvel, ctrl


def _batch_params(params, B):
    return jax.tree_util.tree_map(
        lambda x: jnp.tile(x, (B,) + (1,) * jnp.ndim(x)), params)


def _assert_stepout_close(a, b):
    """Per-field tolerances. Kinematic quantities must match to f32
    rounding; velocity-level outputs pass through (M + hD)^-1 whose
    condition number (~1e5 from the Cassie mass ratios) amplifies the
    layout-dependent f32 reassociation noise -- measured: M matches to
    5e-7 abs while Minv entries (magnitude up to 1e5) differ by ~2e-2 rel,
    so qvel/qacc/forces get correspondingly loose bounds. Oracle accuracy
    is pinned separately by tests/test_golden_mujoco.py."""
    np.testing.assert_allclose(np.asarray(a.qpos), np.asarray(b.qpos),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a.qvel), np.asarray(b.qvel),
                               rtol=5e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(a.qacc), np.asarray(b.qacc),
                               rtol=1e-1, atol=50.0)
    np.testing.assert_allclose(np.asarray(a.contact.force),
                               np.asarray(b.contact.force),
                               rtol=5e-2, atol=1.0)
    np.testing.assert_allclose(np.asarray(a.contact.depth),
                               np.asarray(b.contact.depth),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.contact.pos),
                               np.asarray(b.contact.pos),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.kin.xpos), np.asarray(b.kin.xpos),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.kin.xquat),
                               np.asarray(b.kin.xquat),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.actuator_torque),
                               np.asarray(b.actuator_torque),
                               rtol=1e-5, atol=1e-6)


def test_fleet_matches_per_env_cassie():
    """Full Cassie step (ball joints, loop-closure equalities, contacts,
    limits, springs) through the fleet path == per-env path."""
    B = 5  # odd, non-multiple of anything, exercises padding-free path
    m, qpos, qvel, ctrl = _rand_cassie_batch(B, jax.random.PRNGKey(0))
    params = _batch_params(PhysParams.from_model(m), B)

    out_fleet = jax.jit(jax.vmap(
        lambda p, q, v, u: engine.step(m, p, q, v, u)))(
            params, qpos, qvel, ctrl)
    out_ref = jax.jit(jax.vmap(
        lambda p, q, v, u: engine._step_single(m, p, q, v, u)))(
            params, qpos, qvel, ctrl)
    _assert_stepout_close(out_fleet, out_ref)


def test_fleet_matches_per_env_trajectory():
    """50-substep trajectories stay together (accumulated error bounded)."""
    B = 3
    m, qpos, qvel, ctrl = _rand_cassie_batch(B, jax.random.PRNGKey(1))
    params = _batch_params(PhysParams.from_model(m), B)

    def roll(step_fn):
        def body(c, _):
            qp, qv = c
            o = jax.vmap(lambda p, a, b, u: step_fn(m, p, a, b, u))(
                params, qp, qv, ctrl)
            return (o.qpos, o.qvel), None
        return jax.jit(lambda q, v: jax.lax.scan(
            body, (q, v), None, length=50)[0])

    qf, vf = roll(engine.step)(qpos, qvel)
    qr, vr = roll(engine._step_single)(qpos, qvel)
    # 50 substeps of stiff contact dynamics amplify the per-substep
    # conditioning noise (see _assert_stepout_close); require the
    # trajectories to stay together, not bitwise equal
    np.testing.assert_allclose(np.asarray(qf), np.asarray(qr),
                               rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vr),
                               rtol=2e-1, atol=2e-1)


def test_fleet_matches_per_env_hfield():
    """Heightfield-terrain contact path parity (gathered table lookups)."""
    B = 4
    m, qpos, qvel, ctrl = _rand_cassie_batch(B, jax.random.PRNGKey(2))
    m = dataclasses.replace(m, enable_hfield=True)
    params = _batch_params(PhysParams.from_model(m), B)
    key = jax.random.PRNGKey(3)
    hf = 0.02 * jax.random.normal(key, (B, engine.HFIELD_RES,
                                        engine.HFIELD_RES))
    params = params.replace(hfield=hf, hfield_active=jnp.ones((B,)))

    out_fleet = jax.jit(jax.vmap(
        lambda p, q, v, u: engine.step(m, p, q, v, u)))(
            params, qpos, qvel, ctrl)
    out_ref = jax.jit(jax.vmap(
        lambda p, q, v, u: engine._step_single(m, p, q, v, u)))(
            params, qpos, qvel, ctrl)
    _assert_stepout_close(out_fleet, out_ref)


def test_fleet_matches_per_env_randomized_params():
    """Per-env randomized dynamics params (dyn-rand path: masses, damping,
    friction, floor slope, external wrench) flow through the fleet step."""
    B = 4
    m, qpos, qvel, ctrl = _rand_cassie_batch(B, jax.random.PRNGKey(4))
    params = _batch_params(PhysParams.from_model(m), B)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(5), 4)
    params = params.replace(
        body_mass=params.body_mass * jax.random.uniform(
            k1, params.body_mass.shape, minval=0.5, maxval=1.5),
        dof_damping=params.dof_damping * jax.random.uniform(
            k2, params.dof_damping.shape, minval=0.5, maxval=2.0),
        friction=jax.random.uniform(k3, (B,), minval=0.4, maxval=1.1),
        ext_force=5.0 * jax.random.normal(k4, (B, 6)))

    out_fleet = jax.jit(jax.vmap(
        lambda p, q, v, u: engine.step(m, p, q, v, u)))(
            params, qpos, qvel, ctrl)
    out_ref = jax.jit(jax.vmap(
        lambda p, q, v, u: engine._step_single(m, p, q, v, u)))(
            params, qpos, qvel, ctrl)
    _assert_stepout_close(out_fleet, out_ref)


def test_fleet_walker2d_model():
    """A second model family (Walker2d: slides+hinges, no equalities, no
    ball joints) through the fleet path."""
    from apex_tpu.envs.walker2d import walker_model

    m = walker_model()
    B = 4
    key = jax.random.PRNGKey(6)
    qpos = jnp.tile(jnp.asarray(m.qpos0), (B, 1)) \
        + 0.01 * jax.random.normal(key, (B, m.nq))
    qvel = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (B, m.nv))
    ctrl = 0.3 * jax.random.normal(jax.random.fold_in(key, 2), (B, m.nu))
    params = _batch_params(PhysParams.from_model(m), B)

    out_fleet = jax.jit(jax.vmap(
        lambda p, q, v, u: engine.step(m, p, q, v, u)))(
            params, qpos, qvel, ctrl)
    out_ref = jax.jit(jax.vmap(
        lambda p, q, v, u: engine._step_single(m, p, q, v, u)))(
            params, qpos, qvel, ctrl)
    _assert_stepout_close(out_fleet, out_ref)


def test_pallas_fk_interpret_matches_xla_fk():
    """The Pallas FK kernel (TPU path) in interpret mode == the XLA
    batch-last FK, for Cassie (ball joints) and Walker2d (slides/hinges)."""
    from apex_tpu.physics import fleet
    from apex_tpu.physics.fleet_fk import pallas_fk
    from apex_tpu.envs.walker2d import walker_model

    for model, nq_noise in ((cassie_model(), 0.01), (walker_model(), 0.05)):
        B = 4
        key = jax.random.PRNGKey(11)
        if model is cassie_model():
            qpos = jnp.tile(jnp.asarray(CassiePhysState.standing().qpos),
                            (B, 1))
        else:
            qpos = jnp.tile(jnp.asarray(model.qpos0), (B, 1))
        qpos = (qpos + nq_noise * jax.random.normal(key, (B, model.nq))).T
        ipos = jnp.broadcast_to(jnp.asarray(model.body_ipos)[:, :, None],
                                (model.nbody, 3, B))
        kin = fleet._fk_bt(model, ipos, qpos)
        xpos, ximat, xipos, cdof, origin = pallas_fk(model, ipos, qpos,
                                                     block_b=4,
                                                     interpret=True)
        np.testing.assert_allclose(np.asarray(xpos), np.asarray(kin.xpos),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ximat), np.asarray(kin.ximat),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(xipos), np.asarray(kin.xipos),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cdof), np.asarray(kin.cdof),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(origin),
                                   np.asarray(kin.origin),
                                   rtol=1e-6, atol=1e-7)
