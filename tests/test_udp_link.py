"""Native UDP link: loopback round-trip of PD and state packets."""
import shutil

import numpy as np
import pytest

g_pp = shutil.which("g++")


@pytest.mark.skipif(g_pp is None, reason="no C++ toolchain")
def test_udp_loopback_roundtrip():
    from apex_tpu.runtime.udp_link import (
        CassieUdp, PD_FLOATS, RobotSideLink, STATE_FLOATS)

    operator = CassieUdp(remote_addr="127.0.0.1", remote_port=35000,
                         local_addr="127.0.0.1", local_port=35001)
    robot = RobotSideLink(local_addr="127.0.0.1", local_port=35000,
                          remote_addr="127.0.0.1", remote_port=35001)
    try:
        pd = np.arange(PD_FLOATS, dtype=np.float32)
        operator.send_pd(pd)
        assert robot.wait(2000)
        got = robot.recv_newest_pd()
        assert got is not None
        np.testing.assert_allclose(got, pd)

        state = np.linspace(0, 1, STATE_FLOATS).astype(np.float32)
        robot.send_state(state)
        assert operator.wait(2000)
        got = operator.recv_newest()
        assert got is not None
        np.testing.assert_allclose(got, state)

        # sequence tracking advances
        operator.send_pd(pd)
        operator.send_pd(pd)
        assert operator.info.seq_num_out >= 3
    finally:
        operator.close()
        robot.close()


def test_agility_wire_codec_roundtrip():
    """pd_in_t / state_out_t packing: exact packed lengths (reference
    PD_IN_T_PACKED_LEN=476, STATE_OUT_T_PACKED_LEN=493) and field-exact
    roundtrips."""
    import numpy as np

    from apex_tpu.runtime import agility_wire as aw

    rng = np.random.default_rng(0)
    pd = aw.PdIn.from_targets(rng.standard_normal(10).astype(np.float32),
                              ff_torque10=rng.standard_normal(10)
                              .astype(np.float32))
    pd.telemetry = rng.standard_normal(9).astype(np.float32)
    data = aw.pack_pd_in(pd)
    assert len(data) == aw.PD_IN_PACKED_LEN == 476
    pd2 = aw.unpack_pd_in(data)
    np.testing.assert_array_equal(pd2.left.p_target, pd.left.p_target)
    np.testing.assert_array_equal(pd2.right.d_gain, pd.right.d_gain)
    np.testing.assert_array_equal(pd2.left.torque, pd.left.torque)
    np.testing.assert_array_equal(pd2.telemetry, pd.telemetry)

    foot = lambda: aw.StateFoot(
        position=rng.standard_normal(3).astype(np.float32),
        orientation=rng.standard_normal(4).astype(np.float32),
        rotational_velocity=rng.standard_normal(3).astype(np.float32),
        translational_velocity=rng.standard_normal(3).astype(np.float32),
        toe_force=rng.standard_normal(3).astype(np.float32),
        heel_force=rng.standard_normal(3).astype(np.float32))
    so = aw.StateOut(
        pelvis_position=rng.standard_normal(3).astype(np.float32),
        pelvis_orientation=rng.standard_normal(4).astype(np.float32),
        pelvis_rotational_velocity=rng.standard_normal(3).astype(np.float32),
        pelvis_translational_velocity=rng.standard_normal(3)
        .astype(np.float32),
        pelvis_translational_acceleration=rng.standard_normal(3)
        .astype(np.float32),
        pelvis_external_moment=rng.standard_normal(3).astype(np.float32),
        pelvis_external_force=rng.standard_normal(3).astype(np.float32),
        left_foot=foot(), right_foot=foot(),
        terrain_height=0.125, terrain_slope=np.asarray([0.01, -0.02],
                                                       np.float32),
        motor_position=rng.standard_normal(10).astype(np.float32),
        motor_velocity=rng.standard_normal(10).astype(np.float32),
        motor_torque=rng.standard_normal(10).astype(np.float32),
        joint_position=rng.standard_normal(6).astype(np.float32),
        joint_velocity=rng.standard_normal(6).astype(np.float32),
        radio_channel=rng.standard_normal(16).astype(np.float32),
        radio_signal_good=True,
        battery_state_of_charge=0.875, battery_current=3.5)
    data = aw.pack_state_out(so)
    assert len(data) == aw.STATE_OUT_PACKED_LEN == 493
    so2 = aw.unpack_state_out(data)
    np.testing.assert_array_equal(so2.motor_position, so.motor_position)
    np.testing.assert_array_equal(so2.left_foot.toe_force,
                                  so.left_foot.toe_force)
    np.testing.assert_array_equal(so2.right_foot.orientation,
                                  so.right_foot.orientation)
    assert so2.radio_signal_good is True
    assert so2.battery_state_of_charge == 0.875
    assert so2.terrain_height == 0.125


def test_agility_wire_over_udp():
    """Full loopback with the Agility framing: operator sends pd_in_t
    packets (2 + 476 B), robot side replies with state_out_t (2 + 493 B),
    header seq/delay tracking live (reference CassieUdp.send_pd /
    recv_newest_pd, cassiemujoco.py:428-482)."""
    import numpy as np

    from apex_tpu.runtime import agility_wire as aw
    from apex_tpu.runtime.udp_link import CassieUdp, RobotSideLink

    op = CassieUdp(remote_addr="127.0.0.1", remote_port=25103,
                   local_addr="127.0.0.1", local_port=25104)
    robot = RobotSideLink(local_addr="127.0.0.1", local_port=25103,
                          remote_addr="127.0.0.1", remote_port=25104)
    try:
        targets = np.linspace(-1, 1, 10).astype(np.float32)
        op.send_pd_t(targets)
        assert robot.wait(timeout_ms=2000)
        pd = robot.recv_newest_pd_agility()
        assert pd is not None
        np.testing.assert_allclose(
            np.concatenate([pd.left.p_target, pd.right.p_target]), targets)

        from apex_tpu.physics.cassie_sim import (CassiePhysState,
                                                 cassie_model, estimate_state,
                                                 static_diag)
        from apex_tpu.physics.engine import PhysParams

        m = cassie_model()
        phys = CassiePhysState.standing()
        est = estimate_state(m, phys,
                             static_diag(m, PhysParams.from_model(m), phys))
        so = aw.state_out_from_estimator(est)
        robot.send_state_t(so)
        assert op.wait(timeout_ms=2000)
        got = op.recv_newest_pd_t()
        assert got is not None
        np.testing.assert_allclose(got.motor_position,
                                   np.asarray(est.motor_position), rtol=1e-6)
        assert got.radio_signal_good
    finally:
        op.close()
        robot.close()
