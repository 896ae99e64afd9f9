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
