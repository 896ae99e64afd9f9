"""Convert the reference's binary data assets into framework-native .npz.

Assets converted (all pure data -- robot trajectories recorded from
Agility's controller, ASLIP gait libraries, IK-net weights, mission
waypoint command schedules):
  * cassie/trajectory/stepdata.bin, more-poses-trial.bin
    (Agility 2 kHz logs: time/qpos/qvel/torque/mpos/mvel,
     reference trajectory/trajectory.py:7-27)
  * cassie/trajectory/aslipTrajsTaskSpace/walkCycle_<speed>.pkl (21 speeds)
  * cassie/trajectory/ikNet_state_dict.pt (9->35 MLP weights)
  * cassie/missions/<name>/command_trajectory.pkl (speed/orient schedules)

Usage: python tools/gen_data_assets.py [reference-root]
"""
import os
import pickle
import sys

import numpy as np

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "apex_tpu", "data")


def convert_agility_traj(name, path):
    n = 1 + 35 + 32 + 10 + 10 + 10
    data = np.fromfile(path, dtype=np.double).reshape((-1, n))
    np.savez_compressed(
        os.path.join(OUT, f"{name}.npz"),
        time=data[:, 0].astype(np.float32),
        qpos=data[:, 1:36].astype(np.float32),
        qvel=data[:, 36:68].astype(np.float32),
        torque=data[:, 68:78].astype(np.float32),
        mpos=data[:, 78:88].astype(np.float32),
        mvel=data[:, 88:98].astype(np.float32))
    print(f"{name}: {data.shape[0]} samples")


def convert_aslip():
    d = os.path.join(REF, "cassie/trajectory/aslipTrajsTaskSpace")
    speeds = [round(0.1 * i, 1) for i in range(0, 21)]
    out = {}
    for s in speeds:
        with open(os.path.join(d, f"walkCycle_{s}.pkl"), "rb") as f:
            traj = pickle.load(f)
        for k, v in traj.items():
            if isinstance(v, np.ndarray):
                out[f"s{s}_{k}"] = v.astype(np.float32)
            # pos_f_interp (a scipy interp1d over rpos/lpos/cpos) is
            # reconstructable from the arrays; skip the pickled object
    np.savez_compressed(os.path.join(OUT, "aslip_trajs.npz"), **out)
    print(f"aslip: {len(speeds)} speeds, keys per speed: "
          f"{sorted(set(k.split('_', 1)[1] for k in out))}")


def convert_iknet():
    import torch

    sd = torch.load(os.path.join(REF, "cassie/trajectory/ikNet_state_dict.pt"),
                    map_location="cpu", weights_only=True)
    out = {k: v.numpy().astype(np.float32) for k, v in sd.items()}
    np.savez_compressed(os.path.join(OUT, "iknet.npz"), **out)
    print("iknet layers:", list(out))


def convert_missions():
    """default has a single command_trajectory.pkl; the others carry one per
    commanded speed {0.5, 0.9, 1.4, 1.9, 2.3, 2.8} (mission dirs in the
    reference tree)."""
    import glob

    for name in ("default", "straight", "curvy", "90_left", "90_right"):
        mdir = os.path.join(REF, "cassie/missions", name)
        for p in sorted(glob.glob(os.path.join(mdir, "command_trajectory*.pkl"))):
            suffix = os.path.basename(p)[len("command_trajectory"):-4]
            with open(p, "rb") as f:
                d = pickle.load(f)
            np.savez_compressed(
                os.path.join(OUT, f"mission_{name}{suffix}.npz"),
                compos=np.asarray(d["compos"], np.float32),
                speed=np.asarray(d["speed"], np.float32),
                orient=np.asarray(d["orient"], np.float32))
            print(f"mission {name}{suffix}: {len(d['speed'])} steps")


def convert_reward_clocks(grid_n=512, lo=-5.0, hi=45.0):
    """Sample the 18 precomputed PCHIP reward-clock pickles
    (cassie/rewards/reward_clock_funcs/) onto dense phase grids.

    plain pickles -> (4, grid_n) channels [l_frc, l_vel, r_frc, r_vel];
    aslip-style -> (21, 4, grid_n)."""
    import glob

    import glob as _glob
    from scipy.interpolate import PPoly

    def ev(spline, t):
        # the pickles carry PchipInterpolator objects from an old scipy;
        # rebuild a PPoly from the private knot/coefficient arrays
        pp = PPoly(np.asarray(spline._c), np.asarray(spline._x))
        return pp(np.clip(t, pp.x[0], pp.x[-1]))

    d = os.path.join(REF, "cassie/rewards/reward_clock_funcs")
    grid = np.linspace(lo, hi, grid_n)
    out = {"__grid_lo": np.float32(lo), "__grid_hi": np.float32(hi)}
    for p in sorted(_glob.glob(os.path.join(d, "*.pkl"))):
        name = os.path.basename(p)[:-4]
        with open(p, "rb") as f:
            clk = pickle.load(f)
        left, right = clk["left"], clk["right"]
        if isinstance(left[0], list):      # per-speed (aslip) library
            tab = np.stack([
                np.stack([ev(l[0], grid), ev(l[1], grid),
                          ev(r[0], grid), ev(r[1], grid)])
                for l, r in zip(left, right)])
        else:
            tab = np.stack([ev(left[0], grid), ev(left[1], grid),
                            ev(right[0], grid), ev(right[1], grid)])
        out[name] = tab.astype(np.float32)
        print(f"reward clock {name}: {tab.shape}")
    np.savez_compressed(os.path.join(OUT, "reward_clocks.npz"), **out)


def main():
    os.makedirs(OUT, exist_ok=True)
    convert_reward_clocks()
    convert_agility_traj("traj_walking",
                         os.path.join(REF, "cassie/trajectory/stepdata.bin"))
    convert_agility_traj(
        "traj_stepping",
        os.path.join(REF, "cassie/trajectory/more-poses-trial.bin"))
    convert_aslip()
    convert_iknet()
    convert_missions()


if __name__ == "__main__":
    main()
