"""Generate mission command trajectories from waypoints.

Programmatic replacement for the reference's pygame waypoint-drawing tool
(waypoint_trajectory.py: draw waypoints -> command_trajectory.pkl). Given a
polyline of waypoints and a speed, emits the same schedule the envs consume
(compos / speed / orient per 30 Hz control step) as an apex_tpu mission npz.

Usage:
  python tools/make_mission.py --name zigzag --speed 1.4 \
      --waypoints "0,0 5,0 5,5 10,5"
"""
import argparse
import os

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "apex_tpu", "data")


def build_mission(waypoints: np.ndarray, speed: float, hz: float = 30.0):
    """Constant-speed traversal of the polyline; yaw follows the segment
    headings (matching the reference's mission format: compos cumulative
    displacement, speed_cmd, orient)."""
    pts = np.asarray(waypoints, dtype=np.float64)
    compos, speeds, orients = [], [], []
    pos = pts[0].copy()
    for a, b in zip(pts[:-1], pts[1:]):
        seg = b - a
        dist = np.linalg.norm(seg)
        if dist < 1e-9:
            continue
        heading = np.arctan2(seg[1], seg[0])
        n_steps = max(1, int(round(dist / speed * hz)))
        for i in range(n_steps):
            p = a + seg * (i + 1) / n_steps
            compos.append([p[0] - pts[0][0], p[1] - pts[0][1], 1.0])
            speeds.append(speed)
            orients.append(heading)
    return (np.asarray(compos, np.float32), np.asarray(speeds, np.float32),
            np.asarray(orients, np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True)
    ap.add_argument("--speed", type=float, default=1.0)
    ap.add_argument("--hz", type=float, default=30.0)
    ap.add_argument("--waypoints", required=True,
                    help='space-separated "x,y" pairs')
    args = ap.parse_args()

    pts = np.array([[float(v) for v in w.split(",")]
                    for w in args.waypoints.split()])
    compos, speeds, orients = build_mission(pts, args.speed, args.hz)
    out = os.path.join(OUT_DIR, f"mission_{args.name}.npz")
    np.savez_compressed(out, compos=compos, speed=speeds, orient=orients)
    print(f"wrote {out}: {len(speeds)} steps, "
          f"{len(pts)} waypoints at {args.speed} m/s")


if __name__ == "__main__":
    main()
