"""Drive the whole-substep Pallas kernel (physics/fleet_kernel.py) on the
real TPU: compile, compare one substep against the batch-last fleet path
(same tolerances as tests/test_fleet_parity.py), then measure the honest
per-substep cost as the slope of a dependency-chained scan.

Usage: python tools/check_megakernel.py [batch] [--hfield]
  --hfield uses the hfield-enabled Cassie model with per-env noise
  terrain active (the kernel's tent-weight bilinear contact branch).
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from apex_tpu.physics import fleet, fleet_kernel
from apex_tpu.physics.cassie_sim import (CASSIE_QPOS_INIT, PDCommand,
                                         cassie_model)
from apex_tpu.physics.engine import PhysParams

HFIELD = "--hfield" in sys.argv
argv = [a for a in sys.argv[1:] if not a.startswith("--")]
B = int(argv[0]) if argv else 256
m = cassie_model(enable_hfield=HFIELD)
params = PhysParams.from_model(m)
rng = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(rng, 3)
qpos = jnp.tile(jnp.asarray(CASSIE_QPOS_INIT), (B, 1))
qpos = qpos + 0.005 * jax.random.normal(k1, (B, m.nq))
for j in m.joints:
    if j.jtype.name == "BALL":
        qq = qpos[:, j.qposadr:j.qposadr + 4]
        qpos = qpos.at[:, j.qposadr:j.qposadr + 4].set(
            qq / jnp.linalg.norm(qq, axis=1, keepdims=True))
qvel = 0.05 * jax.random.normal(k2, (B, m.nv))
targets = 0.05 * jax.random.normal(k3, (B, 10))
cmd_b = jax.vmap(PDCommand.from_targets)(targets)
to_bt = lambda x: jnp.moveaxis(x, 0, -1)
params_bt = jax.tree_util.tree_map(
    lambda x: to_bt(jnp.tile(x, (B,) + (1,) * jnp.ndim(x))), params)
if HFIELD:
    from apex_tpu.utils.terrain import noise_hfield

    hfs = jax.vmap(lambda k: noise_hfield(k, amplitude=0.06))(
        jax.random.split(jax.random.PRNGKey(5), B))
    params_bt = params_bt.replace(hfield=to_bt(hfs),
                                  hfield_active=jnp.ones(B))
cmd_rows = jnp.concatenate([
    to_bt(cmd_b.p_target), to_bt(cmd_b.d_target), to_bt(cmd_b.p_gain),
    to_bt(cmd_b.d_gain), to_bt(cmd_b.ff_torque)], axis=0)
qpos_bt, qvel_bt = to_bt(qpos), to_bt(qvel)

print("compiling megakernel...", flush=True)
t0 = time.time()
f = jax.jit(lambda p, q, v, c: fleet_kernel.pallas_pd_substep(
    m, p, q, v, c, block_b=min(B, 512)))
out = f(params_bt, qpos_bt, qvel_bt, cmd_rows)
jax.block_until_ready(out)
print(f"compile+run {time.time() - t0:.1f}s", flush=True)

# fleet reference
def fleet_sub(p, q, v, c):
    mq = jnp.asarray([7, 8, 9, 14, 20, 21, 22, 23, 28, 34])
    mv = jnp.asarray([6, 7, 8, 12, 18, 19, 20, 21, 25, 31])
    gear = jnp.asarray([a.gear for a in m.actuators])[:, None]
    tau = (c[20:30] * (c[0:10] - q[mq]) + c[30:40] * (c[10:20] - v[mv])
           + c[40:50])
    ctrl = tau / gear
    dyn, contact, qp2, qv2, qa2, at = fleet.fleet_step(m, p, q, v, ctrl)
    return qp2, qv2, qa2, contact, at

ref = jax.jit(fleet_sub)(params_bt, qpos_bt, qvel_bt, cmd_rows)
jax.block_until_ready(ref)

qpos2, qvel2, qacc2, diag = out
for name, a, b, tol in (
        ("qpos", qpos2, ref[0], 2e-5),
        ("qvel", qvel2, ref[1], 2e-2),
        ("qacc", qacc2, ref[2], 60.0)):
    d = float(jnp.abs(a - b).max())
    print(f"{name:6s} maxdiff {d:.3e} (tol {tol})", flush=True)
    assert d < tol, name
lf = [i for i, cn in enumerate(m.contacts) if cn.group == 0]
l_frc_ref = sum(ref[3].force[i, 2] for i in lf)
d = float(jnp.abs(diag[0] - l_frc_ref).max())
print(f"l_frc  maxdiff {d:.3e}", flush=True)
assert d < 2.0
print("TPU MEGAKERNEL PARITY OK", flush=True)

# timing: chained scan slope
def make(n):
    def run():
        def body(c_, _):
            qp, qv = c_
            qp2, qv2, _, _ = fleet_kernel.pallas_pd_substep(
                m, params_bt, qp, qv, cmd_rows, block_b=min(B, 512))
            return (qp2, qv2), None
        (qp, qv), _ = jax.lax.scan(body, (qpos_bt, qvel_bt), None, length=n)
        return jnp.sum(qp) + jnp.sum(qv)
    return run

f10 = jax.jit(make(10)); f210 = jax.jit(make(210))
float(f10()); float(f210())
ts = []
for f_, n in ((f10, 10), (f210, 210)):
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(f_())
        best = min(best, time.perf_counter() - t0)
    ts.append(best)
per = (ts[1] - ts[0]) / 200
print(f"megakernel: {per*1e6:.1f} us/substep @B={B} "
      f"-> {B/(per*50):,.0f} env-steps/s", flush=True)
