"""Honest phase-level timing of the batch-last fleet substep.

Remote-backend-proof methodology: every phase is measured as the SLOPE of
a dependency-chained lax.scan (run at two lengths, subtract), and the
result is fetched to host as a scalar -- immune to async-dispatch and
block_until_ready artifacts that made single-call timings meaningless on
the tunneled axon backend.

Usage: python tools/profile_fleet.py [batch]
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from apex_tpu.physics import fleet
from apex_tpu.physics.cassie_sim import (CASSIE_QPOS_INIT, CassiePhysState,
                                         cassie_model)
from apex_tpu.physics.engine import PhysParams


def chain_time(name, make_scan, n_lo=10, n_hi=210, reps=3):
    f_lo = jax.jit(make_scan(n_lo))
    f_hi = jax.jit(make_scan(n_hi))
    float(f_lo())   # compile+warm
    float(f_hi())
    best = []
    for f, n in ((f_lo, n_lo), (f_hi, n_hi)):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f())
            ts.append(time.perf_counter() - t0)
        best.append(min(ts))
    per = (best[1] - best[0]) / (n_hi - n_lo)
    print(f"{name:36s} {per * 1e6:10.2f} us/substep   "
          f"(lo {best[0]*1e3:7.2f} ms, hi {best[1]*1e3:7.2f} ms)",
          flush=True)
    return per


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    m = cassie_model()
    params = PhysParams.from_model(m)
    to_bt = lambda x: jnp.moveaxis(x, 0, -1)
    params_bt = jax.tree_util.tree_map(
        lambda x: to_bt(jnp.tile(x, (B,) + (1,) * jnp.ndim(x))), params)
    rng = jax.random.PRNGKey(0)
    qpos0 = jnp.tile(jnp.asarray(CASSIE_QPOS_INIT)[:, None], (1, B))
    qpos0 = qpos0 + 0.001 * jax.random.normal(rng, qpos0.shape)
    qvel0 = 0.01 * jax.random.normal(rng, (m.nv, B))
    ctrl0 = 0.1 * jax.random.normal(rng, (m.nu, B))

    # --- full substep ---
    def full(n):
        def run():
            def body(c, _):
                qp, qv = c
                _, _, qp2, qv2, _, _ = fleet.fleet_step(
                    m, params_bt, qp, qv, ctrl0)
                return (qp2, qv2), None
            (qp, qv), _ = jax.lax.scan(body, (qpos0, qvel0), None, length=n)
            return jnp.sum(qp) + jnp.sum(qv)
        return run

    # --- FK only ---
    def fk_only(n):
        def run():
            def body(qp, _):
                kin = fleet._fk_bt(m, params_bt.body_ipos, qp)
                bump = 1e-12 * (jnp.sum(kin.xpos, axis=(0, 1))
                                + jnp.sum(kin.cdof[:, 0, :], axis=0))
                return qp + bump[None, :], None
            qp, _ = jax.lax.scan(body, qpos0, None, length=n)
            return jnp.sum(qp)
        return run

    # --- dynamics (FK + inertias + RNEA + CRBA + SPD inverse) ---
    def dyn_only(n):
        def run():
            def body(c, _):
                qp, qv = c
                dyn = fleet._dynamics_bt(m, params_bt, qp, qv)
                qv2 = qv + 1e-12 * (dyn.qfrc_bias
                                    + jnp.sum(dyn.Minv, axis=0))
                return (qp + 1e-12 * qv2[:3].sum(0)[None], qv2), None
            (qp, qv), _ = jax.lax.scan(body, (qpos0, qvel0), None, length=n)
            return jnp.sum(qp) + jnp.sum(qv)
        return run

    # --- dynamics without the SPD inverse ---
    def dyn_no_inv(n):
        import apex_tpu.physics.fleet as fl
        orig = fl._spd_inverse_bt
        def run():
            def body(c, _):
                qp, qv = c
                fl._spd_inverse_bt = lambda A: A   # skip the inverse
                try:
                    dyn = fl._dynamics_bt(m, params_bt, qp, qv)
                finally:
                    fl._spd_inverse_bt = orig
                qv2 = qv + 1e-12 * (dyn.qfrc_bias
                                    + jnp.sum(dyn.Minv, axis=0))
                return (qp + 1e-12 * qv2[:3].sum(0)[None], qv2), None
            (qp, qv), _ = jax.lax.scan(body, (qpos0, qvel0), None, length=n)
            return jnp.sum(qp) + jnp.sum(qv)
        return run

    # --- SPD inverse only ---
    def inv_only(n):
        M0 = jnp.eye(m.nv)[:, :, None] * jnp.ones((1, 1, B))
        M0 = M0 + 0.01 * jnp.ones((m.nv, m.nv, 1))
        def run():
            def body(M, _):
                Minv = fleet._spd_inverse_bt(M)
                return M + 1e-13 * Minv, None
            M, _ = jax.lax.scan(body, M0, None, length=n)
            return jnp.sum(M)
        return run

    t_full = chain_time("full substep", full)
    t_fk = chain_time("FK (pallas)", fk_only)
    t_dyn = chain_time("dynamics (FK+CRBA+RNEA+inv)", dyn_only)
    t_dni = chain_time("dynamics w/o SPD inverse", dyn_no_inv)
    t_inv = chain_time("SPD inverse (pallas)", inv_only)
    print("-" * 60)
    print(f"constraint+integrate (full-dyn):     "
          f"{(t_full - t_dyn) * 1e6:10.2f} us/substep")
    print(f"implied env-steps/s @B={B}: {B / (t_full * 50):,.0f}")


if __name__ == "__main__":
    main()
