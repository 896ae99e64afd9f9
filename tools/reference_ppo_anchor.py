"""Reference-stack PPO on Cassie, measured on THIS host: the 300-iter
reward + wall-clock anchor for the north-star claim (BASELINE.json: "PPO on
Cassie-v0 reaches Apex's 300-iter reward in <=5% of its wall-clock").

The reference itself cannot run here (no ray/gym; its libcassiemujoco.so
dlopens an absent libmujoco200nogl.so), so this reproduces its training
stack faithfully on the pieces that ARE available:

  * physics: 2 kHz MuJoCo PD substeps over the reference cassie.xml under
    the image's mujoco 3.10 (reference cassie/cassie.py:293-351, PD gains
    :57-58) -- the same oracle the golden-transition tests pin our JAX
    engine against;
  * env: Cassie-v0 semantics -- full input profile + clock commands
    (cassie.py:787-859), per-episode speed in [-0.3, 4.0] and PCHIP gait
    clock from speed (cassie.py:528-561, phase_function.py:5-136 via
    scipy), early_clock_reward (clock_rewards.py:119-223), random
    speed/orient command changes (cassie.py:483-491), height termination;
  * learner: torch PPO exactly shaped like rl/algos/ppo.py -- Gaussian FF
    actor 2x256 tanh with normc init + 0.01 mean scale and fixed std
    e^-1.5 (actor.py:142-215), FF critic, MC discounted returns
    (PPOBuffer.finish_path, ppo.py:73-89), advantage normalization,
    3 epochs x minibatch-64 Adam(1e-4), grad clip 0.05, KL stop 0.02,
    mirror-symmetry loss 0.4 (ppo.py:276-345);
  * parallelism: N sampling worker processes merged on the driver
    (sample_parallel, ppo.py:188-237) -- persistent processes over pipes,
    i.e. WITHOUT Ray RPC overhead, so the measured wall-clock is an
    optimistic (lower) bound for the reference.

Writes REFERENCE_CURVE.json + curves/reference_ppo.npz.

Usage: python tools/reference_ppo_anchor.py [--n-itr 300] [--procs 4]
"""
import argparse
import json
import multiprocessing as mp
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

CASSIE_XML = "/root/reference/cassie/cassiemujoco/cassie.xml"

P_GAIN = np.asarray([100.0, 100.0, 88.0, 96.0, 50.0] * 2)
D_GAIN = np.asarray([10.0, 10.0, 8.0, 9.6, 5.0] * 2)
MOTOR_QPOS_IDX = np.asarray([7, 8, 9, 14, 20, 21, 22, 23, 28, 34])
MOTOR_QVEL_IDX = np.asarray([6, 7, 8, 12, 18, 19, 20, 21, 25, 31])
JOINT_QPOS_IDX = np.asarray([15, 16, 20, 29, 30, 34])
JOINT_QVEL_IDX = np.asarray([13, 14, 18, 26, 27, 31])
OFFSET = np.asarray([0.0045, 0.0, 0.4973, -1.1997, -1.5968,
                     0.0045, 0.0, 0.4973, -1.1997, -1.5968])
NEUTRAL_FOOT_ORIENT = np.asarray(
    [-0.24790886454630466, -0.24679713195445646,
     -0.6609396704367185, 0.663921021343526])


def build_clock_np(speed, strict_relaxer=0.1, freq=40.0):
    """create_phase_reward via scipy (reference phase_function.py:5-136),
    zero-stance mode, with-incentive, durations from speed
    (cassie.py:556-558). Returns (splines(4), phaselen)."""
    from scipy.interpolate import PchipInterpolator

    total_duration = (0.9 - 0.25 / 3.0 * abs(speed)) / 2.0
    swing = (0.30 + (0.40 / 3.0) * abs(speed)) * total_duration
    stance = (0.70 - (0.40 / 3.0) * abs(speed)) * total_duration
    sw, st = swing * freq, stance * freq
    total = 2 * sw + 2 * st
    off_sw, off_st = sw * strict_relaxer, st * strict_relaxer
    x8 = np.asarray([0.0 + off_sw, sw - off_sw,
                     sw + off_st, sw + st - off_st,
                     sw + st + off_sw, 2 * sw + st - off_sw,
                     2 * sw + st + off_st, total - off_st])
    x24 = np.concatenate([x8 - total, x8, x8 + total])
    y8 = np.zeros((4, 8))           # [l_frc, l_vel, r_frc, r_vel]
    y8[1, 0:2] = -1.0
    y8[2, 0:2] = -1.0
    y8[0, 0:2] = 1.0
    y8[3, 0:2] = 1.0
    y8[0, 4:6] = -1.0
    y8[3, 4:6] = -1.0
    y8[1, 4:6] = 1.0
    y8[2, 4:6] = 1.0
    y24 = np.concatenate([y8, y8, y8], axis=1)
    splines = [PchipInterpolator(x24, y24[i]) for i in range(4)]
    return splines, total


class RefCassieEnv:
    """Numpy Cassie-v0 (full + clock profile, early_clock reward) over
    mujoco 3.10 -- the reference env semantics without its dead weight."""

    def __init__(self, seed=0):
        import mujoco

        self._mj = mujoco
        self.model = mujoco.MjModel.from_xml_path(CASSIE_XML)
        self.data = mujoco.MjData(self.model)
        self.rng = np.random.default_rng(seed)
        self.gear = self.model.actuator_gear[:, 0].copy()
        lf = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_BODY,
                               "left-foot")
        rf = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_BODY,
                               "right-foot")
        self.foot_ids = (lf, rf)
        self.obs_dim, self.act_dim = 50, 10
        self.simrate = 50

    # -- reference get_full_state (cassie.py:787-859) --
    def get_obs(self):
        q, v = self.data.qpos, self.data.qvel
        phi = 2 * np.pi * self.phase / self.phaselen
        a = self.data.qacc
        return np.concatenate([
            [q[2]], q[3:7], q[MOTOR_QPOS_IDX], v[:3], v[3:6],
            v[MOTOR_QVEL_IDX], a[0:3], q[JOINT_QPOS_IDX],
            v[JOINT_QVEL_IDX],
            [np.sin(phi), np.cos(phi), self.speed, self.side_speed],
        ]).astype(np.float32)

    def reset(self):
        self._mj.mj_resetData(self.model, self.data)
        self.speed = float(self.rng.uniform(-0.3, 4.0))
        self.side_speed = float(self.rng.uniform(-0.3, 0.3))
        self.clock, self.phaselen = build_clock_np(self.speed)
        self.phase = float(np.floor(self.rng.uniform()
                                    * np.floor(self.phaselen + 1)))
        self.prev_action = None
        self.prev_foot = None
        return self.get_obs()

    def _foot_state(self):
        frc = np.zeros(2)
        for i, b in enumerate(self.foot_ids):
            frc[i] = abs(self.data.cfrc_ext[b, 5])
        pos = np.stack([self.data.xpos[b] for b in self.foot_ids])
        quat = np.stack([self.data.xquat[b] for b in self.foot_ids])
        return frc, pos, quat

    def step(self, action):
        target = action + OFFSET
        orient_costs = np.zeros(2)
        prev_pos = (self.prev_foot if self.prev_foot is not None
                    else self._foot_state()[1])
        for _ in range(self.simrate):
            tau = (P_GAIN * (target - self.data.qpos[MOTOR_QPOS_IDX])
                   - D_GAIN * self.data.qvel[MOTOR_QVEL_IDX])
            self.data.ctrl[:] = tau / self.gear
            self._mj.mj_step(self.model, self.data)
        frc, pos, quat = self._foot_state()
        foot_vel = (pos - prev_pos) / (self.simrate * 5e-4)
        self.prev_foot = pos
        for i in range(2):
            orient_costs[i] = 1.0 - np.dot(NEUTRAL_FOOT_ORIENT, quat[i]) ** 2

        self.phase += 1.0
        if self.phase > self.phaselen:
            self.phase = 0.0

        # early_clock_reward (clock_rewards.py:119-223)
        q, v = self.data.qpos, self.data.qvel
        des_frc, des_vel = 350.0, 3.0
        n_frc = np.minimum(frc, des_frc) / des_frc
        n_vel = np.minimum(np.linalg.norm(foot_vel, axis=1),
                           des_vel) / des_vel
        cl = [s(self.phase) for s in self.clock]
        frc_score = (np.tanh(cl[0] * n_frc[0]) + np.tanh(cl[2] * n_frc[1]))
        vel_score = (np.tanh(cl[1] * n_vel[0]) + np.tanh(cl[3] * n_vel[1]))
        com_orient_err = 1.0 * (1.0 - q[3] ** 2)
        foot_orient_err = orient_costs.sum()
        com_vel_err = abs(self.speed - v[0])
        straight = abs(q[1]) if abs(q[1]) >= 0.05 else 0.0
        hdiff = abs(q[2] - 0.9)
        if hdiff < 0.05 + 0.05 * self.speed:
            hdiff = 0.0
        reward = (0.25 * frc_score + 0.35 * vel_score
                  + 0.20 * np.exp(-com_vel_err)
                  + 0.10 * np.exp(-(com_orient_err + foot_orient_err))
                  + 0.10 * np.exp(-(straight + hdiff)))

        # random command changes (cassie.py:483-491)
        if self.rng.integers(100) == 0:
            self.speed = float(np.clip(self.rng.uniform(-0.3, 4.0),
                                       -0.3, 4.0))

        done = q[2] < 0.4 or q[2] > 3.0 or not np.isfinite(q).all()
        return self.get_obs(), float(reward), bool(done)


def make_actor_critic(seed):
    import torch

    torch.manual_seed(seed)

    def normc_(layer, scale=1.0):
        with torch.no_grad():
            w = torch.randn_like(layer.weight)
            w /= w.norm(p=2, dim=1, keepdim=True)   # rows of (out, in)
            layer.weight.copy_(w * scale)
            layer.bias.zero_()

    actor = torch.nn.Sequential(
        torch.nn.Linear(50, 256), torch.nn.Tanh(),
        torch.nn.Linear(256, 256), torch.nn.Tanh(),
        torch.nn.Linear(256, 10))
    critic = torch.nn.Sequential(
        torch.nn.Linear(50, 256), torch.nn.Tanh(),
        torch.nn.Linear(256, 256), torch.nn.Tanh(),
        torch.nn.Linear(256, 1))
    for net in (actor, critic):
        for m in net:
            if isinstance(m, torch.nn.Linear):
                normc_(m)
    normc_(actor[-1], scale=0.01)    # actor.py:175-178
    return actor, critic


def _sampler(conn, seed, steps_per_worker, max_traj, gamma):
    """Persistent sampling worker (reference PPO.sample, ppo.py:139-186)."""
    import torch

    torch.set_num_threads(1)
    env = RefCassieEnv(seed)
    actor, _ = make_actor_critic(seed)
    std = float(np.exp(-1.5))
    norm_mean = np.zeros(50, np.float32)
    norm_std = np.ones(50, np.float32)

    while True:
        msg = conn.recv()
        if msg is None:
            return
        kind = msg[0]
        if kind == "norm":
            norm_mean, norm_std = msg[1], msg[2]
            conn.send("ok")
            continue
        if kind == "prenorm":
            n = msg[1]
            obs_buf = []
            obs = env.reset()
            for _ in range(n):
                a = env.rng.normal(size=10).astype(np.float32)
                obs, _, done = env.step(a)
                obs_buf.append(obs)
                if done:
                    obs = env.reset()
            conn.send(np.asarray(obs_buf))
            continue
        # kind == "sample": msg[1] = actor state_dict, msg[2] deterministic
        actor.load_state_dict(msg[1])
        deterministic = msg[2]
        O, A, R, RET = [], [], [], []
        n = 0
        with torch.no_grad():
            while n < steps_per_worker:
                obs = env.reset()
                ep_o, ep_a, ep_r = [], [], []
                for _ in range(max_traj):
                    no = (obs - norm_mean) / norm_std
                    mu = actor(torch.from_numpy(no)).numpy()
                    a = mu if deterministic else \
                        mu + std * env.rng.normal(size=10).astype(np.float32)
                    obs, r, done = env.step(a)
                    ep_o.append(no)
                    ep_a.append(a)
                    ep_r.append(r)
                    n += 1
                    if done:
                        break
                # finish_path MC returns (ppo.py:73-89)
                ret = np.zeros(len(ep_r), np.float32)
                acc = 0.0
                for i in range(len(ep_r) - 1, -1, -1):
                    acc = ep_r[i] + gamma * acc
                    ret[i] = acc
                O.append(np.asarray(ep_o))
                A.append(np.asarray(ep_a))
                R.append(np.asarray(ep_r))
                RET.append(ret)
        conn.send((np.concatenate(O), np.concatenate(A),
                   np.concatenate(R), np.concatenate(RET),
                   [len(r) for r in R]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-itr", type=int, default=300)
    ap.add_argument("--procs", type=int, default=4)
    ap.add_argument("--num-steps", type=int, default=5096)
    ap.add_argument("--max-traj-len", type=int, default=300)
    ap.add_argument("--prenorm-steps", type=int, default=10000)
    ap.add_argument("--eval-every", type=int, default=10)
    args = ap.parse_args()

    import torch

    torch.set_num_threads(1)
    gamma = 0.99
    per_worker = args.num_steps // args.procs

    ctx = mp.get_context("spawn")
    conns, procs = [], []
    for i in range(args.procs):
        parent, child = ctx.Pipe()
        p = ctx.Process(target=_sampler,
                        args=(child, 100 + i, per_worker,
                              args.max_traj_len, gamma))
        p.start()
        conns.append(parent)
        procs.append(p)

    t_start = time.time()
    # obs-norm prepass (get_normalization_params, normalize.py:35-48)
    for c in conns:
        c.send(("prenorm", args.prenorm_steps // args.procs))
    allobs = np.concatenate([c.recv() for c in conns])
    norm_mean = allobs.mean(axis=0).astype(np.float32)
    norm_std = (allobs.std(axis=0) + 1e-8).astype(np.float32)
    for c in conns:
        c.send(("norm", norm_mean, norm_std))
        c.recv()
    print(f"prenorm done in {time.time() - t_start:.1f}s", flush=True)

    actor, critic = make_actor_critic(0)
    a_opt = torch.optim.Adam(actor.parameters(), lr=1e-4, eps=1e-5)
    c_opt = torch.optim.Adam(critic.parameters(), lr=1e-4, eps=1e-5)
    log_std = torch.full((10,), -1.5)

    # mirror matrices from the same tables our JAX env uses
    from apex_tpu.envs.base import mirror_matrix
    from apex_tpu.envs.cassie import CassieEnv

    jenv = CassieEnv(dynamics_randomization=False, reward="early_clock")
    M_obs = torch.from_numpy(
        np.asarray(mirror_matrix(jenv.mirrored_obs), np.float32))
    M_act = torch.from_numpy(
        np.asarray(mirror_matrix(jenv.mirrored_acts), np.float32))

    iters, walls, steps_l, train_rets, eval_rets, eval_lens = \
        [], [], [], [], [], []
    total_steps = 0
    for itr in range(args.n_itr):
        sd = {k: v.cpu() for k, v in actor.state_dict().items()}
        for c in conns:
            c.send(("sample", sd, False))
        obs_l, act_l, rew_l, ret_l, lens = [], [], [], [], []
        for c in conns:
            o, a, r, ret, ln = c.recv()
            obs_l.append(o)
            act_l.append(a)
            rew_l.append(r)
            ret_l.append(ret)
            lens += ln
        obs = torch.from_numpy(np.concatenate(obs_l))
        act = torch.from_numpy(np.concatenate(act_l))
        ret = torch.from_numpy(np.concatenate(ret_l))
        total_steps += obs.shape[0]

        with torch.no_grad():
            values = critic(obs).squeeze(-1)
            adv = ret - values
            adv = (adv - adv.mean()) / (adv.std() + 1e-5)
            old_mu = actor(obs)
            old_logp = (-0.5 * ((act - old_mu) / log_std.exp()) ** 2
                        - log_std).sum(-1)

        # 3 epochs x minibatch 64 (ppo.py:407-451)
        n = obs.shape[0]
        stop = False
        for _ in range(3):
            if stop:
                break
            perm = torch.randperm(n)
            for mb in perm.split(64):
                o, a2, r2, ad, lp = (obs[mb], act[mb], ret[mb], adv[mb],
                                     old_logp[mb])
                mu = actor(o)
                logp = (-0.5 * ((a2 - mu) / log_std.exp()) ** 2
                        - log_std).sum(-1)
                ratio = (logp - lp).exp()
                l1 = ratio * ad
                l2 = torch.clamp(ratio, 0.8, 1.2) * ad
                actor_loss = -torch.min(l1, l2).mean()
                # mirror loss with half-period clock flip
                # (ppo.py:301-320, wrappers.py:59-67)
                mo = o @ M_obs
                mo = torch.cat([mo[:, :46], -mo[:, 46:48], mo[:, 48:]], 1)
                mirror_loss = 0.4 * ((actor(mo) @ M_act - mu) ** 2).mean()
                critic_loss = ((critic(o).squeeze(-1) - r2) ** 2).mean()
                a_opt.zero_grad()
                (actor_loss + mirror_loss).backward()
                torch.nn.utils.clip_grad_norm_(actor.parameters(), 0.05)
                a_opt.step()
                c_opt.zero_grad()
                critic_loss.backward()
                torch.nn.utils.clip_grad_norm_(critic.parameters(), 0.05)
                c_opt.step()
                with torch.no_grad():
                    kl = (lp - logp).mean().item()
                if kl > 0.02:
                    stop = True
                    break

        wall = time.time() - t_start
        mean_traj_ret = float(ret.mean())
        if itr % args.eval_every == 0 or itr == args.n_itr - 1:
            sd = {k: v.cpu() for k, v in actor.state_dict().items()}
            for c in conns:
                c.send(("sample", sd, True))
            ev_ret, ev_len = [], []
            for c in conns:
                _o, _a, r, _ret, ln = c.recv()
                idx = 0
                for L in ln:
                    ev_ret.append(float(np.sum(r[idx:idx + L])))
                    ev_len.append(L)
                    idx += L
            er, el = float(np.mean(ev_ret)), float(np.mean(ev_len))
            iters.append(itr)
            walls.append(wall)
            steps_l.append(total_steps)
            train_rets.append(mean_traj_ret)
            eval_rets.append(er)
            eval_lens.append(el)
            print(f"itr {itr:4d} | wall {wall:8.1f}s | "
                  f"steps {total_steps / 1e6:5.2f}M | eval {er:8.2f} "
                  f"(len {el:5.1f})", flush=True)

    for c in conns:
        c.send(None)
    for p in procs:
        p.join()

    out = pathlib.Path(__file__).resolve().parent.parent
    (out / "curves").mkdir(exist_ok=True)
    np.savez(out / "curves" / "reference_ppo.npz",
             iters=np.asarray(iters), wall_s=np.asarray(walls),
             env_steps=np.asarray(steps_l),
             train_return=np.asarray(train_rets),
             eval_return=np.asarray(eval_rets),
             eval_len=np.asarray(eval_lens))
    summary = {
        "n_itr": args.n_itr, "procs": args.procs,
        "num_steps_per_iter": args.num_steps,
        "total_env_steps": total_steps,
        "wall_s": round(walls[-1], 1),
        "env_steps_per_s": round(total_steps / walls[-1], 1),
        "eval_return_300itr": round(eval_rets[-1], 2),
        "eval_return_max": round(float(np.max(eval_rets)), 2),
        "eval_len_max": round(float(np.max(eval_lens)), 1),
        "note": ("reference-shaped torch PPO (rl/algos/ppo.py defaults, "
                 "early_clock reward, mirror loss) on mujoco 3.10 over the "
                 "reference cassie.xml; persistent workers, no Ray "
                 "overhead -- wall-clock is a LOWER bound for the "
                 "reference"),
    }
    (out / "REFERENCE_CURVE.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
