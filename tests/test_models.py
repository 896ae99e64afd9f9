"""Unit tests for networks, distributions, normalizer, and mirror machinery."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apex_tpu.models import (
    DiagGaussian,
    DualQCritic,
    FFV,
    GaussianFFActor,
    GaussianLSTMActor,
    LSTMV,
    NormState,
    normc_init,
)
from apex_tpu.envs.base import mirror_matrix, mirror_clock


def test_normc_columns_unit_norm():
    w = normc_init(jax.random.PRNGKey(0), 64, 32)
    norms = jnp.sqrt(jnp.sum(w * w, axis=0))
    np.testing.assert_allclose(norms, np.ones(32), rtol=1e-5)


def test_gaussian_ff_actor_shapes_and_fixed_std():
    actor = GaussianFFActor.init(jax.random.PRNGKey(0), 10, 4,
                                 fixed_std=float(np.exp(-2)))
    norm = NormState.create(10)
    obs = jax.random.normal(jax.random.PRNGKey(1), (7, 10))
    mean, std = actor.dist(norm, obs)
    assert mean.shape == (7, 4)
    np.testing.assert_allclose(std, np.exp(-2), rtol=1e-6)
    # anneal scales std (reference actor.py:199-201)
    _, std2 = actor.dist(norm, obs, anneal=0.5)
    np.testing.assert_allclose(std2, 0.5 * np.exp(-2), rtol=1e-6)
    # deterministic act returns mean
    a = actor.act(norm, obs, deterministic=True)
    np.testing.assert_allclose(a, mean, rtol=1e-6)


def test_gaussian_ff_actor_learned_std_bounds():
    actor = GaussianFFActor.init(jax.random.PRNGKey(0), 10, 4, fixed_std=None)
    norm = NormState.create(10)
    obs = 100.0 * jax.random.normal(jax.random.PRNGKey(1), (5, 10))
    _, std = actor.dist(norm, obs)
    # sd = exp(-2 + 0.5*tanh(.)) in [exp(-2.5), exp(-1.5)] (actor.py:193)
    assert float(std.min()) >= np.exp(-2.5) - 1e-6
    assert float(std.max()) <= np.exp(-1.5) + 1e-6


def test_norm_state_matches_batch_stats():
    """Parity with reference test_runningmeanstd (normalize.py:210-225)."""
    rng = np.random.RandomState(0)
    for shape in [(), (5,)]:
        x1 = rng.randn(8, *shape).astype(np.float64)
        x2 = rng.randn(9, *shape).astype(np.float64)
        x3 = rng.randn(10, *shape).astype(np.float64)
        dim = int(np.prod(shape)) if shape else 1
        norm = NormState(mean=jnp.zeros(dim), var=jnp.ones(dim),
                         count=jnp.asarray(1e-4))
        for x in (x1, x2, x3):
            norm = norm.update(jnp.asarray(x.reshape(len(x), dim)))
        allx = np.concatenate([x1, x2, x3]).reshape(-1, dim)
        np.testing.assert_allclose(norm.mean, allx.mean(0), atol=1e-4)
        np.testing.assert_allclose(norm.var, allx.var(0), atol=1e-4)


def test_diag_gaussian_matches_torch_semantics():
    mean = jnp.array([0.3, -0.2])
    std = jnp.array([0.5, 2.0])
    x = jnp.array([0.1, 0.4])
    lp = DiagGaussian.log_prob(mean, std, x)
    expected = (
        -0.5 * ((np.array(x) - np.array(mean)) / np.array(std)) ** 2
        - np.log(np.array(std)) - 0.5 * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(lp, expected, rtol=1e-6)
    ent = DiagGaussian.entropy(std)
    np.testing.assert_allclose(
        ent, 0.5 + 0.5 * np.log(2 * np.pi) + np.log(np.array(std)), rtol=1e-6)
    kl_same = DiagGaussian.kl(mean, std, mean, std)
    np.testing.assert_allclose(kl_same, np.zeros(2), atol=1e-7)


def test_dual_q_twin_heads_differ():
    critic = DualQCritic.init(jax.random.PRNGKey(0), 6, 3)
    norm = NormState.create(6)
    obs = jax.random.normal(jax.random.PRNGKey(1), (4, 6))
    act = jax.random.normal(jax.random.PRNGKey(2), (4, 3))
    q1, q2 = critic.q(norm, obs, act)
    assert q1.shape == (4, 1)
    assert not np.allclose(q1, q2)
    np.testing.assert_allclose(critic.q1(norm, obs, act), q1, rtol=1e-6)


def test_lstm_actor_step_vs_seq_consistency():
    """Stepping one-by-one must equal the scanned sequence apply."""
    actor = GaussianLSTMActor.init(jax.random.PRNGKey(0), 8, 3,
                                   fixed_std=float(np.exp(-2)))
    norm = NormState.create(8)
    T, B = 5, 2
    obs_seq = jax.random.normal(jax.random.PRNGKey(1), (T, B, 8))
    mean_seq, _ = actor.seq_dist(norm, obs_seq)

    carry = actor.zero_carry((B,))
    means = []
    for t in range(T):
        carry, (m, _) = actor.step_dist(norm, carry, obs_seq[t])
        means.append(m)
    np.testing.assert_allclose(mean_seq, np.stack(means), rtol=1e-5, atol=1e-6)


def test_lstm_v_shapes():
    critic = LSTMV.init(jax.random.PRNGKey(0), 8)
    norm = NormState.create(8)
    obs_seq = jax.random.normal(jax.random.PRNGKey(1), (6, 3, 8))
    v = critic.seq_value(norm, obs_seq)
    assert v.shape == (6, 3, 1)


def test_mirror_matrix_matches_reference_semantics():
    """mat[i, |m_i|] = sign(m_i) then obs @ M (wrappers.py:70-77)."""
    # cassie action mirror list (cassie.py:69)
    mirrored_acts = [-5, -6, 7, 8, 9, -0.1, -1, 2, 3, 4]
    M = mirror_matrix(mirrored_acts)
    a = np.arange(1.0, 11.0)
    out = a @ M
    # left leg (first 5) swaps with right leg (last 5); roll/yaw negate
    expected = np.array([-6, -7, 8, 9, 10, -1, -2, 3, 4, 5], dtype=np.float64)
    np.testing.assert_allclose(out, expected)
    # involution: applying twice recovers the original
    np.testing.assert_allclose((a @ M) @ M, a)


def test_mirror_clock_flips_sign():
    obs = jnp.array([[0.5, -0.2, 3.0]])
    out = mirror_clock(obs, [0, 1])
    np.testing.assert_allclose(out, [[-0.5, 0.2, 3.0]])
