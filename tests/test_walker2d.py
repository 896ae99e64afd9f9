"""Walker2d env sanity: stands under zero action briefly, obs/reward sane."""
import jax
import jax.numpy as jnp
import numpy as np

from apex_tpu.envs.walker2d import Walker2dEnv


def test_walker_reset_and_step():
    env = Walker2dEnv()
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (17,)
    step = jax.jit(env.step)
    for i in range(5):
        state, obs, reward, term, _ = step(state, jnp.zeros(6),
                                           jax.random.PRNGKey(i))
        assert np.isfinite(float(reward))
        assert np.isfinite(np.asarray(obs)).all()
    # with zero torque the walker is still near standing after 5*4 substeps
    # (0.04 s); height stays in a sane band
    assert 0.8 < float(state.qpos[1]) < 1.5


def test_walker_mirror_involution():
    from apex_tpu.envs.base import mirror_matrix

    env = Walker2dEnv()
    for lst in (env.mirrored_obs, env.mirrored_acts):
        M = mirror_matrix(lst)
        np.testing.assert_allclose(M @ M, np.eye(len(lst)), atol=1e-6)


def test_walker_total_mass_reasonable():
    from apex_tpu.physics.models.walker2d import make_model

    m = make_model()
    total = float(np.sum(m.body_mass))
    # classic walker2d is ~20-60 kg depending on density details
    assert 5.0 < total < 100.0
    assert m.nq == 9 and m.nv == 9 and m.nu == 6


def test_nonfinite_state_terminates():
    """NaN evades range-based termination checks (NaN comparisons are
    False); the isfinite guard must fire so a blown-up env auto-resets
    instead of poisoning the fleet (r4: TD3 random-warmup NaN cascade)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from apex_tpu.envs.walker2d import Walker2dEnv, WalkerState

    env = Walker2dEnv()
    st, _ = env.reset(jax.random.PRNGKey(0))
    bad = WalkerState(qpos=st.qpos.at[3].set(jnp.nan), qvel=st.qvel)
    _, _, reward, terminated, _ = jax.jit(env.step)(
        bad, jnp.zeros(env.action_size), jax.random.PRNGKey(1))
    assert bool(terminated)
    assert np.isfinite(float(reward))
