"""RL-core tests: GAE vs numpy oracle, PPO update math, rollout harness."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcd_isaac_tpu.algos import (
    PPOConfig, Rollout, RolloutConfig, compute_gae,
    compute_discounted_returns, init_agent_state, initial_step_carry,
    make_ppo_update, make_student_rollout, batched_value_loss,
)
from dcd_isaac_tpu.envs.multigrid import AdversarialMultiGrid, MultiGridParams
from dcd_isaac_tpu.models import MultigridNetwork


def make_rollout(T=8, N=4, A=7, seed=0):
    rng = np.random.RandomState(seed)
    dones = rng.rand(T, N) < 0.2
    dones[-1] = True
    masks_pre = np.ones((T, N), np.float32)
    masks_pre[0] = 0.0
    masks_pre[1:] = 1.0 - dones[:-1]
    log_dists = np.log(np.ones((T, N, A)) / A)
    return Rollout(
        obs={'x': jnp.asarray(rng.randn(T, N, 3), jnp.float32)},
        actions=jnp.asarray(rng.randint(0, A, (T, N))),
        log_probs=jnp.asarray(log_dists[..., 0]),
        log_dists=jnp.asarray(log_dists, jnp.float32),
        values=jnp.asarray(rng.randn(T, N), jnp.float32),
        rewards=jnp.asarray(rng.randn(T, N), jnp.float32),
        masks_pre=jnp.asarray(masks_pre),
        dones=jnp.asarray(dones),
        bad_masks=jnp.ones((T, N)),
        cliffhangers=jnp.zeros((T, N), bool),
        trunc_values=jnp.zeros((T, N)),
        level_seeds=jnp.zeros((T, N), jnp.int32),
    )


class TestGAE:
    def test_matches_reference_recursion(self):
        """Oracle = reference storage.compute_gae_returns (storage.py:251-256)."""
        ro = make_rollout()
        gamma, lam = 0.995, 0.95
        T, N = ro.rewards.shape
        next_value = jnp.zeros(N)

        # numpy oracle with masks[t+1] = 1 - dones[t]
        rewards = np.asarray(ro.rewards)
        values = np.concatenate(
            [np.asarray(ro.values), np.zeros((1, N))], 0)
        masks = np.concatenate(
            [np.ones((1, N)), 1.0 - np.asarray(ro.dones)], 0)
        returns = np.zeros((T, N))
        gae = np.zeros(N)
        for t in reversed(range(T)):
            delta = rewards[t] + gamma * values[t + 1] * masks[t + 1] - values[t]
            gae = delta + gamma * lam * masks[t + 1] * gae
            returns[t] = gae + values[t]

        got = np.asarray(compute_gae(ro, next_value, gamma, lam))
        np.testing.assert_allclose(got, returns, rtol=1e-5)

    def test_trunc_bootstrap(self):
        # Single env, truncation at t=1: bootstrap through V(s_trunc).
        T, N = 3, 1
        ro = make_rollout(T, N)
        ro = ro.replace(
            rewards=jnp.asarray([[1.0], [1.0], [0.0]]),
            values=jnp.asarray([[0.0], [0.0], [0.0]]),
            dones=jnp.asarray([[False], [True], [True]]),
            bad_masks=jnp.asarray([[1.0], [0.0], [1.0]]),
            trunc_values=jnp.asarray([[0.0], [5.0], [0.0]]),
        )
        gamma, lam = 0.5, 1.0
        ret = np.asarray(compute_gae(
            ro, jnp.zeros(1), gamma, lam, use_proper_time_limits=True))
        # t=1: delta = 1 + 0.5*5 - 0 = 3.5 → return 3.5
        assert np.isclose(ret[1, 0], 3.5)
        # t=0: delta = 1 + 0.5*0 - 0 = 1; gae = 1 + 0.5*1*3.5 = 2.75
        assert np.isclose(ret[0, 0], 2.75)

    def test_discounted_returns(self):
        ro = make_rollout(4, 1)
        ro = ro.replace(
            rewards=jnp.asarray([[1.0], [1.0], [1.0], [1.0]]),
            dones=jnp.zeros((4, 1), bool).at[3].set(True),
        )
        ret = np.asarray(compute_discounted_returns(ro, jnp.zeros(1), 0.5))
        np.testing.assert_allclose(ret[:, 0], [1.875, 1.75, 1.5, 1.0])

    def test_batched_value_loss(self):
        ro = make_rollout()
        ret = compute_gae(ro, jnp.zeros(4), 0.99, 0.95)
        bvl = batched_value_loss(ret, ro.values)
        assert bvl.shape == (4,)
        assert (np.abs(np.asarray(bvl)) <= 1).all()


ENV_P = MultiGridParams(size=6, n_clutter=3, agent_view_size=5, max_steps=20)
ENV = AdversarialMultiGrid(ENV_P)


def build_student(recurrent='lstm'):
    return MultigridNetwork(
        num_actions=7, scalar_dim=4, recurrent_arch=recurrent,
        recurrent_hidden_size=32, conv_filters=8)


class TestRolloutHarness:
    @pytest.mark.parametrize('arch', ['lstm', None])
    def test_rollout_shapes_and_episodes(self, arch):
        model = build_student(arch)
        cfg = PPOConfig(ppo_epoch=2, num_mini_batch=2)
        rngs = jax.random.split(jax.random.PRNGKey(0), 8)
        env_state, obs = jax.vmap(ENV.reset_random)(rngs)
        state0 = init_agent_state(model, cfg, jax.random.PRNGKey(1), obs, 8)

        ro_fn = make_student_rollout(
            ENV, model, RolloutConfig(num_steps=40, handle_timelimits=True))
        carry = initial_step_carry(
            ENV, model, env_state, obs, jax.random.PRNGKey(2))
        final, steps, next_value, stats = jax.jit(ro_fn)(state0.params, carry)

        assert steps.rewards.shape == (40, 8)
        assert steps.obs['image'].shape == (40, 8, 5, 5, 3)
        # max_steps=20 < T=40: every env must complete ≥1 episode
        assert (np.asarray(final.epi_count) >= 1).all()
        # final step forces done
        assert np.asarray(steps.dones[-1]).all()
        # masks_pre[0] == 0, consistent chaining afterwards
        assert (np.asarray(steps.masks_pre[0]) == 0).all()
        np.testing.assert_allclose(
            np.asarray(steps.masks_pre[1:]),
            1.0 - np.asarray(steps.dones[:-1]), rtol=0, atol=0)

    def test_ppo_update_runs_and_discard_grad(self):
        model = build_student('lstm')
        cfg = PPOConfig(ppo_epoch=2, num_mini_batch=2, entropy_coef=0.01)
        rngs = jax.random.split(jax.random.PRNGKey(0), 8)
        env_state, obs = jax.vmap(ENV.reset_random)(rngs)
        state0 = init_agent_state(model, cfg, jax.random.PRNGKey(1), obs, 8)

        ro_fn = make_student_rollout(ENV, model, RolloutConfig(num_steps=16))
        carry = initial_step_carry(
            ENV, model, env_state, obs, jax.random.PRNGKey(2))
        final, steps, next_value, _ = jax.jit(ro_fn)(state0.params, carry)
        returns = compute_gae(steps, next_value, 0.995, 0.95)

        update = make_ppo_update(model, cfg, num_actors=8)
        init_carry = model.initial_carry((8,))
        new_state, stats = jax.jit(update)(
            state0, steps, returns, init_carry, jax.random.PRNGKey(3),
            False)
        # params changed
        diff = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state0.params, new_state.params)
        assert max(jax.tree.leaves(diff)) > 0

        # discard_grad leaves params identical
        same_state, stats2 = jax.jit(update)(
            state0, steps, returns, init_carry, jax.random.PRNGKey(3),
            True)
        diff2 = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state0.params, same_state.params)
        assert max(jax.tree.leaves(diff2)) == 0
        assert np.isfinite(float(stats2['value_loss']))

    def test_ppo_loss_matches_numpy_oracle(self):
        """Feed-forward path: verify the clipped-surrogate math directly."""
        model = build_student(None)
        cfg = PPOConfig(ppo_epoch=1, num_mini_batch=1, entropy_coef=0.0,
                        lr=0.0)  # lr 0: params unchanged, read stats only
        rngs = jax.random.split(jax.random.PRNGKey(0), 4)
        env_state, obs = jax.vmap(ENV.reset_random)(rngs)
        state0 = init_agent_state(model, cfg, jax.random.PRNGKey(1), obs, 4)
        ro_fn = make_student_rollout(ENV, model, RolloutConfig(num_steps=8))
        carry = initial_step_carry(
            ENV, model, env_state, obs, jax.random.PRNGKey(2))
        _, steps, next_value, _ = jax.jit(ro_fn)(state0.params, carry)
        returns = compute_gae(steps, next_value, 0.99, 0.95)

        update = make_ppo_update(model, cfg, num_actors=4)
        _, stats = jax.jit(update)(
            state0, steps, returns, (), jax.random.PRNGKey(3), False)

        # With unchanged params, ratio == 1 → action_loss = -mean(adv_norm)
        adv = np.asarray(returns) - np.asarray(steps.values)
        advn = (adv - adv.mean()) / (adv.std() + 1e-5)
        assert np.isclose(float(stats['action_loss']), -advn.mean(),
                          atol=1e-4)
        # Value clipping with unchanged params → plain 0.5*mse
        vloss = 0.5 * ((np.asarray(steps.values) - np.asarray(returns)) ** 2)
        assert np.isclose(float(stats['value_loss']), vloss.mean(), atol=1e-4)


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])
