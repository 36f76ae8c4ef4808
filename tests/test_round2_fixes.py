"""Regression tests for round-2 fixes (VERDICT.md items 5 and 7).

Covers: Beta-policy deterministic eval, replay-coin RNG decorrelation,
antagonist return bookkeeping, latest_env_stats reuse on replay cycles,
host-state checkpoint round-trip, and slot-id tracking for level_seeds.csv.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcd_isaac_tpu.models.car_racing_models import CarRacingNetwork
from dcd_isaac_tpu.models.multigrid_models import MultigridNetwork
from dcd_isaac_tpu.models.walker_models import WalkerStudentPolicy
from dcd_isaac_tpu.level_replay import plr as plr_lib
from dcd_isaac_tpu.train import main

BASE = [
    '--num_processes', '4', '--num_steps', '16',
    '--ppo_epoch', '1', '--num_mini_batch', '1',
    '--test_interval', '0', '--test_env_names', '',
    '--log_dir', '/tmp/dcd_test_logs',
]


def run(xpid, extra, cycles=2):
    argv = extra + ['--env_name', 'MultiGrid-MiniAdversarial-v0'] + BASE
    argv += ['--num_env_steps', str(4 * 16 * cycles), '--xpid', xpid]
    return main(argv)


class TestDeterministicAction:
    def test_beta_mode_bounds(self):
        """Regression: evaluator --deterministic crashed on Beta heads."""
        m = CarRacingNetwork()
        out = {'alpha': jnp.array([[2.0, 1.5, 3.0]]),
               'beta': jnp.array([[2.0, 4.0, 1.2]])}
        a = m.deterministic_action(out)
        assert a.shape == (1, 3)
        # steer in [-1, 1]; gas/brake in [0, 1]
        assert float(a[0, 0]) >= -1.0 and float(a[0, 0]) <= 1.0
        assert float(a[0, 1]) >= 0.0 and float(a[0, 1]) <= 1.0
        # mode of Beta(2,2) = 0.5 → steer = 0
        assert abs(float(a[0, 0])) < 1e-6

    def test_categorical_mode(self):
        m = MultigridNetwork(num_actions=7)
        logits = jnp.array([[0.0, 3.0, 1.0, 0, 0, 0, 0]])
        assert int(m.deterministic_action(logits)[0]) == 1

    def test_normal_mean(self):
        m = WalkerStudentPolicy()
        out = {'mean': jnp.array([[0.3, -0.2, 0.0, 1.0]]),
               'log_std': jnp.zeros((1, 4))}
        np.testing.assert_allclose(
            np.asarray(m.deterministic_action(out)),
            [[0.3, -0.2, 0.0, 1.0]])

    def test_evaluator_deterministic_multigrid(self):
        """End-to-end deterministic eval path must run without error."""
        from dcd_isaac_tpu.runner.evaluation import Evaluator
        from dcd_isaac_tpu.arguments import defaults
        from dcd_isaac_tpu.envs.registry import make_env
        from dcd_isaac_tpu.utils.make_agent import make_all_models

        args = defaults()
        args.env_name = 'MultiGrid-MiniAdversarial-v0'
        env = make_env(args.env_name, args=args)
        models = make_all_models(args, env)
        model = models['agent']
        rng = jax.random.PRNGKey(0)
        _, obs = jax.vmap(env.reset_random)(jax.random.split(rng, 2))
        params = model.init(
            rng, jax.tree.map(lambda x: x, obs),
            model.initial_carry((2,)), jnp.ones((2,)))
        ev = Evaluator(['MultiGrid-Labyrinth-v0'], num_episodes=2,
                       deterministic=True)
        stats = ev.evaluate(model, params, seed=0)
        assert 'solved_rate:MultiGrid-Labyrinth-v0' in stats
        assert np.isfinite(stats['test_returns:MultiGrid-Labyrinth-v0'])


class TestReplayCoinRNG:
    def test_fold_in_decorrelated_from_splits(self):
        """The replay coin key must not collide with any cycle split."""
        rng = jax.random.PRNGKey(42)
        dec = jax.random.fold_in(rng, 0x5EED)
        for k in jax.random.split(rng, 8):
            assert not bool(jnp.all(dec == k))


class TestRunnerBookkeeping:
    def test_antagonist_returns_tracked(self):
        r = run('t_r2_paired', ['--ued_algo', 'paired'], cycles=3)
        # deque must receive entries once antagonist episodes complete
        # (MiniAdversarial episodes are short enough to finish in 16 steps)
        assert len(r.adversary_agent_returns) > 0
        stats_keys = None  # stats from last cycle not retained; rerun one
        stats = r.run()
        assert 'mean_adversary_agent_return' in stats

    def test_latest_env_stats_on_replay(self):
        r = run('t_r2_plr', [
            '--ued_algo', 'domain_randomization', '--use_plr', 'true',
            '--level_replay_rho', '0.1', '--level_replay_prob', '1.0',
            '--level_replay_seed_buffer_size', '8'], cycles=6)
        assert r.latest_env_stats, 'env stats must be cached under PLR'
        # force a replay cycle and confirm complexity keys are re-logged
        found_replay = False
        for _ in range(6):
            stats = r.run()
            if stats['level_replay']:
                found_replay = True
                assert 'num_blocks' in stats
                break
        assert found_replay

    def test_replay_complexity_flag(self):
        r = run('t_r2_rc', [
            '--ued_algo', 'domain_randomization', '--use_plr', 'true',
            '--log_replay_complexity', 'true',
            '--level_replay_rho', '0.1', '--level_replay_prob', '1.0',
            '--level_replay_seed_buffer_size', '8'], cycles=4)
        for _ in range(8):
            stats = r.run()
            if stats['level_replay']:
                assert 'plr_num_blocks' in stats
                assert 'plr_passable_ratio' in stats
                return
        pytest.skip('no replay cycle hit')

    def test_host_state_roundtrip(self):
        r = run('t_r2_ckpt', ['--ued_algo', 'paired'], cycles=2)
        host = r.host_state_dict()
        assert 'agent_returns' in host
        assert 'adversary_agent_returns' in host
        assert 'latest_env_stats' in host
        r2 = run('t_r2_ckpt2', ['--ued_algo', 'paired'], cycles=1)
        r2.load_host_state_dict(host)
        assert list(r2.agent_returns) == host['agent_returns']
        assert r2.num_updates == host['num_updates']


class TestSlotIds:
    def test_promote_assigns_unique_ids(self):
        cfg = plr_lib.PLRConfig(capacity=4, num_actors=3)
        buf = plr_lib.init_plr(cfg, (2,), jnp.uint8)
        levels = jnp.arange(6, dtype=jnp.uint8).reshape(3, 2)
        buf = plr_lib.promote_staged(
            buf, cfg, levels, jnp.array([1.0, 2.0, 3.0]),
            jnp.array([1.0, 1.0, 1.0]))
        ids = np.asarray(buf.slot_ids)
        filled = np.asarray(buf.filled)
        assert filled.sum() == 3
        got = sorted(ids[filled].tolist())
        assert got == [0, 1, 2]
        assert int(buf.next_id) == 3
        # unfilled slot keeps -1
        assert (ids[~filled] == -1).all()


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])
