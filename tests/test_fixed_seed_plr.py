"""Fixed-seed PLR mode (train_full_distribution=False).

Mirrors reference level_sampler.py:97-118 (unseen-weight bookkeeping over a
fixed seed set), :605-638 (fixed-mode replay decision) and :686-698
(_sample_unseen_level), plus the batched promote_staged rewrite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcd_isaac_tpu.level_replay import plr as plr_lib


def cfg(**kw):
    base = dict(capacity=8, num_actors=4, full_distribution=False,
                staleness_coef=0.3)
    base.update(kw)
    return plr_lib.PLRConfig(**base)


def prefilled(c):
    levels = jnp.arange(c.capacity * 2, dtype=jnp.uint8).reshape(
        c.capacity, 2)
    return plr_lib.init_plr(c, (2,), jnp.uint8, levels=levels)


class TestFixedSeedInit:
    def test_prefill_marks_filled_unseen(self):
        c = cfg()
        buf = prefilled(c)
        assert bool(buf.filled.all())
        assert float(buf.unseen.sum()) == c.capacity
        np.testing.assert_array_equal(
            np.asarray(buf.slot_ids), np.arange(c.capacity))


class TestSampleUnseen:
    def test_draws_only_unseen(self):
        c = cfg()
        buf = prefilled(c)
        # mark half the seeds seen
        buf = buf.replace(unseen=buf.unseen.at[:4].set(0.0))
        seeds, levels, buf2 = plr_lib.sample_unseen_levels(
            buf, c, jax.random.PRNGKey(0), 16)
        assert (np.asarray(seeds) >= 4).all()
        np.testing.assert_array_equal(
            np.asarray(levels), np.asarray(buf.levels[seeds]))

    def test_staleness_reset_on_drawn(self):
        c = cfg()
        buf = prefilled(c).replace(staleness=jnp.full((8,), 5.0))
        seeds, _, buf2 = plr_lib.sample_unseen_levels(
            buf, c, jax.random.PRNGKey(1), 4)
        st = np.asarray(buf2.staleness)
        assert (st[np.asarray(seeds)] == 0).all()
        untouched = np.setdiff1d(np.arange(8), np.asarray(seeds))
        assert (st[untouched] == 9.0).all()  # 5 + n(=4)


class TestFixedReplayDecision:
    def test_below_rho_never_replays(self):
        c = cfg(rho=0.5, replay_schedule='fixed', replay_prob=1.0)
        buf = prefilled(c)  # nothing seen
        for s in range(20):
            assert not bool(plr_lib.sample_replay_decision(
                buf, c, jax.random.PRNGKey(s)))

    def test_all_seen_forces_replay_fixed_schedule(self):
        c = cfg(rho=0.5, replay_schedule='fixed', replay_prob=0.0)
        buf = prefilled(c).replace(unseen=jnp.zeros((8,)))
        for s in range(20):
            assert bool(plr_lib.sample_replay_decision(
                buf, c, jax.random.PRNGKey(s)))

    def test_proportionate_uses_seen_fraction(self):
        c = cfg(rho=0.25, replay_schedule='proportionate')
        buf = prefilled(c).replace(
            unseen=jnp.ones((8,)).at[:4].set(0.0))  # half seen
        hits = sum(
            bool(plr_lib.sample_replay_decision(
                buf, c, jax.random.PRNGKey(s))) for s in range(400))
        assert 140 < hits < 260  # ~0.5 * 400


class TestBatchedPromote:
    def test_fill_then_evict_lowest(self):
        c = plr_lib.PLRConfig(capacity=3, num_actors=3,
                              score_transform='power', temperature=1.0,
                              staleness_coef=0.0,
                              seed_buffer_priority='score')
        buf = plr_lib.init_plr(c, (1,), jnp.uint8)
        buf = plr_lib.promote_staged(
            buf, c, jnp.array([[1], [2], [3]], jnp.uint8),
            jnp.array([5.0, 1.0, 3.0]), jnp.ones(3))
        assert bool(buf.filled.all())
        assert sorted(np.asarray(buf.scores).tolist()) == [1.0, 3.0, 5.0]
        # now stage a level that beats the min (1.0) but not the others
        buf2 = plr_lib.promote_staged(
            buf, c, jnp.array([[9]], jnp.uint8),
            jnp.array([2.0]), jnp.ones(1))
        s = sorted(np.asarray(buf2.scores).tolist())
        assert s == [2.0, 3.0, 5.0]
        # a level below the min is rejected
        buf3 = plr_lib.promote_staged(
            buf2, c, jnp.array([[7]], jnp.uint8),
            jnp.array([0.5]), jnp.ones(1))
        assert sorted(np.asarray(buf3.scores).tolist()) == [2.0, 3.0, 5.0]

    def test_overflow_staged_highest_win(self):
        # more staged than capacity: the top-S scores land
        c = plr_lib.PLRConfig(capacity=2, num_actors=4,
                              seed_buffer_priority='score',
                              staleness_coef=0.0)
        buf = plr_lib.init_plr(c, (1,), jnp.uint8)
        buf = plr_lib.promote_staged(
            buf, c, jnp.arange(4, dtype=jnp.uint8)[:, None],
            jnp.array([1.0, 4.0, 2.0, 3.0]), jnp.ones(4))
        assert sorted(np.asarray(buf.scores).tolist()) == [3.0, 4.0]

    def test_invalid_staged_do_not_burn_slots(self):
        c = plr_lib.PLRConfig(capacity=2, num_actors=3,
                              seed_buffer_priority='score',
                              staleness_coef=0.0)
        buf = plr_lib.init_plr(c, (1,), jnp.uint8)
        # staged 0 has no completed episodes (count 0) → invalid
        buf = plr_lib.promote_staged(
            buf, c, jnp.array([[1], [2], [3]], jnp.uint8),
            jnp.array([9.0, 1.0, 2.0]),
            jnp.array([0.0, 1.0, 1.0]))
        assert sorted(np.asarray(buf.scores).tolist()) == [1.0, 2.0]
        assert int(buf.next_id) == 2


class TestFixedSeedEndToEnd:
    def test_train_fixed_seed_mode(self, tmp_path):
        from dcd_isaac_tpu.train import main
        r = main([
            '--env_name', 'MultiGrid-MiniAdversarial-v0',
            '--ued_algo', 'domain_randomization',
            '--use_plr', 'true',
            '--train_full_distribution', 'false',
            '--level_replay_seed_buffer_size', '8',
            '--level_replay_rho', '0.3',
            '--num_processes', '4', '--num_steps', '16',
            '--num_env_steps', str(4 * 16 * 6),
            '--ppo_epoch', '1', '--num_mini_batch', '1',
            '--test_interval', '0', '--test_env_names', '',
            '--log_dir', str(tmp_path), '--xpid', 't_fixed_seed'])
        buf = r.state.plr_agent
        # buffer stays fully filled; some seeds must have been seen
        assert bool(buf.filled.all())
        assert float(buf.unseen.sum()) < 8
        # seen slots carry scores
        seen = np.asarray(buf.unseen) == 0
        assert np.isfinite(np.asarray(buf.scores)[seen]).all()

    def test_fixed_seed_levels_are_deterministic(self, tmp_path):
        from dcd_isaac_tpu.arguments import parser
        from dcd_isaac_tpu.envs.registry import make_env
        from dcd_isaac_tpu.runner.adversarial_runner import AdversarialRunner
        from dcd_isaac_tpu.utils.make_agent import make_all_models
        argv = [
            '--env_name', 'MultiGrid-MiniAdversarial-v0',
            '--ued_algo', 'domain_randomization',
            '--use_plr', 'true',
            '--train_full_distribution', 'false',
            '--level_replay_seed_buffer_size', '8',
            '--num_processes', '2', '--num_steps', '8',
            '--ppo_epoch', '1', '--num_mini_batch', '1', '--seed', '7']
        args = parser.parse_args(argv)
        env = make_env(args.env_name, args=args)
        models = make_all_models(args, env)
        r1 = AdversarialRunner(args, env, models, jax.random.PRNGKey(7))
        r2 = AdversarialRunner(args, env, models, jax.random.PRNGKey(7))
        np.testing.assert_array_equal(
            np.asarray(r1.state.plr_agent.levels),
            np.asarray(r2.state.plr_agent.levels))

    def test_paired_fixed_seed_rejected(self):
        from dcd_isaac_tpu.arguments import parser
        from dcd_isaac_tpu.envs.registry import make_env
        from dcd_isaac_tpu.runner.adversarial_runner import AdversarialRunner
        from dcd_isaac_tpu.utils.make_agent import make_all_models
        args = parser.parse_args([
            '--env_name', 'MultiGrid-MiniAdversarial-v0',
            '--ued_algo', 'paired', '--use_plr', 'true',
            '--train_full_distribution', 'false',
            '--num_processes', '2', '--num_steps', '8'])
        env = make_env(args.env_name, args=args)
        models = make_all_models(args, env)
        with pytest.raises(AssertionError):
            AdversarialRunner(args, env, models, jax.random.PRNGKey(0))


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])
