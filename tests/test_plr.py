"""Device-resident PLR tests vs numpy oracles of the reference formulas
(level_replay/level_sampler.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcd_isaac_tpu.algos.storage import Rollout
from dcd_isaac_tpu.level_replay import (
    PLRConfig, init_plr, promote_staged, sample_replay_decision,
    sample_replay_levels, sample_weights, update_with_rollout,
)

LEVEL_SHAPE = (2, 2, 3)


def make_cfg(**kw):
    base = dict(capacity=8, num_actors=4, strategy='value_l1',
                score_transform='rank', temperature=0.1,
                staleness_coef=0.3, alpha=1.0, rho=0.5, replay_prob=0.95)
    base.update(kw)
    return PLRConfig(**base)


def seeded_buffer(cfg, scores, staleness=None, unseen=None):
    buf = init_plr(cfg, LEVEL_SHAPE)
    S = cfg.capacity
    scores = np.asarray(scores, np.float32)
    n = len(scores)
    buf = buf.replace(
        scores=buf.scores.at[:n].set(jnp.asarray(scores)),
        unseen=jnp.asarray(
            unseen if unseen is not None
            else np.concatenate([np.zeros(n), np.ones(S - n)]),
            jnp.float32),
        filled=jnp.asarray(
            np.concatenate([np.ones(n), np.zeros(S - n)]).astype(bool)),
    )
    if staleness is not None:
        buf = buf.replace(
            staleness=buf.staleness.at[:n].set(jnp.asarray(staleness)))
    return buf


def oracle_weights(cfg, scores, unseen, staleness):
    """Numpy transcription of reference sample_weights (:726-750)."""
    scores = np.asarray(scores, np.float64)
    S = len(scores)

    def transform(t, temp, s):
        if t == 'rank':
            order = np.flip(s.argsort(kind='stable'))
            ranks = np.empty_like(order)
            ranks[order] = np.arange(S) + 1
            return 1 / ranks ** (1.0 / temp)
        if t == 'power':
            eps = 0 if cfg.staleness_coef > 0 else 1e-3
            return (s.clip(0) + eps) ** (1.0 / temp)
        raise NotImplementedError

    w = transform(cfg.score_transform, cfg.temperature, scores)
    w = w * (1 - unseen)
    z = w.sum()
    if z > 0:
        w = w / z
    else:
        w = np.ones(S) / S * (1 - unseen)
        w /= w.sum()
    if cfg.staleness_coef > 0:
        sw = transform(cfg.staleness_transform, cfg.staleness_temperature,
                       np.asarray(staleness, np.float64))
        sw = sw * (1 - unseen)
        z = sw.sum()
        if z > 0:
            sw /= z
        else:
            sw = 1.0 / S * (1 - unseen)
        w = (1 - cfg.staleness_coef) * w + cfg.staleness_coef * sw
    return w


class TestSampleWeights:
    @pytest.mark.parametrize('transform,temp,coef', [
        ('rank', 0.1, 0.3), ('rank', 1.0, 0.0), ('power', 1.0, 0.3),
        ('power', 2.0, 0.0)])
    def test_matches_oracle(self, transform, temp, coef):
        cfg = make_cfg(score_transform=transform, temperature=temp,
                       staleness_coef=coef)
        rng = np.random.RandomState(0)
        scores = rng.rand(6)
        staleness = rng.randint(0, 10, 6).astype(float)
        buf = seeded_buffer(cfg, scores, staleness)
        got = np.asarray(sample_weights(buf, cfg))
        S = cfg.capacity
        want = oracle_weights(
            cfg,
            np.concatenate([scores, np.zeros(S - 6)]),
            np.concatenate([np.zeros(6), np.ones(S - 6)]),
            np.concatenate([staleness, np.zeros(S - 6)]))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_unseen_get_zero_mass(self):
        cfg = make_cfg()
        buf = seeded_buffer(cfg, [1.0, 2.0, 3.0])
        w = np.asarray(sample_weights(buf, cfg))
        assert (w[3:] == 0).all()
        assert np.isclose(w.sum(), 1.0)


class TestReplayDecision:
    def test_requires_rho_filled(self):
        cfg = make_cfg(rho=0.5)
        buf = seeded_buffer(cfg, [1.0])  # 1/8 filled < rho
        assert not bool(sample_replay_decision(
            buf, cfg, jax.random.PRNGKey(0)))

    def test_proportionate_schedule(self):
        cfg = make_cfg(rho=0.25, replay_schedule='proportionate')
        buf = seeded_buffer(cfg, [1.0] * 8)
        dec = [bool(sample_replay_decision(buf, cfg, jax.random.PRNGKey(i)))
               for i in range(200)]
        # fully filled: replay with min(1.0, 0.95) = 0.95
        assert 0.85 < np.mean(dec) <= 1.0


def rollout_from(dones, seeds, returns, values, cliff=None, rewards=None):
    T, N = np.asarray(dones).shape
    cliff = np.zeros((T, N), bool) if cliff is None else np.asarray(cliff)
    rewards = np.zeros((T, N)) if rewards is None else np.asarray(rewards)
    return Rollout(
        obs={}, actions=jnp.zeros((T, N), jnp.int32),
        log_probs=jnp.zeros((T, N)),
        log_dists=jnp.zeros((T, N, 3)),
        values=jnp.asarray(values, jnp.float32),
        rewards=jnp.asarray(rewards, jnp.float32),
        masks_pre=jnp.ones((T, N)),
        dones=jnp.asarray(dones),
        bad_masks=jnp.ones((T, N)),
        cliffhangers=jnp.asarray(cliff),
        trunc_values=jnp.zeros((T, N)),
        level_seeds=jnp.asarray(seeds, jnp.int32),
    ), jnp.asarray(returns, jnp.float32), jnp.asarray(values, jnp.float32)


class TestUpdateWithRollout:
    def test_value_l1_single_episodes(self):
        cfg = make_cfg(alpha=1.0, staleness_coef=0.0)
        buf = seeded_buffer(cfg, [0.0] * 4)
        # 2 envs, 3 steps, one episode each on seeds 0, 1
        dones = [[False, False], [False, False], [True, True]]
        seeds = [[0, 1]] * 3
        returns = [[1.0, 2.0], [1.0, 2.0], [1.0, 2.0]]
        values = [[0.5, 0.0], [0.5, 0.0], [0.5, 0.0]]
        ro, ret, val = rollout_from(dones, seeds, returns, values)
        buf2, st_scores, st_epis = update_with_rollout(buf, cfg, ro, ret, val)
        s = np.asarray(buf2.scores)
        assert np.isclose(s[0], 0.5)   # |1 - 0.5| mean
        assert np.isclose(s[1], 2.0)   # |2 - 0|
        assert (np.asarray(st_epis) == 0).all()

    def test_alpha_ewa_ordering(self):
        # Same seed played twice in one env: scores e0 then e1.
        cfg = make_cfg(alpha=0.5, staleness_coef=0.0)
        buf = seeded_buffer(cfg, [1.0])
        dones = [[True], [True]]
        seeds = [[0], [0]]
        returns = [[2.0], [4.0]]   # e0 score |2|, e1 score |4|
        values = [[0.0], [0.0]]
        ro, ret, val = rollout_from(dones, seeds, returns, values)
        buf2, _, _ = update_with_rollout(buf, cfg, ro, ret, val)
        # s = (1-a)((1-a)*1 + a*2) + a*4 = 0.5*(0.5 + 1) + 2 = 2.75
        assert np.isclose(float(buf2.scores[0]), 2.75)

    def test_cliffhanger_excluded(self):
        cfg = make_cfg(alpha=1.0, staleness_coef=0.0)
        buf = seeded_buffer(cfg, [7.0])
        dones = [[False], [True]]
        cliff = [[False], [True]]
        ro, ret, val = rollout_from(
            dones, [[0], [0]], [[9.0], [9.0]], [[0.0], [0.0]], cliff=cliff)
        buf2, _, _ = update_with_rollout(buf, cfg, ro, ret, val)
        assert np.isclose(float(buf2.scores[0]), 7.0)  # unchanged

    def test_staged_scores_aggregated(self):
        cfg = make_cfg(alpha=1.0, staleness_coef=0.0)
        buf = init_plr(cfg, LEVEL_SHAPE)
        S = cfg.capacity
        # env 0 plays staged level (seed S+0) for 2 episodes of 1 and 2 steps
        dones = [[True], [False], [True]]
        seeds = [[S], [S], [S]]
        returns = [[3.0], [6.0], [6.0]]
        values = [[0.0], [0.0], [0.0]]
        ro, ret, val = rollout_from(dones, seeds, returns, values)
        buf2, st_scores, st_epis = update_with_rollout(buf, cfg, ro, ret, val)
        # step-weighted mean over all steps: (3 + 6 + 6)/3 = 5
        assert np.isclose(float(st_scores[0]), 5.0)
        assert int(st_epis[0]) == 2

    def test_entropy_strategy(self):
        cfg = make_cfg(strategy='policy_entropy', alpha=1.0,
                       staleness_coef=0.0)
        buf = seeded_buffer(cfg, [0.0])
        T, N, A = 2, 1, 3
        logits = np.log(np.ones((T, N, A)) / A)  # uniform → entropy 1.0
        ro, ret, val = rollout_from(
            [[True], [True]], [[0], [0]], np.zeros((T, N)), np.zeros((T, N)))
        ro = ro.replace(log_dists=jnp.asarray(logits, jnp.float32))
        buf2, _, _ = update_with_rollout(buf, cfg, ro, ret, val)
        assert np.isclose(float(buf2.scores[0]), 1.0, atol=1e-5)


class TestPromotion:
    def test_fill_then_evict(self):
        cfg = make_cfg(capacity=4, staleness_coef=0.0, alpha=1.0)
        buf = init_plr(cfg, LEVEL_SHAPE)
        levels = jnp.arange(4 * 12, dtype=jnp.uint8).reshape(4, *LEVEL_SHAPE)
        scores = jnp.asarray([3.0, 1.0, 2.0, 4.0])
        counts = jnp.ones(4)
        buf = promote_staged(buf, cfg, levels, scores, counts)
        assert bool(buf.filled.all())
        # slot placement is an implementation detail; the level set matters
        np.testing.assert_allclose(
            sorted(np.asarray(buf.scores).tolist()), [1, 2, 3, 4])

        # Buffer full: new level with score 2.5 must evict the min-weight
        # slot (score 1.0) and be accepted (2.5 >= 1.0).
        new_level = jnp.full((1, *LEVEL_SHAPE), 99, jnp.uint8)
        buf2 = promote_staged(
            buf, cfg, new_level, jnp.asarray([2.5]), jnp.ones(1))
        s = np.asarray(buf2.scores)
        np.testing.assert_allclose(sorted(s.tolist()), [2, 2.5, 3, 4])
        slot = int(np.argwhere(np.isclose(s, 2.5))[0, 0])
        assert np.asarray(buf2.levels[slot]).max() == 99

        # Rejected: a NEW (distinct) staged level scoring below the min.
        low_level = jnp.full((1, *LEVEL_SHAPE), 98, jnp.uint8)
        buf3 = promote_staged(
            buf2, cfg, low_level, jnp.asarray([0.5]), jnp.ones(1))
        np.testing.assert_allclose(np.asarray(buf3.scores),
                                   np.asarray(buf2.scores))

        # Duplicate of an existing level: folds into its slot (EWA, α=1 →
        # replace) instead of inserting (reference LevelStore dedup).
        buf4 = promote_staged(
            buf2, cfg, new_level, jnp.asarray([7.0]), jnp.ones(1))
        s4 = np.asarray(buf4.scores)
        assert np.isclose(s4[np.asarray(buf2.scores) == 2.5][0], 7.0)
        assert int(buf4.next_id) == int(buf2.next_id)  # no new identity

    def test_no_episodes_no_insert(self):
        cfg = make_cfg(capacity=4)
        buf = init_plr(cfg, LEVEL_SHAPE)
        buf2 = promote_staged(
            buf, cfg, jnp.zeros((2, *LEVEL_SHAPE), jnp.uint8),
            jnp.ones(2), jnp.zeros(2))
        assert not bool(buf2.filled.any())

    def test_sample_replay_levels(self):
        cfg = make_cfg(capacity=4, score_transform='rank', temperature=0.1,
                       staleness_coef=0.0)
        buf = init_plr(cfg, LEVEL_SHAPE)
        levels = jnp.arange(4 * 12, dtype=jnp.uint8).reshape(4, *LEVEL_SHAPE)
        buf = promote_staged(buf, cfg, levels,
                             jnp.asarray([0.1, 10.0, 0.1, 0.1]), jnp.ones(4))
        seeds, got, buf = sample_replay_levels(
            buf, cfg, jax.random.PRNGKey(0), 64)
        # rank 0.1 temp → overwhelmingly the slot holding score 10
        top = int(np.argmax(np.asarray(buf.scores)))
        assert (np.asarray(seeds) == top).mean() > 0.9
        np.testing.assert_array_equal(
            np.asarray(got[0]), np.asarray(buf.levels[np.asarray(seeds)[0]]))


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])
