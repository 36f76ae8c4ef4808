"""Batched PLR vs the reference's sequential algorithm: replay-distribution
divergence over a long horizon (VERDICT r2 item 9).

The batched redesign (level_replay/plr.py) deviates from the reference
level_sampler.py in documented ways: staged levels promote once per cycle
with eviction priorities computed once (vs a per-insert rescan with
recomputed sample weights, level_sampler.py:220-273), staleness updates
batch per cycle, and promoted slots start at staleness 0 (vs
running_sample_count - staging timestamp).  This test quantifies the NET
effect: a numpy oracle transcribing the reference's sequential logic
(update_seed_score EWA folds per episode in arrival order, rank-transform
sample weights with staleness mixing, _partial_update_seed_score_buffer
promotion) and the real batched implementation consume IDENTICAL synthetic
episode streams for hundreds of cycles.

Two measurements, both bounded (numbers recorded in plr.py's deviations
docstring):
  1. COUPLED per-cycle divergence — batched state reset to the oracle's
     before every cycle: mean TV 0.0021, max 0.021 (the true per-cycle
     deviation of the batched promotion/EWA/staleness redesign).
  2. FREE-RUNNING long-horizon drift — trajectories fork through eviction
     differences; the batched buffer converges to a more elite score
     floor (no within-cycle chain eviction): mean score gap 0.18 under a
     uniform synthetic score stream, while replay mass stays
     top-score-dominated in both.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcd_isaac_tpu.level_replay import plr as plr_lib

S = 32          # buffer capacity
A = 8           # actors / episodes per cycle
ALPHA = 0.5
TEMP = 0.1
STALE = 0.3


# ---------------------------------------------------------------------------
# Sequential oracle (reference level_sampler.py semantics)
# ---------------------------------------------------------------------------
class SequentialOracle:
    def __init__(self):
        self.gids = np.full(S, -1, np.int64)     # level identity per slot
        self.scores = np.zeros(S)
        self.staleness = np.zeros(S)
        self.unseen = np.ones(S)
        self.filled = 0
        self.running_sample_count = 0
        self.staging_ts = {}

    # reference _score_transform 'rank' (level_sampler.py:765-770)
    @staticmethod
    def _rank_weights(scores, temperature):
        temp = np.flip(scores.argsort())
        ranks = np.empty_like(temp)
        ranks[temp] = np.arange(len(temp)) + 1
        return 1.0 / ranks ** (1.0 / temperature)

    def sample_weights(self):
        w = self._rank_weights(self.scores, TEMP)
        w = w * (1 - self.unseen)
        z = w.sum()
        if z > 0:
            w = w / z
        else:
            w = np.ones(S) / S * (1 - self.unseen)
            if w.sum() > 0:
                w /= w.sum()
        if STALE > 0:
            sw = (self.staleness.clip(0)) ** 1.0       # 'power', temp 1
            sw = sw * (1 - self.unseen)
            z = sw.sum()
            sw = sw / z if z > 0 else (1 - self.unseen) / max(
                (1 - self.unseen).sum(), 1)
            w = (1 - STALE) * w + STALE * sw
        return w

    def _next_buffer_index(self):
        if self.filled < S:
            return self.filled
        return int(self.sample_weights().argmin())   # replay_support

    def stage(self, gid):
        self.staging_ts[gid] = self.running_sample_count

    def staged_episode_done(self, gid, score):
        """_partial_update_seed_score_buffer(done=True), one episode."""
        idx = self._next_buffer_index()
        if self.scores[idx] <= score or self.unseen[idx] > 0:
            self.unseen[idx] = 0.0
            self.gids[idx] = gid
            self.scores[idx] = score
            self.staleness[idx] = (
                self.running_sample_count - self.staging_ts[gid])
            self.filled = min(self.filled + 1, S)
        del self.staging_ts[gid]

    def working_episode_done(self, gid, score):
        """update_seed_score EWA fold (level_sampler.py:204-212)."""
        idxs = np.nonzero(self.gids == gid)[0]
        if len(idxs) == 0:
            return
        idx = int(idxs[0])
        self.unseen[idx] = 0.0
        self.scores[idx] = (1 - ALPHA) * self.scores[idx] + ALPHA * score
        # the runner's per-episode mid-rollout replay also resets staleness
        # for seeds played this rollout (adversarial_runner.py:551-558 +
        # _update_staleness on each draw)

    def replay_draw(self, gid):
        """_update_staleness(selected) per sampled level."""
        self.running_sample_count += 1
        if STALE > 0:
            self.staleness += 1
            idxs = np.nonzero(self.gids == gid)[0]
            if len(idxs):
                self.staleness[int(idxs[0])] = 0


# ---------------------------------------------------------------------------
def _episode_score(gid, cycle):
    """Deterministic per-(level, cycle) episode score in [0, 1]."""
    x = (int(gid) * 2654435761 + int(cycle) * 40503) % (2 ** 31)
    return (x % 10000) / 10000.0


class _MiniRollout(NamedTuple):
    rewards: jnp.ndarray
    dones: jnp.ndarray
    cliffhangers: jnp.ndarray
    level_seeds: jnp.ndarray


def _batched_rollout(seeds, scores):
    """One-step episodes: value_l1 score == |returns - values| == score."""
    T, N = 1, len(seeds)
    r = _MiniRollout(
        rewards=jnp.asarray(scores, jnp.float32).reshape(T, N),
        dones=jnp.ones((T, N), bool),
        cliffhangers=jnp.zeros((T, N), bool),
        level_seeds=jnp.asarray(seeds, jnp.int32).reshape(T, N))
    returns = jnp.asarray(scores, jnp.float32).reshape(T, N)
    values = jnp.zeros((T, N))
    return r, returns, values


def _gid_distribution(weights, gids):
    d = {}
    for w, g in zip(weights, gids):
        if g >= 0:
            d[g] = d.get(g, 0.0) + float(w)
    return d


def _tv(p, q):
    keys = set(p) | set(q)
    return 0.5 * sum(abs(p.get(k, 0.0) - q.get(k, 0.0)) for k in keys)


def _buf_from_oracle(oracle, cfg):
    """Couple the batched buffer to the oracle's exact state."""
    buf = plr_lib.init_plr(cfg, level_shape=(1,), level_dtype=jnp.int32)
    filled = oracle.gids >= 0
    return buf.replace(
        levels=jnp.asarray(oracle.gids, jnp.int32).reshape(S, 1),
        scores=jnp.asarray(oracle.scores, jnp.float32),
        staleness=jnp.asarray(oracle.staleness, jnp.float32),
        unseen=jnp.asarray(oracle.unseen, jnp.float32),
        filled=jnp.asarray(filled),
        slot_ids=jnp.where(jnp.asarray(filled),
                           jnp.arange(S, dtype=jnp.int32), -1),
        next_id=jnp.int32(S),
        sample_count=jnp.float32(oracle.running_sample_count))


@pytest.mark.slow
def test_one_cycle_divergence_coupled():
    """Per-cycle deviation of the batched redesign, isolated from
    compounding: before every cycle the batched buffer is RESET to the
    oracle's exact state; both consume the identical episode stream for
    one cycle; the TV distance between the resulting replay distributions
    measures exactly the batched promotion/EWA/staleness deviation.

    Measured (seed 0, 300 cycles): mean TV 0.0021, p95 0.0053,
    max 0.021 — one cycle of the batched variant moves the replay
    distribution by ~0.2% of probability mass on average vs the
    reference's sequential algorithm.  Bounds ~2x measured.
    """
    cfg = plr_lib.PLRConfig(
        capacity=S, num_actors=A, full_distribution=True,
        strategy='value_l1', score_transform='rank', temperature=TEMP,
        alpha=ALPHA, staleness_coef=STALE, rho=0.5, replay_prob=0.5,
        dedup=False)
    oracle = SequentialOracle()
    update = jax.jit(lambda b, r, ret, v: plr_lib.update_with_rollout(
        b, cfg, r, ret, v))
    promote = jax.jit(lambda b, lv, sc, ct: plr_lib.promote_staged(
        b, cfg, lv, sc, ct))

    rng = np.random.RandomState(0)
    next_gid = 1
    tvs = []
    for cycle in range(300):
        buf = _buf_from_oracle(oracle, cfg)       # <- coupling
        replay = (cycle % 2 == 1) and oracle.filled >= 4
        if not replay:
            gids = np.arange(next_gid, next_gid + A, dtype=np.int64)
            next_gid += A
            scores = np.array([_episode_score(g, cycle) for g in gids])
            for g in gids:
                oracle.stage(int(g))
            for g, s in zip(gids, scores):
                oracle.staged_episode_done(int(g), float(s))
            seeds = S + np.arange(A)
            r, ret, v = _batched_rollout(seeds, scores)
            buf, st_scores, st_counts = update(buf, r, ret, v)
            buf = promote(
                buf, jnp.asarray(gids, jnp.int32).reshape(A, 1),
                st_scores, st_counts)
        else:
            bg = np.asarray(buf.levels[:, 0])
            p_o = _gid_distribution(oracle.sample_weights(), oracle.gids)
            keys = sorted(p_o)
            probs = np.array([p_o[k] for k in keys])
            probs = probs / probs.sum()
            gids = rng.choice(keys, size=A, p=probs)
            scores = np.array([_episode_score(g, cycle) for g in gids])
            for g in gids:
                oracle.replay_draw(int(g))
            for g, s in zip(gids, scores):
                oracle.working_episode_done(int(g), float(s))
            slots = np.array([
                int(np.nonzero(bg == g)[0][0]) for g in gids
                if (bg == g).any()], np.int32)
            stal = np.asarray(buf.staleness) + len(gids)
            stal[slots] = 0.0
            buf = buf.replace(
                staleness=jnp.asarray(stal),
                sample_count=buf.sample_count + len(gids))
            pad_slots = np.full(A, -1, np.int32)
            pad_scores = np.zeros(A)
            pad_slots[:len(slots)] = slots
            pad_scores[:len(slots)] = scores[:len(slots)]
            r, ret, v = _batched_rollout(pad_slots, pad_scores)
            buf, _, _ = update(buf, r, ret, v)

        if cycle >= 10:
            p_b = _gid_distribution(
                np.asarray(plr_lib.sample_weights(buf, cfg)),
                np.asarray(buf.levels[:, 0]))
            p_o = _gid_distribution(oracle.sample_weights(), oracle.gids)
            tvs.append(_tv(p_b, p_o))

    tvs = np.array(tvs)
    assert tvs.mean() < 0.005, tvs.mean()
    assert tvs.max() < 0.05, tvs.max()


@pytest.mark.slow
def test_replay_distribution_tracks_sequential_oracle():
    cfg = plr_lib.PLRConfig(
        capacity=S, num_actors=A, full_distribution=True,
        strategy='value_l1', score_transform='rank', temperature=TEMP,
        alpha=ALPHA, staleness_coef=STALE, rho=0.5, replay_prob=0.5,
        dedup=False)
    buf = plr_lib.init_plr(cfg, level_shape=(1,), level_dtype=jnp.int32)
    oracle = SequentialOracle()

    update = jax.jit(lambda b, r, ret, v: plr_lib.update_with_rollout(
        b, cfg, r, ret, v))
    promote = jax.jit(lambda b, lv, sc, ct: plr_lib.promote_staged(
        b, cfg, lv, sc, ct))

    rng = np.random.RandomState(0)
    next_gid = 1
    stats = []
    CYCLES = 400
    for cycle in range(CYCLES):
        replay = (cycle % 2 == 1) and oracle.filled >= 4
        if not replay:
            # generate: each actor creates one fresh level, one episode
            gids = np.arange(next_gid, next_gid + A, dtype=np.int64)
            next_gid += A
            scores = np.array([_episode_score(g, cycle) for g in gids])
            # oracle: stage then fold sequentially in actor order
            for g in gids:
                oracle.stage(int(g))
            for g, s in zip(gids, scores):
                oracle.staged_episode_done(int(g), float(s))
            # batched: staged seeds >= capacity, promote once per cycle
            seeds = S + np.arange(A)
            r, ret, v = _batched_rollout(seeds, scores)
            buf, st_scores, st_counts = update(buf, r, ret, v)
            buf = promote(
                buf, jnp.asarray(gids, jnp.int32).reshape(A, 1),
                st_scores, st_counts)
        else:
            # replay: draw A gids from the MEAN of both distributions via
            # a shared RNG, play one episode each in BOTH implementations
            bw = np.asarray(plr_lib.sample_weights(buf, cfg))
            bg = np.asarray(buf.levels[:, 0])
            p_b = _gid_distribution(bw, bg)
            p_o = _gid_distribution(oracle.sample_weights(), oracle.gids)
            keys = sorted(set(p_b) | set(p_o))
            probs = np.array(
                [0.5 * (p_b.get(k, 0) + p_o.get(k, 0)) for k in keys])
            probs = probs / probs.sum()
            gids = rng.choice(keys, size=A, p=probs)
            scores = np.array([_episode_score(g, cycle) for g in gids])
            # oracle: staleness per draw, then EWA folds in actor order
            for g in gids:
                oracle.replay_draw(int(g))
            for g, s in zip(gids, scores):
                oracle.working_episode_done(int(g), float(s))
            # batched: map gids -> slots; apply the same staleness rule
            # sample_replay_levels uses (age all by A, reset drawn)
            slots = np.array([
                int(np.nonzero(bg == g)[0][0]) for g in gids
                if (bg == g).any()], np.int32)
            stal = np.asarray(buf.staleness) + len(gids)
            stal[slots] = 0.0
            buf = buf.replace(
                staleness=jnp.asarray(stal),
                sample_count=buf.sample_count + len(gids))
            # pad to A so the jitted update has a fixed shape (-1 ignored)
            pad_slots = np.full(A, -1, np.int32)
            pad_scores = np.zeros(A)
            pad_slots[:len(slots)] = slots
            pad_scores[:len(slots)] = scores[:len(slots)]
            r, ret, v = _batched_rollout(pad_slots, pad_scores)
            buf, _, _ = update(buf, r, ret, v)

        if cycle >= 50:
            bw = np.asarray(plr_lib.sample_weights(buf, cfg))
            bs = np.asarray(buf.scores)[np.asarray(buf.filled)]
            ow = oracle.sample_weights()
            os_ = oracle.scores[oracle.gids >= 0]
            stats.append((
                bs.mean(), os_.mean(),
                _entropy(bw), _entropy(ow),
                np.sort(bs), np.sort(os_),
            ))

    bms, oms, bes, oes = (np.array([s[i] for s in stats])
                          for i in range(4))
    d_score = np.abs(bms - oms).mean()
    d_ent = np.abs(bes - oes).mean()
    w1 = np.mean([np.abs(s[4] - s[5]).mean() for s in stats
                  if len(s[4]) == len(s[5])])
    # Long-run free-running drift (the documented elitism deviation):
    # without within-cycle chain eviction the batched buffer converges to
    # a HIGHER score floor than the reference under a uniform synthetic
    # score stream (reference retains low-score levels via its
    # sacrificial argmin slot churn).  Measured (seed 0, 400 cycles):
    # mean |d mean-score| 0.18, mean |d entropy| <= 0.45 nats, W1 <= 0.25.
    # These bounds RECORD the deviation magnitude; per-cycle fidelity is
    # asserted tightly by test_one_cycle_divergence_coupled (TV ~0.2%).
    assert d_score < 0.25, d_score
    assert d_ent < 0.6, d_ent
    assert w1 < 0.30, w1
    # the curriculum's core guarantee must survive: high-score levels
    # dominate replay mass in BOTH implementations
    bw = np.asarray(plr_lib.sample_weights(buf, cfg))
    bs = np.asarray(buf.scores)
    top = np.argsort(-bs)[:S // 4]
    assert bw[top].sum() > 0.5, bw[top].sum()
    ow = oracle.sample_weights()
    otop = np.argsort(-oracle.scores)[:S // 4]
    assert ow[otop].sum() > 0.5, ow[otop].sum()


def _entropy(w):
    w = np.asarray(w, np.float64)
    w = w[w > 0]
    w = w / w.sum()
    return float(-(w * np.log(w)).sum())


if __name__ == '__main__':
    # measurement mode
    test_one_cycle_divergence_coupled()
    test_replay_distribution_tracks_sequential_oracle()
    print('parity tests passed')
