"""Rollout harnesses: `lax.scan` over vectorized envs.

Replaces the reference's subprocess vec-env hot loop
(adversarial_runner.agent_rollout, adversarial_runner.py:442-635 +
parallel_wrappers.worker) with a single compiled scan: policy forward, env
step, auto-reset, episode accounting and (for PLR replay cycles) mid-rollout
level resampling all happen on-device with no host round trips.

Auto-reset on done is pluggable (`reset_fn`), covering the reference's three
behaviors:
  * replay same level       → reset_agent            (worker step_env)
  * fresh random level      → reset_random           (step_env reset_random=True)
  * sample new replay level → masked gather from the level buffer
                              (adversarial_runner.py:551-558)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.distributions import categorical_sample
from .storage import Rollout


class StepCarry(NamedTuple):
    rng: jax.Array
    env_state: Any
    obs: Any
    rnn_carry: Any
    mask: jnp.ndarray          # (N,) mask entering the next step
    level_seeds: jnp.ndarray   # (N,) int32
    # episode accounting (VecMonitor semantics)
    epi_return: jnp.ndarray    # (N,) running (unclipped) episode return
    epi_count: jnp.ndarray     # (N,) completed episodes this rollout
    ret_sum: jnp.ndarray       # (N,) sum of completed episode returns
    ret_max: jnp.ndarray       # (N,) max completed episode return
    # VecNormalize returns-RMS reward normalization (vec_normalize.py:37-53)
    ret_accum: jnp.ndarray     # (N,) discounted return accumulator
    rms_mean: jnp.ndarray      # ()
    rms_var: jnp.ndarray       # ()
    rms_count: jnp.ndarray     # ()


@dataclasses.dataclass(frozen=True)
class RolloutConfig:
    num_steps: int
    clip_reward: Optional[float] = None
    handle_timelimits: bool = False
    random_agent: bool = False   # uniform-random policy (DR teacher)
    normalize_returns_gamma: Optional[float] = None  # VecNormalize γ
    # lax.scan unroll factor for the per-step rollout loop (--rollout_unroll):
    # unrolling lets XLA fuse across consecutive env/policy steps, trading
    # compile time and code size for fewer per-step launch overheads
    unroll: int = 1


def make_student_rollout(
    env,
    model,
    cfg: RolloutConfig,
    reset_fn: Callable[[jax.Array, Any, jnp.ndarray], Any] = None,
    sample_action_fn: Callable = None,
):
    """Build rollout(params, carry: StepCarry) → (StepCarry, Rollout, stats).

    ``reset_fn(rng, env_state, seed) -> (env_state, obs, seed)`` is applied
    per-slot on episode end (vmapped); default replays the same level via
    ``env.reset_agent``.
    """
    num_actions = env.num_actions
    T = cfg.num_steps

    # The default auto-reset (replay same level) is deterministic — skip
    # the per-step N-way key split the stochastic reset_fns need.
    reset_needs_rng = reset_fn is not None
    if reset_fn is None:
        def reset_fn(rng, state, seed):
            state, obs = env.reset_agent(state)
            return state, obs, seed

    v_step = jax.vmap(lambda s, a: env.step(s, a))
    v_reset = jax.vmap(reset_fn)

    is_discrete = model.dist_type == 'categorical'

    def policy_step(params, obs, rnn_carry, mask, rng):
        out, value, rnn_carry = model.apply(params, obs, rnn_carry, mask)
        action, log_prob = model.sample_action(rng, out)
        if cfg.random_agent:
            n = value.shape[0]
            if hasattr(model, 'random_action'):
                action = model.random_action(rng, out)
            elif is_discrete:
                action = jax.random.randint(rng, (n,), 0, num_actions)
                log_prob = model.log_prob_entropy(out, action)[0]
            else:
                action = jax.random.uniform(
                    rng, action.shape, minval=-1.0, maxval=1.0)
            value = jnp.zeros_like(value)
        # Full log-dist for discrete (PLR entropy scores); log-prob otherwise
        # (reference storage.py:83-88).
        log_dist = (jax.nn.log_softmax(out, axis=-1) if is_discrete
                    else log_prob)
        return action, value, log_prob, log_dist, rnn_carry

    def rollout(params, carry: StepCarry):
        # Same-level auto-reset: the post-reset state/obs is EXACTLY the
        # rollout's initial state (reset_agent is deterministic given the
        # level, which _ro_same never changes) — so finished slots select
        # against these constants instead of recomputing reset_agent +
        # gen_obs every step.
        if not reset_needs_rng:
            init_state, init_obs, init_seeds = (
                carry.env_state, carry.obs, carry.level_seeds)

        def scan_step(carry: StepCarry, t):
            rng, r_act, r_env, r_reset = jax.random.split(carry.rng, 4)
            action, value, log_prob, log_dist, rnn_carry = policy_step(
                params, carry.obs, carry.rnn_carry, carry.mask, r_act)

            env_state, next_obs, reward, done, info = v_step(
                carry.env_state, action)
            truncated = info['truncated']

            # Rollout-final forced termination (adversarial_runner.py:497-512)
            is_last = t == T - 1
            cliffhanger = is_last & ~done
            if cfg.handle_timelimits:
                truncated = jnp.where(is_last, truncated | ~done, truncated)
            done = jnp.where(is_last, jnp.ones_like(done), done)

            # Truncation bootstrap value V(s_trunc) — the pre-reset next obs
            # with the post-step hidden state (storage.py:208-231 semantics).
            if cfg.handle_timelimits:
                _, trunc_value, _ = model.apply(
                    params, next_obs, rnn_carry,
                    jnp.ones_like(carry.mask))
                trunc_value = jax.lax.stop_gradient(trunc_value)
            else:
                trunc_value = jnp.zeros_like(value)

            # Episode accounting (unclipped rewards, VecMonitor).
            epi_return = carry.epi_return + reward
            real_done = done & ~cliffhanger  # cliffhangers don't log episodes
            epi_count = carry.epi_count + real_done.astype(jnp.int32)
            ret_sum = carry.ret_sum + jnp.where(real_done, epi_return, 0.0)
            ret_max = jnp.where(
                real_done, jnp.maximum(carry.ret_max, epi_return),
                carry.ret_max)

            # VecNormalize: divide rewards by the returns RMS (the episode
            # stats above use raw rewards, matching the wrapper order).
            if cfg.normalize_returns_gamma is not None:
                g = cfg.normalize_returns_gamma
                ret_accum = carry.ret_accum * g + reward
                b_mean = ret_accum.mean()
                b_var = ret_accum.var()
                bc = ret_accum.shape[0]
                delta = b_mean - carry.rms_mean
                tot = carry.rms_count + bc
                rms_mean = carry.rms_mean + delta * bc / tot
                m2 = (carry.rms_var * carry.rms_count + b_var * bc
                      + delta ** 2 * carry.rms_count * bc / tot)
                rms_var = m2 / tot
                rms_count = tot
                reward = reward / jnp.sqrt(rms_var + 1e-8)
                ret_accum = jnp.where(real_done, 0.0, ret_accum)
            else:
                ret_accum = carry.ret_accum
                rms_mean, rms_var, rms_count = (
                    carry.rms_mean, carry.rms_var, carry.rms_count)

            if cfg.clip_reward:
                reward = jnp.clip(
                    reward, -cfg.clip_reward, cfg.clip_reward)

            # Auto-reset finished slots (including cliffhangers is harmless:
            # the next cycle begins with a fresh reset anyway, but PLR replay
            # needs real dones to resample immediately).
            n = done.shape[0]
            if reset_needs_rng:
                # Stochastic resets (PLR replay / DR resample) rebuild the
                # level from scratch — for walker that is full terrain
                # generation per env. Dones are rare within a rollout, so
                # gate the whole reset computation on "any slot finished";
                # identical semantics (sel() only reads reset values where
                # real_done is true) and the no-done steps skip the work.
                # This path is never vmapped (replay rollouts run unstacked
                # in _student_phase), so the cond is a real branch, not a
                # select. Measured: walker replay cycles ~11 s -> ~4 s.
                def _do_reset(_):
                    return v_reset(
                        jax.random.split(r_reset, n), env_state,
                        carry.level_seeds)

                def _skip_reset(_):
                    return env_state, next_obs, carry.level_seeds

                reset_state, reset_obs, reset_seed = jax.lax.cond(
                    real_done.any(), _do_reset, _skip_reset, None)
            else:
                reset_state, reset_obs, reset_seed = (
                    init_state, init_obs, init_seeds)

            def sel(new, old):
                m = real_done.reshape((n,) + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)

            env_state = jax.tree.map(sel, reset_state, env_state)
            next_obs = jax.tree.map(sel, reset_obs, next_obs)
            next_seeds = jnp.where(real_done, reset_seed, carry.level_seeds)

            step_data = Rollout(
                obs=carry.obs,
                actions=action,
                log_probs=log_prob,
                log_dists=log_dist,
                values=value,
                rewards=reward,
                masks_pre=carry.mask,
                dones=done,
                bad_masks=1.0 - truncated.astype(jnp.float32),
                cliffhangers=cliffhanger,
                trunc_values=trunc_value,
                level_seeds=carry.level_seeds,
            )
            new_carry = StepCarry(
                rng=rng,
                env_state=env_state,
                obs=next_obs,
                rnn_carry=rnn_carry,
                mask=1.0 - done.astype(jnp.float32),
                level_seeds=next_seeds,
                epi_return=jnp.where(real_done, 0.0, epi_return),
                epi_count=epi_count,
                ret_sum=ret_sum,
                ret_max=ret_max,
                ret_accum=ret_accum,
                rms_mean=rms_mean,
                rms_var=rms_var,
                rms_count=rms_count,
            )
            return new_carry, step_data

        final, steps = jax.lax.scan(scan_step, carry, jnp.arange(T),
                                    unroll=cfg.unroll)

        # Bootstrap value of the final obs (reference next_value).
        _, next_value, _ = model.apply(
            params, final.obs, final.rnn_carry, final.mask)
        next_value = jax.lax.stop_gradient(next_value)

        has_epi = final.epi_count > 0
        stats = {
            'mean_return': jnp.where(
                has_epi, final.ret_sum / jnp.maximum(final.epi_count, 1), 0.0),
            'max_return': jnp.where(has_epi, final.ret_max, 0.0),
            'episode_count': final.epi_count,
        }
        return final, steps, next_value, stats

    return rollout


def initial_step_carry(env, model, env_state, obs, rng, level_seeds=None,
                       ret_rms=None):
    """Fresh StepCarry for a batch of already-reset envs.

    ``ret_rms`` = (ret_accum, mean, var, count) carried across cycles when
    return normalization is active (the VecNormalize statistics persist for
    the whole run)."""
    n = jax.tree.leaves(obs)[0].shape[0]
    if level_seeds is None:
        level_seeds = jnp.full((n,), -1, dtype=jnp.int32)
    if ret_rms is None:
        ret_rms = (jnp.zeros((n,)), jnp.float32(0.0), jnp.float32(1.0),
                   jnp.float32(1e-4))
    return StepCarry(
        rng=rng,
        env_state=env_state,
        obs=obs,
        rnn_carry=model.initial_carry((n,)),
        mask=jnp.zeros((n,), jnp.float32),  # mask[0]=0: fresh episodes
        level_seeds=level_seeds,
        epi_return=jnp.zeros((n,)),
        epi_count=jnp.zeros((n,), jnp.int32),
        ret_sum=jnp.zeros((n,)),
        ret_max=jnp.full((n,), -jnp.inf),
        ret_accum=ret_rms[0],
        rms_mean=ret_rms[1],
        rms_var=ret_rms[2],
        rms_count=ret_rms[3],
    )


def make_adversary_rollout(env, model, adv_steps: int,
                           random_agent: bool = False):
    """Teacher construction scan (reference agent_rollout is_env branch).

    rollout(params, env_states, obs0, rng) → (env_states, Rollout, next_value)
    Rewards are zero; the final step's reward is later replaced by the regret
    (storage.replace_final_reward).  Obs are the adversary dicts.
    """
    T = adv_steps
    num_actions = env.adversary_num_actions
    v_adv = jax.vmap(env.step_adversary)

    is_discrete = model.dist_type == 'categorical'

    def rollout(params, env_state, obs0, rng):
        n = jax.tree.leaves(obs0)[0].shape[0]
        carry0 = (rng, env_state, obs0, model.initial_carry((n,)),
                  jnp.zeros((n,), jnp.float32))

        def scan_step(carry, t):
            rng, env_state, obs, rnn_carry, mask = carry
            rng, r_act, r_env = jax.random.split(rng, 3)
            out, value, rnn_carry = model.apply(
                params, obs, rnn_carry, mask)
            action, log_prob = model.sample_action(r_act, out)
            if random_agent:
                if hasattr(model, 'random_action'):
                    action = model.random_action(r_act, out)
                elif is_discrete:
                    action = jax.random.randint(r_act, (n,), 0, num_actions)
                    log_prob = model.log_prob_entropy(out, action)[0]
                else:
                    action = jax.random.uniform(
                        r_act, action.shape, minval=-1.0, maxval=1.0)
                value = jnp.zeros_like(value)
            log_dist = (jax.nn.log_softmax(out, axis=-1) if is_discrete
                        else log_prob)

            env_state, next_obs, done = v_adv(
                env_state, action, jax.random.split(r_env, n))

            step_data = Rollout(
                obs=obs,
                actions=action,
                log_probs=log_prob,
                log_dists=log_dist,
                values=value,
                rewards=jnp.zeros((n,)),
                masks_pre=mask,
                dones=done,
                bad_masks=jnp.ones((n,)),
                cliffhangers=jnp.zeros((n,), jnp.bool_),
                trunc_values=jnp.zeros((n,)),
                level_seeds=jnp.full((n,), -1, jnp.int32),
            )
            new_mask = 1.0 - done.astype(jnp.float32)
            return (rng, env_state, next_obs, rnn_carry, new_mask), step_data

        (rng, env_state, obs, rnn_carry, mask), steps = jax.lax.scan(
            scan_step, carry0, jnp.arange(T))

        _, next_value, _ = model.apply(params, obs, rnn_carry, mask)
        return env_state, steps, jax.lax.stop_gradient(next_value)

    return rollout
