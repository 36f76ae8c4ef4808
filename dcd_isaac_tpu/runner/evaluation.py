"""Zero-shot evaluation harness.

Replaces reference eval.py's Evaluator (subprocess envs stepping until
num_episodes returns collect, eval.py:250-329) with a batched design: each
test env contributes ``num_episodes`` level instances evaluated in one
fixed-length jitted scan (one episode per instance — the level layouts are
fixed per episode, so parallel instances ≡ sequential episodes).
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.multigrid import AdversarialMultiGrid
from ..envs.multigrid.mazes import EVAL_ENVS, ZS_MINIGRID_BENCHMARK
from ..models.distributions import categorical_sample


def _solved_threshold(env_name: str) -> float:
    """Return threshold counting as solved (eval.py:160-163)."""
    if env_name.startswith('Bipedal'):
        return 230.0
    return 0.0


class Evaluator:
    """Evaluates a student model on named OOD test envs."""

    def __init__(self, env_names: List[str], num_episodes: int = 10,
                 deterministic: bool = False):
        self.env_names = [e for e in env_names if e]
        self.num_episodes = num_episodes
        self.deterministic = deterministic
        self._progs = {}

    def _make_prog(self, spec, model):
        env = AdversarialMultiGrid(spec.params)
        T = spec.params.max_steps

        def prog(params, levels, rng):
            n = levels.shape[0]
            env_states, obs = jax.vmap(env.reset_to_level)(levels)
            carry = model.initial_carry((n,))
            mask = jnp.zeros((n,), jnp.float32)

            def step(scan_carry, _):
                rng, env_states, obs, carry, mask, done_acc, ret = scan_carry
                rng, r_act = jax.random.split(rng)
                logits, _, carry = model.apply(params, obs, carry, mask)
                if self.deterministic:
                    action = jnp.argmax(logits, -1)
                else:
                    action = categorical_sample(r_act, logits)
                env_states, obs, reward, done, _ = jax.vmap(env.step)(
                    env_states, action)
                ret = ret + reward * (1.0 - done_acc)
                done_acc = jnp.maximum(done_acc, done.astype(jnp.float32))
                mask = 1.0 - done_acc
                return (rng, env_states, obs, carry, mask, done_acc, ret), None

            init = (rng, env_states, obs, carry, mask,
                    jnp.zeros((n,)), jnp.zeros((n,)))
            (rng, env_states, obs, carry, mask, done_acc, ret), _ = (
                jax.lax.scan(step, init, None, length=T))
            return ret

        return env, jax.jit(prog)

    def evaluate(self, model, params, rng=None,
                 seed: int = 0) -> Dict[str, float]:
        rng = rng if rng is not None else jax.random.PRNGKey(seed)
        np_rng = np.random.RandomState(seed)
        stats = {}
        for name in self.env_names:
            spec = EVAL_ENVS[name]
            if name not in self._progs:
                self._progs[name] = self._make_prog(spec, model)
            env, prog = self._progs[name]
            levels = jnp.asarray(spec.build(np_rng, self.num_episodes))
            rng, sub = jax.random.split(rng)
            returns = np.asarray(prog(params, levels, sub))
            thr = _solved_threshold(name)
            stats[f'solved_rate:{name}'] = float((returns > thr).mean())
            stats[f'test_returns:{name}'] = float(returns.mean())
        return stats
