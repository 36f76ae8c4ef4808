"""Zero-shot evaluation harness.

Replaces reference eval.py's Evaluator (subprocess envs stepping until
num_episodes returns collected, eval.py:250-329) with a batched design: each
test env contributes ``num_episodes`` level instances evaluated in one
fixed-length jitted scan (one episode per instance — level layouts are fixed
per episode, so parallel instances ≡ sequential episodes).

Covers the reference benchmark suites (eval.py:332-368): 'maze' (MultiGrid
OOD), 'bipedal' and 'poetrose' (walker), 'f1' (CarRacing).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.multigrid import AdversarialMultiGrid
from ..envs.multigrid.mazes import EVAL_ENVS, ZS_MINIGRID_BENCHMARK
from ..envs.walker import AdversarialWalker, WalkerParams
from ..envs.walker.test_envs import (
    BIPEDAL_BENCHMARK, POETROSE_BENCHMARK, WALKER_TEST_PARAMS,
    build_walker_levels,
)


def _solved_threshold(env_name: str) -> float:
    """Return threshold counting as solved (eval.py:160-163)."""
    if env_name.startswith('Bipedal'):
        return 230.0
    return 0.0


def benchmark_env_names(benchmark: str) -> List[str]:
    if benchmark == 'maze':
        return list(ZS_MINIGRID_BENCHMARK)
    if benchmark == 'bipedal':
        return list(BIPEDAL_BENCHMARK)
    if benchmark == 'poetrose':
        return list(POETROSE_BENCHMARK)
    if benchmark == 'f1':
        from ..envs.carracing.f1 import F1_BENCHMARK
        return list(F1_BENCHMARK)
    raise ValueError(benchmark)


class Evaluator:
    """Evaluates a student model on named OOD test envs."""

    def __init__(self, env_names: List[str], num_episodes: int = 10,
                 deterministic: bool = False):
        self.env_names = [e for e in env_names if e]
        self.num_episodes = num_episodes
        self.deterministic = deterministic
        self._progs = {}

    def _build_env(self, name: str):
        """→ (env, T, build_levels(np_rng, n) -> levels array)."""
        if name in ('BipedalWalker-v3', 'BipedalWalkerHardcore-v3'):
            # genuine gym terrain (reference eval.py:354-363 evaluates on
            # the real gym envs, not POET-parameterized approximations)
            from ..envs.walker.gym_env import GymWalkerEnv, build_gym_levels
            hardcore = 'Hardcore' in name
            env = GymWalkerEnv(hardcore)
            return env, env.max_steps, (
                lambda rng, n: build_gym_levels(hardcore, rng, n))
        if name in WALKER_TEST_PARAMS:
            env = AdversarialWalker(WalkerParams())
            return env, env.params.max_steps, (
                lambda rng, n: jnp.asarray(build_walker_levels(name, rng, n)))
        if name in EVAL_ENVS:
            spec = EVAL_ENVS[name]
            env = AdversarialMultiGrid(spec.params)
            return env, spec.params.max_steps, (
                lambda rng, n: jnp.asarray(spec.build(rng, n)))
        if name.startswith('CarRacing'):
            from ..envs.carracing import make_eval_builder
            return make_eval_builder(name)
        raise ValueError(f'Unknown eval env {name}')

    def _make_prog(self, name: str, model):
        env, T, build = self._build_env(name)

        def prog(params, levels, rng):
            n = levels.shape[0]
            env_states, obs = jax.vmap(env.reset_to_level)(levels)
            carry = model.initial_carry((n,))
            mask = jnp.zeros((n,), jnp.float32)

            def step(scan_carry, _):
                rng, env_states, obs, carry, mask, done_acc, ret = scan_carry
                rng, r_act = jax.random.split(rng)
                out, _, carry = model.apply(params, obs, carry, mask)
                if self.deterministic:
                    # per-model protocol: handles Beta mode + action-bound
                    # scaling (regression: reference eval.py deterministic)
                    action = model.deterministic_action(out)
                else:
                    action, _ = model.sample_action(r_act, out)
                env_states, obs, reward, done, _ = jax.vmap(env.step)(
                    env_states, action)
                ret = ret + reward * (1.0 - done_acc)
                done_acc = jnp.maximum(done_acc, done.astype(jnp.float32))
                mask = 1.0 - done_acc
                return (rng, env_states, obs, carry, mask, done_acc, ret), None

            init = (rng, env_states, obs, carry, mask,
                    jnp.zeros((n,)), jnp.zeros((n,)))
            final, _ = jax.lax.scan(step, init, None, length=T)
            return final[-1]

        return build, jax.jit(prog)

    def evaluate(self, model, params, rng=None,
                 seed: int = 0) -> Dict[str, float]:
        rng = rng if rng is not None else jax.random.PRNGKey(seed)
        np_rng = np.random.RandomState(seed)
        stats = {}
        for name in self.env_names:
            if name not in self._progs:
                self._progs[name] = self._make_prog(name, model)
            build, prog = self._progs[name]
            levels = build(np_rng, self.num_episodes)
            rng, sub = jax.random.split(rng)
            returns = np.asarray(prog(params, levels, sub))
            thr = _solved_threshold(name)
            stats[f'solved_rate:{name}'] = float((returns > thr).mean())
            stats[f'test_returns:{name}'] = float(returns.mean())
        return stats
