"""Adversarial (UED) BipedalWalker environment, pure JAX.

Reference envs/bipedalwalker/adversarial.py: the level is an 8-d parameter
vector (roughness, pit-gap lo/hi, stump-height lo/hi, stair-height lo/hi,
stair-steps) plus a terrain seed; the teacher emits one scalar ∈ [-1, 1] per
design step, mapped into PARAM_RANGES_FULL/EASY (:54-63, :404-435).

Level encoding = (9,) float32: 8 params + the uint32 seed value-cast into the
final float32 lane (exact round trip).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import numpy as np
import jax.numpy as jnp

from ..seeds import draw_seed, f32_to_seed, seed_to_f32

from .env import WalkerState, gen_walker_obs, reset_walker, step_walker

# (lo, hi) per design dimension (adversarial.py:54-63)
PARAM_RANGES_FULL = np.array([
    [0.0, 10.0],   # ground roughness
    [0.0, 10.0],   # pit gap 1
    [0.0, 10.0],   # pit gap 2
    [0.0, 5.0],    # stump height 1
    [0.0, 5.0],    # stump height 2
    [0.0, 5.0],    # stair height 1
    [0.0, 5.0],    # stair height 2
    [1.0, 9.0],    # stair steps
])
PARAM_RANGES_EASY = np.array([
    [0.0, 0.6], [0.0, 0.0], [0.8, 0.8], [0.0, 0.0],
    [0.4, 0.4], [0.0, 0.0], [0.4, 0.4], [1.0, 1.0],
])
# mutation deltas (adversarial.py:66-75): scalar delta or uniform range
PARAM_MUT_LO = np.array([0.0, 0.4, 0.4, 0.2, 0.2, 0.2, 0.2, 1.0])
PARAM_MUT_HI = np.array([0.6, 0.4, 0.4, 0.2, 0.2, 0.2, 0.2, 1.0])

DEFAULT_LEVEL_PARAMS = np.array(
    [0.0, 0.0, 10.0, 0.0, 5.0, 0.0, 5.0, 9.0])


@dataclasses.dataclass(frozen=True)
class WalkerParams:
    mode: str = 'full'        # 'full' | 'easy'
    poet: bool = False
    max_steps: int = 2000
    random_z_dim: int = 10


class AdversarialWalker:
    def __init__(self, params: WalkerParams | None = None, **kwargs):
        self.params = params or WalkerParams(**kwargs)

    # -- spaces ------------------------------------------------------------
    @property
    def obs_shapes(self):
        return (24,)

    @property
    def adversary_obs_shapes(self):
        n = 5 if self.params.poet else 8
        return {'image': (n,), 'time_step': (),
                'random_z': (self.params.random_z_dim,)}

    @property
    def num_actions(self) -> int:
        return 4  # continuous dims

    @property
    def adversary_num_actions(self) -> int:
        return 1

    adversary_discrete = False

    @property
    def adversary_rollout_steps(self) -> int:
        return 5 if self.params.poet else 8

    @property
    def level_shape(self):
        return (9,)

    @property
    def level_dtype(self):
        return jnp.float32

    @property
    def max_episode_steps(self) -> int:
        return self.params.max_steps

    @property
    def _ranges(self):
        return jnp.asarray(
            PARAM_RANGES_EASY if self.params.mode == 'easy'
            else PARAM_RANGES_FULL)

    # -- helpers -----------------------------------------------------------
    def _poet_mask(self, params: jnp.ndarray) -> jnp.ndarray:
        if self.params.poet:
            # POET: first 5 dims only; stairs disabled
            return params.at[5:].set(0.0)
        return params

    def _adv_obs(self, state: WalkerState, rng) -> dict:
        img = state.level_params[:5] if self.params.poet \
            else state.level_params
        return {
            'image': img,
            'time_step': state.adv_step_count,
            'random_z': jax.random.uniform(
                rng, (self.params.random_z_dim,)),
        }

    def _fresh_state(self, params, seed) -> WalkerState:
        return reset_walker(self._poet_mask(params), seed,
                            self.params.max_steps)

    # -- UED protocol ------------------------------------------------------
    def reset(self, rng: jax.Array) -> Tuple[WalkerState, dict]:
        r1, r2 = jax.random.split(rng)
        seed = draw_seed(r1)
        state = self._fresh_state(DEFAULT_LEVEL_PARAMS, seed)
        state = state.replace(adv_step_count=jnp.int32(0))
        return state, self._adv_obs(state, r2)

    def step_adversary(self, state: WalkerState, action: jnp.ndarray,
                       rng: jax.Array) -> Tuple[WalkerState, dict, jnp.ndarray]:
        a = jnp.clip(jnp.reshape(action, ()), -1.0, 1.0)
        t = state.adv_step_count
        ranges = self._ranges
        lo = ranges[t, 0]
        hi = ranges[t, 1]
        value = (a + 1.0) / 2.0 * (hi - lo) + lo
        params = state.level_params.at[t].set(value)
        t = t + 1
        done = t >= self.adversary_rollout_steps

        r_seed, r_z = jax.random.split(rng)
        new_seed = draw_seed(r_seed)
        seed = jnp.where(done, new_seed, state.level_seed)
        state = state.replace(
            level_params=params, level_seed=seed, adv_step_count=t)
        return state, self._adv_obs(state, r_z), done

    def reset_agent(self, state: WalkerState) -> Tuple[WalkerState, jnp.ndarray]:
        state = self._fresh_state(state.level_params, state.level_seed)
        return state, gen_walker_obs(state)

    def reset_random(self, rng: jax.Array) -> Tuple[WalkerState, jnp.ndarray]:
        r1, r2 = jax.random.split(rng)
        ranges = self._ranges
        u = jax.random.uniform(r1, (8,))
        params = u * (ranges[:, 1] - ranges[:, 0]) + ranges[:, 0]
        seed = draw_seed(r2)
        state = self._fresh_state(params, seed)
        return state, gen_walker_obs(state)

    def reset_alp_gmm(self, task: jnp.ndarray, rng: jax.Array):
        """ALP-GMM task vector (each dim in [0, 2]) → level params
        (reference adversarial.py:346-370: a-1 mapped through the ranges)."""
        a = task[:8] - 1.0
        ranges = self._ranges
        params = (a + 1.0) / 2.0 * (ranges[:, 1] - ranges[:, 0]) + ranges[:, 0]
        seed = draw_seed(rng)
        state = self._fresh_state(params, seed)
        return state, gen_walker_obs(state)

    def reset_to_level(self, level: jnp.ndarray):
        params = level[:8]
        seed = f32_to_seed(level[8])
        state = self._fresh_state(params, seed)
        return state, gen_walker_obs(state)

    def get_level(self, state: WalkerState) -> jnp.ndarray:
        seed_f = seed_to_f32(state.level_seed)
        return jnp.concatenate(
            [state.level_params, seed_f[None]]).astype(jnp.float32)

    def mutate_level(self, state: WalkerState, rng: jax.Array,
                     num_edits: int):
        """ACCEL mutation: ±delta edits + re-seed (adversarial.py:379-402)."""
        n_mut = 5 if self.params.poet else 8
        params = state.level_params

        def body(i, carry):
            params, rng = carry
            rng, r1, r2, r3 = jax.random.split(rng, 4)
            a = jax.random.randint(r1, (), 0, n_mut)
            d = jax.random.randint(r2, (), 0, 3) - 1
            mag = jax.random.uniform(
                r3, minval=jnp.asarray(PARAM_MUT_LO)[a],
                maxval=jnp.maximum(jnp.asarray(PARAM_MUT_HI)[a],
                                   jnp.asarray(PARAM_MUT_LO)[a] + 1e-9))
            new = jnp.clip(
                params[a] + d.astype(jnp.float32) * mag,
                jnp.asarray(PARAM_RANGES_FULL)[a, 0],
                jnp.asarray(PARAM_RANGES_FULL)[a, 1])
            return params.at[a].set(new), rng

        params, rng = jax.lax.fori_loop(
            0, num_edits, body, (params, rng))
        seed = draw_seed(rng)
        state = self._fresh_state(params, seed)
        return state, gen_walker_obs(state)

    def step(self, state: WalkerState, action: jnp.ndarray, rng=None):
        state, obs, reward, env_done, finish = step_walker(state, action)
        timeout = state.step_count >= self.params.max_steps
        done = env_done | timeout
        info = {'truncated': timeout & ~env_done}
        return state, obs, reward, done, info


def make_walker_env(env_name: str):
    if 'POET' in env_name:
        poet = True
    else:
        poet = False
    easy = 'Easy' in env_name
    return AdversarialWalker(WalkerParams(
        mode='easy' if easy else 'full', poet=poet))
