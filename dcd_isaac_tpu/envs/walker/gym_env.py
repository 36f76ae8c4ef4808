"""Genuine gym BipedalWalker-v3 / Hardcore-v3 as eval envs.

A thin facade over the JAX walker core: terrain comes from the exact gym
state machine (gym_terrain.py, host-side per episode), stepping/reward/
termination are the shared step_walker path.  Episode limits follow the
real gym registrations (v3: 1600 steps, Hardcore-v3: 2000) rather than
the reference's 2000-step custom registrations, because the 230-return
solved threshold (BASELINE.md) was measured on the gym envs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import physics as ph
from .env import gen_walker_obs, reset_walker_from_terrain, step_walker
from .gym_terrain import decode_gym_level, encode_gym_level


def build_gym_levels(hardcore: bool, np_rng: np.random.RandomState,
                     n: int) -> jnp.ndarray:
    seeds = np_rng.randint(0, 2 ** 31 - 1, size=n)
    return jnp.asarray(
        np.stack([encode_gym_level(hardcore, int(s)) for s in seeds]))


class GymWalkerEnv:
    def __init__(self, hardcore: bool):
        self.max_steps = 2000 if hardcore else 1600

    def reset_to_level(self, level: jnp.ndarray):
        xs, ys, boxes, n_boxes, seed = decode_gym_level(level)
        terrain = ph.Terrain(xs=xs, ys=ys, boxes=boxes, n_boxes=n_boxes)
        seed_u32 = seed.astype(jnp.uint32)
        state = reset_walker_from_terrain(terrain, seed_u32)
        return state, gen_walker_obs(state)

    def step(self, state, action, rng=None):
        state, obs, reward, env_done, finish = step_walker(state, action)
        timeout = state.step_count >= self.max_steps
        done = env_done | timeout
        info = {'truncated': timeout & ~env_done}
        return state, obs, reward, done, info
