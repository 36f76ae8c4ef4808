"""Zero-shot BipedalWalker evaluation suite.

Reference envs/bipedalwalker/walker_test_envs.py — each test env is an
EnvConfig; here each is an 8-d level-parameter vector for the JAX terrain
generator (the generator already maps the vector through the same EnvConfig
semantics).  Seeds vary per episode, like the reference's time-based
reseeding on every reset.

BipedalWalker-v3 / Hardcore-v3 are the standard gym envs and are NOT in
this table: they use the exact gym terrain state machine (gym_terrain.py
+ gym_env.py), matching the distribution the published solved-rate
baselines were measured on.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

# [roughness, pit_lo, pit_hi, stump_lo, stump_hi, stair_lo, stair_hi, steps]
WALKER_TEST_PARAMS: Dict[str, List[float]] = {
    'BipedalWalker-Default-v0': [0, 0, 0, 0, 0, 0, 0, 0],
    'BipedalWalker-Med-Stumps-v0': [0, 0, 0, 2, 2, 0, 0, 0],
    'BipedalWalker-Med-StumpHeight-v0': [0, 0, 0, 2, 2, 0, 0, 0],
    'BipedalWalker-High-Stumps-v0': [0, 0, 0, 5, 5, 0, 0, 0],
    'BipedalWalker-Med-Pits-v0': [0, 5, 5, 0, 0, 0, 0, 0],
    'BipedalWalker-Med-PitGap-v0': [0, 5, 5, 0, 0, 0, 0, 0],
    'BipedalWalker-Wide-Pits-v0': [0, 10, 10, 0, 0, 0, 0, 0],
    'BipedalWalker-Med-Stairs-v0': [0, 0, 0, 0, 0, 2, 2, 5],
    'BipedalWalker-High-Stairs-v0': [0, 0, 0, 0, 0, 5, 5, 9],
    'BipedalWalker-Med-Roughness-v0': [5, 0, 0, 0, 0, 0, 0, 0],
    'BipedalWalker-High-Roughness-v0': [9, 0, 0, 0, 0, 0, 0, 0],
    'BipedalWalker-Insane-v0': [5, 10, 10, 5, 5, 5, 5, 9],
}

# POET "Rose" configs (walker_test_envs.py:203-210):
# id = [roughness, stump_lo, stump_hi, pit_hi, pit_lo]
_ROSES = {
    '1a': [5.6, 2.4, 2.82, 6.4, 4.48],
    '1b': [5.44, 1.8, 2.82, 6.72, 4.48],
    '2a': [7.2, 1.98, 2.82, 7.2, 5.6],
    '2b': [5.76, 2.16, 2.76, 7.2, 1.6],
    '3a': [5.28, 1.98, 2.76, 7.2, 4.8],
    '3b': [4.8, 2.4, 2.76, 4.48, 4.8],
}
for _id, v in _ROSES.items():
    WALKER_TEST_PARAMS[f'BipedalWalker-POET-Rose-{_id}-v0'] = [
        v[0], v[4], v[3], v[1], v[2], 0, 0, 0]

BIPEDAL_BENCHMARK = [
    'BipedalWalker-v3',
    'BipedalWalkerHardcore-v3',
    'BipedalWalker-Med-Stairs-v0',
    'BipedalWalker-Med-PitGap-v0',
    'BipedalWalker-Med-StumpHeight-v0',
    'BipedalWalker-Med-Roughness-v0',
]

POETROSE_BENCHMARK = [
    f'BipedalWalker-POET-Rose-{i}-v0'
    for i in ['1a', '1b', '2a', '2b', '3a', '3b']]


def build_walker_levels(env_name: str, rng: np.random.RandomState,
                        n: int) -> np.ndarray:
    """(n, 9) float32 level encodings (params + random seed per episode)."""
    params = np.asarray(WALKER_TEST_PARAMS[env_name], np.float32)
    out = np.empty((n, 9), np.float32)
    out[:, :8] = params
    # Value-cast encoding to match envs/seeds.py (seed_to_f32 / f32_to_seed):
    # seeds live in [0, 2^24) so every value round-trips losslessly through
    # float32. (A raw-bits .view() here would be misdecoded by the value-cast
    # reader — ~50% of draws would collapse to seed 0/1.)
    seeds = rng.randint(0, 1 << 24, size=n).astype(np.uint32)
    out[:, 8] = seeds.astype(np.float32)
    return out
