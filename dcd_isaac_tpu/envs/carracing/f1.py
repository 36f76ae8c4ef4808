"""Formula-1 benchmark tracks (reference envs/box2d/racetracks/formula1.py).

20 real F1 track centerlines (point sets extracted to data/formula1.npz)
played through the same engine: a fixed Track replaces the bezier curve.
The eval suite excludes LagunaSeca (eval.py:332-335).
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import numpy as np

F1_DOWNSAMPLE = 4        # 5000 → 1250 centerline points
_DATA = os.path.join(os.path.dirname(__file__), 'data', 'formula1.npz')


@functools.lru_cache()
def load_f1_tracks() -> Dict[str, dict]:
    raw = np.load(_DATA)
    names = sorted({k[:-3] for k in raw.files if k.endswith('_xy')})
    tracks = {}
    for name in names:
        xy = raw[f'{name}_xy'][::F1_DOWNSAMPLE].astype(np.float32)
        bounds, full_zoom, max_steps = raw[f'{name}_meta']
        tracks[name] = {
            'xy': xy,
            'bounds': float(bounds) if bounds else 2000.0,
            'full_zoom': float(full_zoom),
            'max_episode_steps': int(max_steps),
        }
    return tracks


def f1_env_names():
    names = [f'CarRacingF1-{n}-v0' for n in load_f1_tracks()]
    if 'CarRacingF1-LagunaSeca-v0' in names:
        names.remove('CarRacingF1-LagunaSeca-v0')
    return names


def __getattr__(name):
    # F1_BENCHMARK resolved lazily (avoids loading the npz at import time)
    if name == 'F1_BENCHMARK':
        return f1_env_names()
    raise AttributeError(name)


def make_f1_eval_builder(env_name: str):
    """→ (env, T, build(np_rng, n) -> levels) for the Evaluator.

    F1 levels are fixed tracks; the 'level' array is the track name index
    (the env object closes over the track geometry).
    """
    import jax.numpy as jnp

    from .env import CarRacingConfig, make_carracing_core
    from .track import SCALE, build_track

    track_name = env_name[len('CarRacingF1-'):-len('-v0')]
    data = load_f1_tracks()[track_name]
    xy = data['xy'] / 1.0  # track xy already in world units

    class F1Env:
        """Minimal env facade: fixed track, same step core."""

        def __init__(self):
            # eval wrapper: reward_shaping=False (eval.py:190)
            self.cfg = CarRacingConfig(
                track_capacity=xy.shape[0],
                reward_shaping=False,
                playfield=data['bounds'] / SCALE)
            self._fresh_state, self._step = make_carracing_core(self.cfg)
            self._track = build_track(jnp.asarray(xy))

        def reset_to_level(self, level):
            seed = level[0].astype(jnp.uint32)
            return self._fresh_state(
                self._track, jnp.zeros(1), seed)

        def step(self, state, action, rng=None):
            return self._step(state, action, rng)

    env = F1Env()
    T = data['max_episode_steps'] // env.cfg.num_action_repeat

    def build(np_rng, n):
        return jnp.asarray(
            np_rng.randint(0, 2 ** 31 - 1, size=(n, 1)), jnp.uint32)

    return env, T, build
