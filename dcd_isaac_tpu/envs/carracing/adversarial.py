"""Adversarial (UED) CarRacing environment.

Reference envs/box2d/car_racing_adversarial.py: the teacher plots up to 12
control points on a 10×10 sketch grid, one (x, y, skip) action per step
(skip allowed after 3 points, :285-322); the level is the control-point
list (+ start alpha).  DR levels sample random control points
(car_racing_bezier reset → bezier.get_random_points).

Level encoding = (27,) float32:
[cp_x0, cp_y0, …, cp_x11, cp_y11, n_points, start_alpha, seed_bits].
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .bezier import get_bezier_track, random_control_points
from .env import CarRacingConfig, CarRacingState, make_carracing_core
from .track import PLAYFIELD, Track, build_track

SKETCH_DIM = 10
SKETCH_RATIO = PLAYFIELD / SKETCH_DIM
N_CP = 12
LEVEL_DIM = N_CP * 2 + 3


def _bezier_track_padded(cps: jnp.ndarray, n: jnp.ndarray,
                         capacity: int) -> Track:
    """Variable-count control points → fixed-capacity Track.

    lax.switch over the 3..12 point counts, each branch a static-shape
    bezier; curve points padded with a valid mask.
    """
    numpoints = capacity // N_CP  # 40

    def branch(k):
        def f(cps):
            curve = get_bezier_track(cps[:k], numpoints=numpoints)
            pad = capacity - curve.shape[0]
            valid = jnp.concatenate(
                [jnp.ones((curve.shape[0],), bool),
                 jnp.zeros((pad,), bool)])
            curve = jnp.concatenate(
                [curve, jnp.broadcast_to(curve[-1:], (pad, 2))])
            return curve, valid
        return f

    ks = list(range(3, N_CP + 1))
    idx = jnp.clip(n, 3, N_CP) - 3
    curve, valid = jax.lax.switch(idx, [branch(k) for k in ks], cps)
    return build_track(curve, valid)


@dataclasses.dataclass(frozen=True)
class CarRacingUEDParams:
    cfg: CarRacingConfig = CarRacingConfig()
    random_z_dim: int = 4
    use_skip: bool = True
    choose_start_pos: bool = False
    sparse_rewards: bool = False


class AdversarialCarRacing:
    def __init__(self, params: CarRacingUEDParams | None = None, **kwargs):
        self.params = params or CarRacingUEDParams(**kwargs)
        self.cfg = self.params.cfg
        self._fresh_state, self._step = make_carracing_core(self.cfg)

    # -- spaces ------------------------------------------------------------
    @property
    def obs_shapes(self):
        H, W = self.cfg.obs_hw
        return (H, W, self.cfg.obs_channels)

    @property
    def adversary_obs_shapes(self):
        return {'image': (SKETCH_DIM, SKETCH_DIM, 1), 'time_step': (),
                'random_z': (self.params.random_z_dim,)}

    @property
    def num_actions(self) -> int:
        return 3    # steer, gas, brake (continuous)

    @property
    def adversary_num_actions(self) -> int:
        return 3    # x, y, skip ∈ [0, 1]

    adversary_discrete = False

    @property
    def adversary_rollout_steps(self) -> int:
        return N_CP + int(self.params.choose_start_pos) + int(
            self.params.sparse_rewards)

    @property
    def level_shape(self):
        return (LEVEL_DIM,)

    @property
    def level_dtype(self):
        return jnp.float32

    @property
    def max_episode_steps(self) -> int:
        # outer (wrapper) steps
        return self.cfg.max_inner_steps // self.cfg.num_action_repeat

    # -- helpers -----------------------------------------------------------
    def _adv_obs(self, state: CarRacingState, rng) -> dict:
        """Sketch obs from the design-phase control points
        (car_racing_adversarial.py:140-152)."""
        cells = jnp.clip(
            jnp.round(state.adv_cps / SKETCH_RATIO) - 1, 0,
            SKETCH_DIM - 1).astype(jnp.int32)
        cp_valid = jnp.arange(N_CP) < state.adv_n
        sketch = jnp.zeros((SKETCH_DIM, SKETCH_DIM)).at[
            cells[:, 0], cells[:, 1]].max(cp_valid.astype(jnp.float32))
        return {
            'image': sketch[..., None],
            'time_step': state.adv_step_count,
            'random_z': jax.random.uniform(
                rng, (self.params.random_z_dim,)),
        }

    def _make_level(self, cps, n, start_alpha, seed):
        seed_f = jax.lax.bitcast_convert_type(
            seed.astype(jnp.uint32), jnp.float32)
        return jnp.concatenate([
            cps.reshape(-1), n.astype(jnp.float32)[None],
            jnp.asarray(start_alpha, jnp.float32)[None], seed_f[None]])

    def _decode_level(self, level):
        cps = level[:N_CP * 2].reshape(N_CP, 2)
        n = jnp.round(level[N_CP * 2]).astype(jnp.int32)
        start_alpha = level[N_CP * 2 + 1]
        seed = jax.lax.bitcast_convert_type(level[N_CP * 2 + 2], jnp.uint32)
        return cps, n, start_alpha, seed

    def _build_state(self, cps, n, start_alpha, seed):
        track = _bezier_track_padded(cps, n, self.cfg.track_capacity)
        level = self._make_level(cps, n, start_alpha, seed)
        state, obs = self._fresh_state(track, level, seed)
        return state, obs

    # -- UED protocol ------------------------------------------------------
    def reset(self, rng: jax.Array):
        """Empty sketch ready for the teacher (reference reset(), :131-152)."""
        r1, r2 = jax.random.split(rng)
        # dummy circle track keeps the state pytree well-formed pre-design
        theta = jnp.linspace(0, 2 * jnp.pi, N_CP, endpoint=False)
        cps = (jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1)
               * PLAYFIELD * 0.4 + PLAYFIELD / 2)
        seed = jax.random.randint(
            r1, (), 0, jnp.iinfo(jnp.int32).max).astype(jnp.uint32)
        state, _ = self._build_state(cps, jnp.int32(N_CP), 0.0, seed)
        state = state.replace(
            adv_cps=jnp.zeros((N_CP, 2)), adv_n=jnp.int32(0),
            adv_step_count=jnp.int32(0))
        return state, self._adv_obs(state, r2)

    def step_adversary(self, state: CarRacingState, action: jnp.ndarray,
                       rng: jax.Array):
        """One sketch move (x, y, skip) ∈ [0,1]^3
        (car_racing_adversarial.py:285-322)."""
        x, y, skip = action[0], action[1], action[2]
        t = state.adv_step_count
        # unnormalize_xy: snap to the 10x10 sketch grid (:237-243)
        cell_x = jnp.clip(jnp.round(SKETCH_DIM * x), 0, SKETCH_DIM - 1)
        cell_y = jnp.clip(jnp.round(SKETCH_DIM * y), 0, SKETCH_DIM - 1)
        ux = (cell_x + 1) * SKETCH_RATIO
        uy = (cell_y + 1) * SKETCH_RATIO

        skipping = (t > 3) & self.params.use_skip & jnp.isclose(skip, 1.0)
        place = (t < N_CP) & ~skipping
        adv_cps = jnp.where(
            place,
            state.adv_cps.at[jnp.minimum(state.adv_n, N_CP - 1)].set(
                jnp.stack([ux, uy])),
            state.adv_cps)
        adv_n = state.adv_n + place.astype(jnp.int32)

        t = t + 1
        done = t >= self.adversary_rollout_steps
        r_seed, r_z = jax.random.split(rng)
        new_seed = jax.random.randint(
            r_seed, (), 0, jnp.iinfo(jnp.int32).max).astype(jnp.uint32)

        state = state.replace(
            adv_cps=adv_cps, adv_n=adv_n, adv_step_count=t)
        # On done, commit the designed level into the encoded form; the
        # track itself is rebuilt by reset_agent.
        n_final = jnp.maximum(adv_n, 3)
        level = self._make_level(adv_cps, n_final, 0.0, new_seed)
        state = state.replace(
            control_points=jnp.where(done, level, state.control_points),
            level_seed=jnp.where(done, new_seed, state.level_seed))
        return state, self._adv_obs(state, r_z), done

    def reset_random(self, rng: jax.Array):
        """DR: random bezier control points (car_racing_bezier reset)."""
        r1, r2 = jax.random.split(rng)
        cps = random_control_points(r1, N_CP, scale=PLAYFIELD)
        seed = jax.random.randint(
            r2, (), 0, jnp.iinfo(jnp.int32).max).astype(jnp.uint32)
        return self._build_state(cps, jnp.int32(N_CP), 0.0, seed)

    def reset_to_level(self, level: jnp.ndarray):
        cps, n, start_alpha, seed = self._decode_level(level)
        return self._build_state(cps, n, start_alpha, seed)

    def get_level(self, state: CarRacingState) -> jnp.ndarray:
        return state.control_points

    def reset_agent(self, state: CarRacingState):
        return self.reset_to_level(state.control_points)

    def mutate_level(self, state: CarRacingState, rng, num_edits: int):
        """Jitter control points on the sketch grid (ACCEL extension; the
        reference has no car-racing editor - documented extension)."""
        cps, n, start_alpha, seed = self._decode_level(state.control_points)
        r1, r2, r3 = jax.random.split(rng, 3)
        which = jax.random.randint(r1, (num_edits,), 0, N_CP)
        delta = jax.random.uniform(
            r2, (num_edits, 2), minval=-SKETCH_RATIO, maxval=SKETCH_RATIO)
        cps = cps.at[which].add(delta)
        cps = jnp.clip(cps, 0.0, PLAYFIELD)
        new_seed = jax.random.randint(
            r3, (), 0, jnp.iinfo(jnp.int32).max).astype(jnp.uint32)
        return self._build_state(cps, n, start_alpha, new_seed)

    def step(self, state, action, rng=None):
        return self._step(state, action, rng)


def make_carracing_env(env_name: str):
    if 'Adversarial' in env_name or env_name.startswith('CarRacing-Bezier'):
        return AdversarialCarRacing()
    raise ValueError(env_name)
