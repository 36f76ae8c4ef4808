"""Adversarial (UED) CarRacing environment.

Reference envs/box2d/car_racing_adversarial.py: the teacher plots up to 12
control points on a 10×10 sketch grid, one (x, y, skip) action per step
(skip allowed after 3 points, :285-322); the level is the control-point
list (+ start alpha).  DR levels sample random control points
(car_racing_bezier reset → bezier.get_random_points).

Sparse-reward (REPAIRED) extensions: a final adversary step chooses a goal
bin (car_racing_adversarial.py:275-322), and with ``choose_start_pos`` the
step after the control points sets the start position by polar angle
(:161-180).

Level encoding = (28,) float32:
[cp_x0, cp_y0, …, cp_x11, cp_y11, n_points, start_alpha, goal_bin,
 seed_bits] with start_alpha = -1 meaning "unset" (start index 0) and
goal_bin = -1 meaning dense rewards.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..seeds import draw_seed, f32_to_seed, seed_to_f32

from .bezier import get_bezier_track, random_control_points
from .env import CarRacingConfig, CarRacingState, make_carracing_core
from .track import PLAYFIELD, Track, build_track

SKETCH_DIM = 10
SKETCH_RATIO = PLAYFIELD / SKETCH_DIM
N_CP = 12
LEVEL_DIM = N_CP * 2 + 4


def _alpha_from_xy(x, y):
    """Polar angle in [0, 2π) (car_racing_adversarial.py:154-159)."""
    alpha = jnp.arctan2(y, x)
    return jnp.where(alpha < 0, alpha + 2 * jnp.pi, alpha)


def _closest_track_index(track: Track, cps, n, start_alpha):
    """Track index whose polar angle around the control-point mean is
    nearest to start_alpha (car_racing_adversarial.py:173-180).

    Track points are centered; the control-point mean is shifted by the
    track's bbox offset to the same frame.
    """
    cp_valid = (jnp.arange(N_CP) < n)[:, None]
    u = (cps * cp_valid).sum(0) / jnp.maximum(n, 1) - track.offset
    alphas = _alpha_from_xy(track.points[:, 0] - u[0],
                            track.points[:, 1] - u[1])
    diff = jnp.where(track.valid, jnp.abs(alphas - start_alpha), jnp.inf)
    idx = jnp.argmin(diff).astype(jnp.int32)
    return jnp.where(start_alpha < 0, jnp.int32(0), idx)


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

    @property
    def sparse_rewards(self) -> bool:
        return self.cfg.sparse_rewards

    @property
    def num_goal_bins(self) -> int:
        return self.cfg.num_goal_bins


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
        shapes = {'image': (SKETCH_DIM, SKETCH_DIM, 1), 'time_step': (),
                  'random_z': (self.params.random_z_dim,)}
        if self.params.sparse_rewards:
            shapes['goal_bin'] = ()
        return shapes

    @property
    def num_actions(self) -> int:
        return 3    # steer, gas, brake (continuous)

    @property
    def adversary_num_actions(self) -> int:
        # (x, y, skip) ∈ [0, 1], + trailing goal-bin slot in sparse mode
        return 3 + int(self.params.sparse_rewards)

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
        obs = {
            'image': sketch[..., None],
            'time_step': state.adv_step_count,
            'random_z': jax.random.uniform(
                rng, (self.params.random_z_dim,)),
        }
        if self.params.sparse_rewards:
            obs['goal_bin'] = state.adv_goal_bin
        return obs

    def _make_level(self, cps, n, start_alpha, goal_bin, seed):
        seed_f = seed_to_f32(seed.astype(jnp.uint32))
        return jnp.concatenate([
            cps.reshape(-1), n.astype(jnp.float32)[None],
            jnp.asarray(start_alpha, jnp.float32)[None],
            jnp.asarray(goal_bin, jnp.float32)[None], seed_f[None]])

    def _decode_level(self, level):
        cps = level[:N_CP * 2].reshape(N_CP, 2)
        n = jnp.round(level[N_CP * 2]).astype(jnp.int32)
        start_alpha = level[N_CP * 2 + 1]
        goal_bin = jnp.round(level[N_CP * 2 + 2]).astype(jnp.int32)
        seed = f32_to_seed(level[N_CP * 2 + 3])
        return cps, n, start_alpha, goal_bin, seed

    def _build_state(self, cps, n, start_alpha, goal_bin, seed):
        track = _bezier_track_padded(cps, n, self.cfg.track_capacity)
        level = self._make_level(cps, n, start_alpha, goal_bin, seed)
        start_idx = _closest_track_index(track, cps, n, start_alpha)
        state, obs = self._fresh_state(track, level, seed,
                                       start_idx=start_idx,
                                       goal_bin=goal_bin)
        return state, obs

    # -- UED protocol ------------------------------------------------------
    def reset(self, rng: jax.Array):
        """Empty sketch ready for the teacher (reference reset(), :131-152)."""
        r1, r2 = jax.random.split(rng)
        # dummy circle track keeps the state pytree well-formed pre-design
        theta = jnp.linspace(0, 2 * jnp.pi, N_CP, endpoint=False)
        cps = (jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1)
               * PLAYFIELD * 0.4 + PLAYFIELD / 2)
        seed = draw_seed(r1)
        state, _ = self._build_state(
            cps, jnp.int32(N_CP), jnp.float32(-1.0), jnp.int32(-1), seed)
        state = state.replace(
            adv_cps=jnp.zeros((N_CP, 2)), adv_n=jnp.int32(0),
            adv_step_count=jnp.int32(0),
            adv_start_alpha=jnp.float32(-1.0),
            adv_goal_bin=jnp.int32(self.params.num_goal_bins))
        return state, self._adv_obs(state, r2)

    def step_adversary(self, state: CarRacingState, action: jnp.ndarray,
                       rng: jax.Array):
        """One design step (car_racing_adversarial.py:285-322).

        Steps 0..n_control_points-1 place sketch points from (x, y, skip);
        with choose_start_pos the next step sets the start angle; with
        sparse_rewards the final step picks the goal bin from the trailing
        action slot.
        """
        x, y, skip = action[0], action[1], action[2]
        t = state.adv_step_count
        is_start_step = (self.params.choose_start_pos
                         and (t == N_CP))
        is_goal_step = (self.params.sparse_rewards
                        & (t == self.adversary_rollout_steps - 1))
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

        # start-position step: angle of (ux, uy) around the cp mean (:161-171)
        if self.params.choose_start_pos:
            cp_valid = (jnp.arange(N_CP) < adv_n)[:, None]
            u = (adv_cps * cp_valid).sum(0) / jnp.maximum(adv_n, 1)
            alpha = _alpha_from_xy(ux - u[0], uy - u[1])
            start_alpha = jnp.where(
                is_start_step, alpha, state.adv_start_alpha)
        else:
            start_alpha = state.adv_start_alpha

        # goal step: trailing action slot carries the (already sampled) bin
        if self.params.sparse_rewards:
            bin_act = jnp.clip(
                jnp.round(action[3]), 0,
                self.params.num_goal_bins - 1).astype(jnp.int32)
            goal_bin = jnp.where(is_goal_step, bin_act, state.adv_goal_bin)
        else:
            goal_bin = state.adv_goal_bin

        t = t + 1
        done = t >= self.adversary_rollout_steps
        r_seed, r_z = jax.random.split(rng)
        new_seed = draw_seed(r_seed)

        state = state.replace(
            adv_cps=adv_cps, adv_n=adv_n, adv_step_count=t,
            adv_start_alpha=start_alpha, adv_goal_bin=goal_bin)
        # On done, commit the designed level into the encoded form; the
        # track itself is rebuilt by reset_agent.
        n_final = jnp.maximum(adv_n, 3)
        level_goal = jnp.where(
            self.params.sparse_rewards
            & (goal_bin < self.params.num_goal_bins),
            goal_bin, -1).astype(jnp.int32)
        level = self._make_level(
            adv_cps, n_final, start_alpha, level_goal, new_seed)
        state = state.replace(
            control_points=jnp.where(done, level, state.control_points),
            level_seed=jnp.where(done, new_seed, state.level_seed))
        return state, self._adv_obs(state, r_z), done

    def reset_random(self, rng: jax.Array):
        """DR: random bezier control points (car_racing_bezier reset);
        sparse mode draws a random goal bin (set_goal, :232-241)."""
        r1, r2, r3 = jax.random.split(rng, 3)
        cps = random_control_points(r1, N_CP, scale=PLAYFIELD)
        seed = draw_seed(r2)
        if self.params.sparse_rewards:
            goal_bin = jax.random.randint(
                r3, (), 1, self.params.num_goal_bins).astype(jnp.int32)
        else:
            goal_bin = jnp.int32(-1)
        return self._build_state(
            cps, jnp.int32(N_CP), jnp.float32(-1.0), goal_bin, seed)

    def reset_to_level(self, level: jnp.ndarray):
        cps, n, start_alpha, goal_bin, seed = self._decode_level(level)
        return self._build_state(cps, n, start_alpha, goal_bin, seed)

    def get_level(self, state: CarRacingState) -> jnp.ndarray:
        return state.control_points

    def reset_agent(self, state: CarRacingState):
        return self.reset_to_level(state.control_points)

    def mutate_level(self, state: CarRacingState, rng, num_edits: int):
        """Jitter control points on the sketch grid (ACCEL extension; the
        reference has no car-racing editor - documented extension)."""
        cps, n, start_alpha, goal_bin, seed = self._decode_level(
            state.control_points)
        r1, r2, r3 = jax.random.split(rng, 3)
        which = jax.random.randint(r1, (num_edits,), 0, N_CP)
        delta = jax.random.uniform(
            r2, (num_edits, 2), minval=-SKETCH_RATIO, maxval=SKETCH_RATIO)
        cps = cps.at[which].add(delta)
        cps = jnp.clip(cps, 0.0, PLAYFIELD)
        new_seed = draw_seed(r3)
        return self._build_state(cps, n, start_alpha, goal_bin, new_seed)

    def step(self, state, action, rng=None):
        return self._step(state, action, rng)


def make_carracing_env(env_name: str, args=None):
    if 'Adversarial' in env_name or env_name.startswith('CarRacing-Bezier'):
        if args is None:
            return AdversarialCarRacing()
        # reference _make_env kwargs (util/__init__.py:146-171); shaping is
        # forced off in sparse mode (:164)
        sparse = getattr(args, 'sparse_rewards', False)
        cfg = CarRacingConfig(
            grayscale=args.grayscale,
            crop=args.crop_frame,
            frame_stack=args.frame_stack,
            num_action_repeat=args.num_action_repeat,
            reward_shaping=args.reward_shaping and not sparse,
            sparse_rewards=sparse,
            num_goal_bins=getattr(args, 'num_goal_bins', 24),
            clip_reward=args.clip_reward,
            n_control_points=args.num_control_points,
        )
        return AdversarialCarRacing(CarRacingUEDParams(
            cfg=cfg,
            use_skip=args.use_skip,
            choose_start_pos=args.choose_start_pos,
        ))
    raise ValueError(env_name)
