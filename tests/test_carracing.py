"""CarRacing engine tests: bezier curves, track building, car dynamics,
rewards, rendering, UED protocol."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcd_isaac_tpu.envs.carracing import AdversarialCarRacing
from dcd_isaac_tpu.envs.carracing.bezier import (
    ccw_sort, get_bezier_track, random_control_points,
)
from dcd_isaac_tpu.envs.carracing.dynamics import (
    CAR_MASS, car_step, init_car, wheel_positions,
)
from dcd_isaac_tpu.envs.carracing.track import (
    PLAYFIELD, TRACK_WIDTH, build_track, on_road,
)

ENV = AdversarialCarRacing()


class TestBezier:
    def test_closed_smooth_curve(self):
        rng = jax.random.PRNGKey(0)
        cps = random_control_points(rng, 12, scale=PLAYFIELD)
        curve = np.asarray(get_bezier_track(cps, numpoints=40))
        assert curve.shape == (480, 2)
        # closed: last point near first
        assert np.linalg.norm(curve[0] - curve[-1]) < 20.0
        # smooth: consecutive steps bounded
        steps = np.linalg.norm(np.diff(curve, axis=0), axis=1)
        assert steps.max() < 15.0

    def test_ccw_sort_orders_by_angle(self):
        pts = jnp.asarray(np.random.RandomState(0).rand(8, 2))
        s = np.asarray(ccw_sort(pts))
        d = s - s.mean(0)
        ang = np.arctan2(d[:, 0], d[:, 1])
        assert (np.diff(ang) >= 0).all()


class TestDynamics:
    def test_mass_reasonable(self):
        # gym car: hull density 1 × polys + 4 wheels ≈ 3-6 mass units
        assert 2.0 < CAR_MASS < 10.0

    def test_gas_accelerates_forward(self):
        car = init_car(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))
        on = jnp.ones(4, bool)
        for _ in range(50):
            car = car_step(car, 0.0, 1.0, 0.0, on)
        # angle 0 → forward is +y
        assert float(car.vel[1]) > 5.0
        assert abs(float(car.vel[0])) < 2.0

    def test_brake_stops(self):
        car = init_car(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))
        on = jnp.ones(4, bool)
        for _ in range(50):
            car = car_step(car, 0.0, 1.0, 0.0, on)
        v0 = float(jnp.linalg.norm(car.vel))
        for _ in range(60):
            car = car_step(car, 0.0, 0.0, 1.0, on)
        assert float(jnp.linalg.norm(car.vel)) < v0 * 0.2

    def test_steering_turns(self):
        car = init_car(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))
        on = jnp.ones(4, bool)
        for _ in range(30):
            car = car_step(car, 0.0, 1.0, 0.0, on)
        for _ in range(40):
            car = car_step(car, 1.0, 0.5, 0.0, on)
        assert abs(float(car.angle)) > 0.2

    def test_grass_reduces_grip(self):
        def slide(on_road_flag):
            car = init_car(jnp.float32(0.0), jnp.float32(0.0),
                           jnp.float32(0.0))
            car = car.replace(vel=jnp.array([10.0, 0.0]))  # sideways slide
            on = jnp.full(4, on_road_flag)
            for _ in range(10):
                car = car_step(car, 0.0, 0.0, 0.0, on)
            return float(jnp.abs(car.vel[0]))
        assert slide(True) < slide(False)  # road grips harder


class TestEnv:
    def setup_method(self):
        self.reset = jax.jit(ENV.reset_random)
        self.step = jax.jit(ENV.step)

    def test_reset_obs(self):
        state, obs = self.reset(jax.random.PRNGKey(0))
        assert obs.shape == (96, 96, 12)
        assert float(obs.min()) >= -1.0 and float(obs.max()) <= 1.0
        assert int(state.track.n_points) == 468  # 480 - 12 dup points (ref skips zero-length steps)

    def test_driving_collects_tiles(self):
        state, obs = self.reset(jax.random.PRNGKey(0))
        for i in range(12):
            state, obs, r, d, info = self.step(
                state, jnp.array([0.0, 0.8, 0.0]))
        assert int(state.tile_visited_count) > 0

    def test_early_termination_when_stuck(self):
        state, obs = self.reset(jax.random.PRNGKey(0))
        done = False
        for i in range(40):
            state, obs, r, done, info = self.step(
                state, jnp.array([0.0, 0.0, 1.0]))  # full brake, stand still
            if bool(done):
                break
        assert bool(done)
        # ~100 inner steps of -0.1 → early termination well before timeout
        assert int(state.inner_steps) < 300

    def test_level_roundtrip(self):
        state, _ = self.reset(jax.random.PRNGKey(3))
        lvl = ENV.get_level(state)
        assert lvl.shape == (28,)
        state2, _ = jax.jit(ENV.reset_to_level)(lvl)
        np.testing.assert_allclose(
            np.asarray(state.track.points), np.asarray(state2.track.points),
            atol=1e-4)

    def test_adversary_design(self):
        rng = jax.random.PRNGKey(0)
        state, obs = jax.jit(ENV.reset)(rng)
        assert obs['image'].shape == (10, 10, 1)
        sa = jax.jit(ENV.step_adversary)
        for t in range(12):
            rng, sub = jax.random.split(rng)
            xy = jax.random.uniform(sub, (2,))
            state, obs, done = sa(
                state, jnp.concatenate([xy, jnp.zeros(1)]), sub)
        assert bool(done)
        assert int(state.adv_n) == 12
        # committed level decodes to a working env
        state2, frames = jax.jit(ENV.reset_agent)(state)
        assert frames.shape == (96, 96, 12)
        # sketch-grid control points may coincide -> zero-length segments
        # whose sampled points the tile builder skips (like the reference)
        assert 380 <= int(state2.track.n_points) <= 468

    def test_vmap_batch(self):
        rngs = jax.random.split(jax.random.PRNGKey(1), 3)
        states, obs = jax.vmap(ENV.reset_random)(rngs)
        assert obs.shape == (3, 96, 96, 12)
        acts = jnp.tile(jnp.array([[0.0, 0.5, 0.0]]), (3, 1))
        states, obs, r, d, info = jax.vmap(ENV.step)(states, acts)
        assert r.shape == (3,)


class TestTrackGeometry:
    def test_on_road_at_centerline(self):
        state, _ = jax.jit(ENV.reset_random)(jax.random.PRNGKey(0))
        track = state.track
        pts = track.points[:5]
        road, idx = on_road(track, pts)
        assert bool(road.all())
        # far away → grass
        far = jnp.array([[PLAYFIELD * 2, PLAYFIELD * 2]])
        road2, _ = on_road(track, far)
        assert not bool(road2[0])

    def test_render_shows_road_under_car(self):
        state, obs = jax.jit(ENV.reset_random)(jax.random.PRNGKey(0))
        # after the 1s zoom ramp the car sits on the road: center pixels grey
        state = state.replace(t=jnp.float32(1.5))
        from dcd_isaac_tpu.envs.carracing.track import render_frame
        img = np.asarray(render_frame(
            state.track, state.car.pos, state.car.angle, state.car.vel,
            state.car.angvel, state.car.wheel_omega, state.car.steer_angle,
            state.t))
        # sample a patch on the road directly ahead of the car
        patch = img[40:50, 44:56]
        grey = ((np.abs(patch[..., 0].astype(int)
                        - patch[..., 1].astype(int)) < 12)
                & (patch[..., 0] > 80) & (patch[..., 0] < 140))
        assert grey.mean() > 0.5, patch[..., 0]


class TestSparseRewards:
    """REPAIRED CarRacing: goal bins + sparse reveal + teacher variants
    (reference car_racing_bezier.py:107-129,683-691;
    car_racing_adversarial.py:275-322; car_racing_models.py:168-424)."""

    def _make(self, **kw):
        from dcd_isaac_tpu.envs.carracing import (
            CarRacingConfig, CarRacingUEDParams)
        cfg = CarRacingConfig(
            sparse_rewards=True, num_goal_bins=8, reward_shaping=False,
            track_capacity=120, max_inner_steps=64, num_action_repeat=4)
        return AdversarialCarRacing(CarRacingUEDParams(cfg=cfg, **kw))

    def test_goal_eval_bins(self):
        from dcd_isaac_tpu.envs.carracing.env import _goal_eval
        env = self._make()
        state, _ = jax.jit(env.reset_random)(jax.random.PRNGKey(0))
        track = state.track
        n = int(track.n_points)
        # a tile in the middle of bin 3: distance d with floor(d/step)==3
        step = n / 8
        idx = n - int(3 * step + step / 2)
        new = jnp.zeros((track.capacity,), bool).at[idx].set(True)
        assert bool(_goal_eval(track, new, jnp.int32(3), 8))
        assert not bool(_goal_eval(track, new, jnp.int32(4), 8))
        # edge rule: last bin within 10 tiles of index 0 never triggers
        new0 = jnp.zeros((track.capacity,), bool).at[2].set(True)
        assert not bool(_goal_eval(track, new0, jnp.int32(7), 8))

    def test_sparse_reveal_accumulates(self):
        env = self._make()
        state, _ = jax.jit(env.reset_random)(jax.random.PRNGKey(1))
        step = jax.jit(env.step)
        a = jnp.array([0.0, 1.0, 0.0])
        revealed = []
        for _ in range(8):
            state, o, r, d, info = step(state, a)
            revealed.append(float(r))
        # hidden until goal: every reward is 0 unless goal_reached fired
        if not bool(state.goal_reached):
            assert all(x == 0.0 for x in revealed)
            assert float(state.sparse_accum) != 0.0

    def test_goal_reached_reveals_and_ends(self):
        env = self._make()
        state, _ = jax.jit(env.reset_random)(jax.random.PRNGKey(2))
        # force goal bin 1 (tiles just behind the start line going forward)
        state = state.replace(goal_bin=jnp.int32(1))
        step = jax.jit(env.step)
        a = jnp.array([0.0, 1.0, 0.0])
        done, total = False, 0.0
        for _ in range(16):
            state, o, r, d, info = step(state, a)
            total += float(r)
            if bool(state.goal_reached):
                done = bool(d)
                break
        if bool(state.goal_reached):
            assert done
            assert total != 0.0  # the accumulated sum was revealed

    def test_teacher_goal_and_start_steps(self):
        env = self._make(use_skip=True, choose_start_pos=True)
        assert env.adversary_rollout_steps == 14
        assert env.adversary_num_actions == 4
        rng = jax.random.PRNGKey(3)
        state, obs = env.reset(rng)
        assert int(obs['goal_bin']) == 8
        sa = jax.jit(env.step_adversary)
        for t in range(env.adversary_rollout_steps):
            a = jnp.array([0.3 + 0.04 * t, 0.6, 0.0, 5.0])
            rng, r = jax.random.split(rng)
            state, obs, done = sa(state, a, r)
        assert bool(done)
        assert int(state.adv_goal_bin) == 5
        assert float(state.adv_start_alpha) >= 0
        # level round-trips goal bin + start alpha
        lvl = env.get_level(state)
        s2, _ = jax.jit(env.reset_to_level)(lvl)
        assert int(s2.goal_bin) == 5
        # start position honored: not necessarily index 0
        assert s2.car.pos.shape == (2,)

    def test_categorical_teacher_masks_and_logprobs(self):
        from dcd_isaac_tpu.models.car_racing_models import (
            CarRacingAdversaryNetwork)
        env = self._make(use_skip=True)
        model = CarRacingAdversaryNetwork(
            time_step_dim=env.adversary_rollout_steps + 1,
            use_categorical=True, use_skip=True, use_goal=True,
            num_goal_bins=8)
        rng = jax.random.PRNGKey(0)
        state, obs = env.reset(rng)
        obs_b = jax.tree.map(lambda x: x[None], obs)
        params = model.init(rng, obs_b, (), jnp.ones((1,)))
        out, value, _ = model.apply(params, obs_b, (), jnp.ones((1,)))
        # empty sketch, 0 placed: skip (index 0) must be masked
        assert float(out['logits'][0, 0]) < -1e30
        action, lp = model.sample_action(rng, out)
        assert action.shape == (1, 4)
        lp2, ent = model.log_prob_entropy(out, action)
        assert jnp.allclose(lp, lp2, atol=1e-5)
        # sampled cell is one of the 100 non-skip actions
        assert 0.0 <= float(action[0, 0]) < 1.0

    def test_random_action_modes(self):
        from dcd_isaac_tpu.models.car_racing_models import (
            CarRacingAdversaryNetwork)
        env = self._make()
        for cat in (False, True):
            model = CarRacingAdversaryNetwork(
                time_step_dim=env.adversary_rollout_steps + 1,
                use_categorical=cat, use_goal=True, num_goal_bins=8)
            rng = jax.random.PRNGKey(1)
            state, obs = env.reset(rng)
            obs_b = jax.tree.map(lambda x: x[None], obs)
            params = model.init(rng, obs_b, (), jnp.ones((1,)))
            out, _, _ = model.apply(params, obs_b, (), jnp.ones((1,)))
            a = model.random_action(rng, out)
            assert a.shape == (1, 4)
            assert 0 <= float(a[0, 3]) < 8


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])
