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
        assert int(state.track.n_points) == 480

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
        assert lvl.shape == (27,)
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
        assert int(state2.track.n_points) == 480

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


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])
