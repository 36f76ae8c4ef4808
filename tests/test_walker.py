"""BipedalWalker engine tests: physics stability, terrain generation,
UED protocol, observations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dcd_isaac_tpu.envs.walker.physics as ph
from dcd_isaac_tpu.envs.walker import (
    AdversarialWalker, WalkerParams,
)
from dcd_isaac_tpu.envs.walker.env import place_walker
from dcd_isaac_tpu.envs.walker.terrain import generate_terrain

ENV = AdversarialWalker(WalkerParams())
FLAT = jnp.concatenate([jnp.zeros(8), jnp.zeros(1)])


class TestPhysics:
    def test_mass_properties_positive(self):
        assert (ph.BODY_MASS > 0).all()
        assert (ph.BODY_I > 0).all()
        # Box2D hull mass: density 5 * polygon area
        assert 4 < ph.BODY_MASS[0] < 7

    def test_drop_comes_to_rest(self):
        terrain = generate_terrain(jnp.zeros(8), jax.random.PRNGKey(0))
        bodies = place_walker(jax.random.PRNGKey(1))
        step = jax.jit(lambda b: ph.physics_step(
            b, terrain, jnp.zeros(4), jnp.zeros(4)))
        for i in range(250):
            bodies, *_ = step(bodies)
        assert np.isfinite(np.asarray(bodies.pos)).all()
        # at rest on the ground
        assert float(jnp.abs(bodies.vel).max()) < 0.05
        assert float(bodies.pos[0, 1]) > ph.TERRAIN_HEIGHT  # above ground

    def test_motor_moves_joints(self):
        terrain = generate_terrain(jnp.zeros(8), jax.random.PRNGKey(0))
        bodies = place_walker(jax.random.PRNGKey(1))
        # drive hip joints before ground contact
        step = jax.jit(lambda b: ph.physics_step(
            b, terrain,
            jnp.array([ph.SPEED_HIP, 0, -ph.SPEED_HIP, 0]),
            jnp.full(4, ph.MOTORS_TORQUE)))
        for _ in range(5):
            bodies, lc, ja, js, hc = step(bodies)
        assert float(ja[0]) > 0.05      # left hip rotated +
        assert float(ja[2]) < -0.05     # right hip rotated -

    def test_joint_limits_hold(self):
        terrain = generate_terrain(jnp.zeros(8), jax.random.PRNGKey(0))
        bodies = place_walker(jax.random.PRNGKey(1))
        step = jax.jit(lambda b: ph.physics_step(
            b, terrain,
            jnp.array([ph.SPEED_HIP, ph.SPEED_KNEE,
                       ph.SPEED_HIP, ph.SPEED_KNEE]),
            jnp.full(4, ph.MOTORS_TORQUE)))
        for _ in range(100):
            bodies, lc, ja, js, hc = step(bodies)
        ja = np.asarray(ja)
        assert (ja < np.asarray(ph.JOINT_UPPER) + 0.3).all()
        assert (ja > np.asarray(ph.JOINT_LOWER) - 0.3).all()

    def test_lidar_flat_ground(self):
        terrain = generate_terrain(jnp.zeros(8), jax.random.PRNGKey(0))
        bodies = place_walker(jax.random.PRNGKey(1))
        frac = np.asarray(ph.lidar(bodies, terrain))
        assert frac.shape == (10,)
        # straight-down ray hits ground well within range
        assert frac[0] < 0.7
        assert (frac > 0).all() and (frac <= 1).all()


class TestTerrain:
    def test_flat(self):
        t = generate_terrain(jnp.zeros(8), jax.random.PRNGKey(0))
        assert float(t.ys.std()) < 1e-6
        assert int(t.n_boxes) == 0

    def test_roughness(self):
        t = generate_terrain(
            jnp.array([5.0, 0, 0, 0, 0, 0, 0, 0]), jax.random.PRNGKey(0))
        assert float(t.ys.std()) > 0.1
        # startpad stays flat
        ys = np.asarray(t.ys)
        assert np.std(ys[:ph.TERRAIN_STARTPAD]) < 1e-4

    def test_stumps_emit_boxes(self):
        t = generate_terrain(
            jnp.array([0, 0, 0, 2.0, 2.0, 0, 0, 0]), jax.random.PRNGKey(0))
        n = int(t.n_boxes)
        assert n > 0
        boxes = np.asarray(t.boxes)[:n]
        heights = boxes[:, 3] - boxes[:, 1]
        np.testing.assert_allclose(heights, 2.0 * ph.TERRAIN_STEP, rtol=1e-4)

    def test_pit_drops_heightfield(self):
        t = generate_terrain(
            jnp.array([0, 5.0, 5.0, 0, 0, 0, 0, 0]), jax.random.PRNGKey(0))
        ys = np.asarray(t.ys)
        assert ys.min() < ph.TERRAIN_HEIGHT - 3 * ph.TERRAIN_STEP
        assert int(t.n_boxes) >= 2  # pit walls

    def test_stairs_emit_boxes(self):
        t = generate_terrain(
            jnp.array([0, 0, 0, 0, 0, 2.0, 2.0, 5.0]), jax.random.PRNGKey(3))
        assert int(t.n_boxes) > 0

    def test_disabled_below_thresholds(self):
        # stump_hi < 0.2, pit_hi < 0.8, stair_hi < 0.2 → plain grass
        t = generate_terrain(
            jnp.array([0, 0, 0.5, 0, 0.1, 0, 0.1, 3]), jax.random.PRNGKey(0))
        assert int(t.n_boxes) == 0


class TestWalkerEnv:
    def test_obs_shape_and_finite(self):
        state, obs = jax.jit(ENV.reset_to_level)(FLAT)
        assert obs.shape == (24,)
        assert np.isfinite(np.asarray(obs)).all()

    def test_level_roundtrip(self):
        state, _ = jax.jit(ENV.reset_random)(jax.random.PRNGKey(5))
        lvl = ENV.get_level(state)
        state2, _ = jax.jit(ENV.reset_to_level)(lvl)
        np.testing.assert_allclose(
            np.asarray(state.level_params), np.asarray(state2.level_params),
            rtol=1e-6)
        assert int(state.level_seed) == int(state2.level_seed)
        # deterministic terrain per (params, seed)
        np.testing.assert_allclose(
            np.asarray(state.terrain.ys), np.asarray(state2.terrain.ys))

    def test_forward_motion_rewards(self):
        state, obs = jax.jit(ENV.reset_to_level)(FLAT)
        step = jax.jit(ENV.step)
        total = 0.0
        rng = jax.random.PRNGKey(0)
        for i in range(50):
            rng, sub = jax.random.split(rng)
            a = jax.random.uniform(sub, (4,), minval=-1, maxval=1)
            state, obs, r, done, info = step(state, a)
            total += float(r)
            if bool(done):
                break
        assert np.isfinite(total)

    def test_fall_gives_minus_100(self):
        state, _ = jax.jit(ENV.reset_to_level)(FLAT)
        step = jax.jit(ENV.step)
        r_last, done = 0.0, False
        for i in range(300):
            state, obs, r, done, info = step(state, jnp.zeros(4))
            r_last = float(r)
            if bool(done):
                break
        assert bool(done)
        assert r_last == -100.0

    def test_adversary_design(self):
        rng = jax.random.PRNGKey(0)
        state, obs = jax.jit(ENV.reset)(rng)
        assert obs['image'].shape == (8,)
        sa = jax.jit(ENV.step_adversary)
        for t in range(8):
            rng, sub = jax.random.split(rng)
            state, obs, done = sa(state, jnp.array([0.5]), sub)
        assert bool(done)
        # action 0.5 maps to 0.75 of each range
        p = np.asarray(state.level_params)
        assert np.isclose(p[0], 7.5)  # roughness range [0,10]
        assert np.isclose(p[7], 7.0)  # steps range [1,9]

    def test_mutate_clips_to_ranges(self):
        state, _ = jax.jit(ENV.reset_random)(jax.random.PRNGKey(1))
        st2, _ = jax.jit(lambda s, r: ENV.mutate_level(s, r, 5))(
            state, jax.random.PRNGKey(2))
        p = np.asarray(st2.level_params)
        assert (p[0] <= 10) and (p[:7] >= 0).all() and (p[7] <= 9)
        assert int(st2.level_seed) != int(state.level_seed)

    def test_vmap_batch(self):
        rngs = jax.random.split(jax.random.PRNGKey(2), 4)
        states, obs = jax.vmap(ENV.reset_random)(rngs)
        assert obs.shape == (4, 24)
        acts = jnp.zeros((4, 4))
        states, obs, r, d, info = jax.vmap(ENV.step)(states, acts)
        assert r.shape == (4,)


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])
