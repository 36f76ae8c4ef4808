"""Genuine gym BipedalWalker terrain: exactness vs live gymnasium.

gym_terrain.generate_gym_terrain transcribes gymnasium's
BipedalWalker._generate_terrain (the real gym env the reference evaluates
on, eval.py:354-363).  These tests run the REAL gymnasium env (Box2D) and
assert the transcription reproduces its terrain exactly per seed:
heightfield, and every obstacle fixture polygon (pit walls, stumps,
stair treads).
"""

import numpy as np
import pytest

from dcd_isaac_tpu.envs.walker.gym_terrain import (
    GYM_LEVEL_DIM, decode_gym_level, encode_gym_level, generate_gym_terrain,
)
from dcd_isaac_tpu.envs.walker.physics import MAX_BOXES, TERRAIN_LENGTH

gymnasium = pytest.importorskip('gymnasium')


def _gym_env(hardcore, seed):
    from gymnasium.envs.box2d.bipedal_walker import BipedalWalker
    env = BipedalWalker(hardcore=hardcore)
    env.reset(seed=seed)
    return env


def _gym_obstacle_aabbs(env):
    """Obstacle fixtures = polygon shapes with >2 vertices that are NOT
    ground edges (edges have 2 vertices)."""
    out = []
    for body in env.terrain:
        for fix in body.fixtures:
            verts = getattr(fix.shape, 'vertices', [])
            if len(verts) == 4:
                w = [body.transform * v for v in verts]
                xs = [p[0] for p in w]
                ys = [p[1] for p in w]
                out.append((min(xs), min(ys), max(xs), max(ys)))
    return np.array(sorted(out), np.float32).reshape(-1, 4)


class TestTerrainExact:
    @pytest.mark.parametrize('hardcore,seed', [
        (False, 0), (False, 123), (True, 0), (True, 7), (True, 123),
        (True, 20260820),
    ])
    def test_heightfield_and_obstacles_match_gymnasium(self, hardcore, seed):
        env = _gym_env(hardcore, seed)
        ref_x = np.asarray(env.terrain_x, np.float64)
        ref_y = np.asarray(env.terrain_y, np.float64)
        ref_boxes = _gym_obstacle_aabbs(env)

        rng = np.random.Generator(np.random.PCG64(seed))
        xs, ys, boxes, n = generate_gym_terrain(hardcore, rng)
        assert len(xs) == TERRAIN_LENGTH == len(ref_x)
        np.testing.assert_allclose(xs, ref_x, atol=1e-5)
        np.testing.assert_allclose(ys, ref_y, atol=1e-5)
        if hardcore:
            assert n == len(ref_boxes), (n, len(ref_boxes))
            ours = np.array(sorted(map(tuple, boxes)), np.float32)
            np.testing.assert_allclose(ours, ref_boxes, atol=1e-4)
        else:
            assert n == 0 and len(ref_boxes) == 0

    def test_box_budget_over_many_seeds(self):
        """MAX_BOXES must cover the worst hardcore terrain."""
        worst = 0
        for seed in range(200):
            rng = np.random.Generator(np.random.PCG64(seed))
            _, _, _, n = generate_gym_terrain(True, rng)
            worst = max(worst, n)
        assert worst <= MAX_BOXES, worst
        assert worst > 10      # sanity: hardcore actually has obstacles


class TestLevelCodec:
    def test_roundtrip(self):
        lvl = encode_gym_level(True, 42)
        assert lvl.shape == (GYM_LEVEL_DIM,)
        xs, ys, boxes, n, seed = decode_gym_level(lvl)
        rng = np.random.Generator(np.random.PCG64(42))
        rxs, rys, rboxes, rn = generate_gym_terrain(True, rng)
        np.testing.assert_allclose(np.asarray(xs), rxs, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ys), rys, atol=1e-6)
        assert int(n) == rn
        np.testing.assert_allclose(
            np.asarray(boxes)[:rn], rboxes, atol=1e-6)


class TestEvalIntegration:
    def test_evaluator_runs_gym_envs(self):
        """Short end-to-end: the Evaluator steps both gym envs with a real
        walker model and returns finite stats."""
        import jax
        import jax.numpy as jnp

        from dcd_isaac_tpu.models.walker_models import WalkerStudentPolicy
        from dcd_isaac_tpu.runner.evaluation import Evaluator

        ev = Evaluator(['BipedalWalker-v3'], num_episodes=2)
        env, T, build = ev._build_env('BipedalWalker-v3')
        assert T == 1600
        env2, T2, _ = ev._build_env('BipedalWalkerHardcore-v3')
        assert T2 == 2000

        model = WalkerStudentPolicy(action_dim=4)
        rng = jax.random.PRNGKey(0)
        levels = build(np.random.RandomState(0), 2)
        _, obs = jax.vmap(env.reset_to_level)(levels)
        params = model.init(
            rng, obs, model.initial_carry((2,)), jnp.ones((2,)))
        env.max_steps = 40     # keep the jitted scan tiny
        # patch _build_env so the cached prog uses the short horizon
        ev._build_env = lambda name: (env, 40, build)   # type: ignore
        stats = ev.evaluate(model, params, seed=0)
        assert np.isfinite(stats['test_returns:BipedalWalker-v3'])
        assert 0.0 <= stats['solved_rate:BipedalWalker-v3'] <= 1.0
