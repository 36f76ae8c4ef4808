"""geo_complexity metrics + polar vanilla track (VERDICT r1 item 8)."""

import numpy as np
import pytest

from dcd_isaac_tpu.utils.geo_complexity import (
    batch_track_complexity, complexity,
)


class TestGeoComplexity:
    def test_square_is_simple(self):
        sq = [(0, 0), (1, 0), (1, 1), (0, 1)]
        c = complexity(sq)
        assert c['area'] == pytest.approx(1.0)
        assert c['perimeter'] == pytest.approx(4.0)
        assert c['convex'] == pytest.approx(0.0, abs=1e-3)
        assert c['amplitude'] == pytest.approx(0.0, abs=1e-3)
        # reference notch rule counts downward edges: (1,1)->(0,1)? no —
        # angle pi is not > pi; (0,1)->(0,0) is 3pi/2 > pi -> 1 notch,
        # normalized by nverts-2
        assert c['notches'] == pytest.approx(1 / 2)

    def test_l_shape_nonconvex(self):
        # L-shape: hull = pentagon of area 3.5 (corner (2,2) is not a
        # vertex), area 3 -> convex = 0.5/3.501
        L = [(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)]
        c = complexity(L)
        assert c['area'] == pytest.approx(3.0)
        assert c['convex'] == pytest.approx(
            (3.5 - 3.0) / (3.5 + 1e-3), rel=1e-5)
        assert c['amplitude'] > 0.0
        assert c['complexity'] > 0.0

    def test_closing_duplicate_handled(self):
        sq = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]
        assert complexity(sq)['area'] == pytest.approx(1.0)

    def test_circle_near_zero_complexity(self):
        t = np.linspace(0, 2 * np.pi, 64, endpoint=False)
        pts = np.stack([np.cos(t), np.sin(t)], 1)
        c = complexity(pts)
        assert c['amplitude'] < 0.01
        assert c['convex'] < 0.01

    def test_batch_mean(self):
        pts = np.zeros((2, 8, 2), np.float32)
        t = np.linspace(0, 2 * np.pi, 8, endpoint=False)
        pts[0] = np.stack([np.cos(t), np.sin(t)], 1)
        pts[1] = pts[0] * 2
        valid = np.ones((2, 8), bool)
        out = batch_track_complexity(pts, valid)
        a0 = complexity(pts[0])['area']
        a1 = complexity(pts[1])['area']
        assert out['area'] == pytest.approx((a0 + a1) / 2)


class TestPolarTrack:
    def test_generate_reproducible(self):
        from dcd_isaac_tpu.envs.carracing.polar import generate_polar_level
        l1 = generate_polar_level(np.random.RandomState(5))
        l2 = generate_polar_level(np.random.RandomState(5))
        np.testing.assert_array_equal(l1, l2)
        n = int(l1[0, 0])
        assert 100 < n < 512
        # closed loop: trim excludes track[i2-1], so the closing gap is
        # ~2 detail steps (same as the reference; the tile loop closes it)
        pts = l1[1:n + 1]
        gap = np.linalg.norm(pts[0] - pts[-1])
        assert gap < 12.0, gap
        # points lie within the polar annulus scale (overshoot allowed)
        assert np.abs(pts).max() < 2.0 * 150.0

    def test_track_step_spacing(self):
        from dcd_isaac_tpu.envs.carracing.polar import (
            TRACK_DETAIL_STEP, generate_polar_level,
        )
        lvl = generate_polar_level(np.random.RandomState(9))
        n = int(lvl[0, 0])
        pts = lvl[1:n + 1]
        d = np.linalg.norm(np.diff(pts, axis=0), axis=1)
        np.testing.assert_allclose(d, TRACK_DETAIL_STEP, rtol=1e-3)

    def test_vanilla_eval_env_runs(self):
        import jax
        import jax.numpy as jnp
        from dcd_isaac_tpu.envs.carracing import make_eval_builder
        env, T, build = make_eval_builder('CarRacing-Vanilla-v0')
        levels = build(np.random.RandomState(0), 2)
        state, obs0 = jax.vmap(env.reset_to_level)(levels)
        assert int(state.track.n_points[0]) > 100
        act = jnp.zeros((2, 3))
        state2, obs, rew, done, info = jax.vmap(env.step)(state, act)
        assert obs.shape[0] == 2
        assert np.isfinite(np.asarray(rew)).all()


class TestRunnerTrackStats:
    def test_carracing_stats_have_geo_complexity(self, tmp_path):
        from dcd_isaac_tpu.arguments import parser
        from dcd_isaac_tpu.envs.registry import make_env
        from dcd_isaac_tpu.runner.adversarial_runner import AdversarialRunner
        from dcd_isaac_tpu.utils.make_agent import make_all_models
        import jax
        args = parser.parse_args([
            '--env_name', 'CarRacingBezierAdversarial-v0',
            '--ued_algo', 'domain_randomization',
            '--num_processes', '2', '--num_steps', '8',
            '--ppo_epoch', '1', '--num_mini_batch', '1',
            '--frame_stack', '2', '--num_action_repeat', '2'])
        env = make_env(args.env_name, args=args)
        models = make_all_models(args, env)
        r = AdversarialRunner(args, env, models, jax.random.PRNGKey(0))
        stats = r.run()
        for k in ('track_amplitude', 'track_notches', 'track_convex',
                  'track_complexity', 'track_area', 'track_perimeter'):
            assert k in stats, sorted(stats)
        assert 0 <= stats['track_amplitude'] <= 1


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])
