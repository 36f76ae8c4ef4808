"""Byte-exact golden-trace parity vs the REFERENCE MultiGrid.

Fixtures in tests/fixtures/multigrid_ref_traces.npz were recorded by
tools/record_multigrid_traces.py executing the reference's own
envs/multigrid code (adversary placement adversarial.py:452-539, stepping
multigrid.py:866-975, obs generation incl. occlusion :977-1015) under fixed
action scripts.  This test replays the SAME scripts through the JAX engine
and asserts exact equality of grid encodings, observations, rewards and
dones (VERDICT r1 item 3; BASELINE.json fixed-seed trajectory parity).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcd_isaac_tpu.envs.multigrid import AdversarialMultiGrid, MultiGridParams

FIXTURE = os.path.join(
    os.path.dirname(__file__), 'fixtures', 'multigrid_ref_traces.npz')

SCENARIOS = {
    'goal_last_25': dict(size=15, n_clutter=25, choose_goal_last=True,
                         agent_view_size=5, max_steps=250,
                         see_through_walls=True),
    'opaque_25': dict(size=15, n_clutter=25, choose_goal_last=True,
                      agent_view_size=5, max_steps=250,
                      see_through_walls=False),
    'goal_first_50': dict(size=15, n_clutter=50, choose_goal_last=False,
                          agent_view_size=5, max_steps=250,
                          see_through_walls=True),
    'dup_cells': dict(size=15, n_clutter=25, choose_goal_last=False,
                      agent_view_size=5, max_steps=250,
                      see_through_walls=True),
}


@pytest.fixture(scope='module')
def data():
    return np.load(FIXTURE)


def construct(data, name):
    g = lambda k: data[f'{name}/{k}']
    env = AdversarialMultiGrid(MultiGridParams(**SCENARIOS[name]))
    rng = jax.random.PRNGKey(0)
    state, _ = env.reset(rng)
    done = False
    for a in g('adv_actions'):
        state, _, done = env.step_adversary(
            state, jnp.int32(int(a)), rng)
    assert bool(done)
    return env, state, g


@pytest.mark.parametrize('name', list(SCENARIOS))
class TestConstruction:
    def test_grid_encoding_exact(self, data, name):
        env, state, g = construct(data, name)
        ref = g('encoding')
        # the agent's start DIRECTION is drawn from each side's own RNG
        # stream (reference adversarial.py:205) — pin it to the recording;
        # everything else must match byte-exactly
        d = jnp.int32(int(g('agent_start_dir')))
        state = state.replace(agent_start_dir=d, agent_dir=d)
        mine = np.asarray(env.get_level(state))
        np.testing.assert_array_equal(mine, ref)

    def test_placement_and_metrics(self, data, name):
        env, state, g = construct(data, name)
        np.testing.assert_array_equal(
            np.asarray(state.agent_start_pos), g('agent_start_pos'))
        np.testing.assert_array_equal(
            np.asarray(state.goal_pos), g('goal_pos'))
        assert bool(state.passable) == bool(g('passable'))
        assert int(state.shortest_path_length) == int(
            g('shortest_path_length'))
        assert int(state.n_clutter_placed) == int(g('n_clutter_placed'))


@pytest.mark.parametrize('name', list(SCENARIOS))
class TestStudentTrace:
    def test_obs_reward_done_exact(self, data, name):
        env, state, g = construct(data, name)
        # pin the (RNG-stream-dependent) start direction to the recording
        state = state.replace(
            agent_start_dir=jnp.int32(int(g('agent_start_dir'))))
        state, obs = env.reset_agent(state)
        np.testing.assert_array_equal(
            np.asarray(obs['image']), g('obs0_image'))
        assert int(obs['direction']) == int(g('obs0_direction'))

        step = jax.jit(env.step)
        images, dirs, rewards, dones = [], [], [], []
        for a in g('student_actions'):
            state, obs, r, d, _ = step(state, jnp.int32(int(a)))
            images.append(np.asarray(obs['image']))
            dirs.append(int(obs['direction']))
            rewards.append(float(r))
            dones.append(bool(d))
            if bool(d):
                break
        # The obs of a goal-reaching step is excluded: the reference
        # RESPAWNS the agent at an np_random location before rendering it
        # (multigrid.py agent_is_done → place_one_agent), so that one obs is
        # RNG-stream-dependent — and in training both frameworks discard it
        # via auto-reset (parallel_wrappers.py:27-37).  Rewards/dones still
        # compare on every step.
        K = len(images) - 1 if dones[-1] and rewards[-1] > 0 else len(images)
        np.testing.assert_array_equal(np.stack(images)[:K], g('images')[:K])
        np.testing.assert_array_equal(
            np.asarray(dirs)[:K], g('directions')[:K])
        np.testing.assert_allclose(
            np.asarray(rewards), g('rewards'), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(dones), g('dones'))


class TestResetToLevel:
    def test_level_roundtrip_replays_identically(self, data):
        """reset_to_level(get_level(s)) reproduces the recorded episode."""
        name = 'goal_last_25'
        env, state, g = construct(data, name)
        level = env.get_level(state)
        state2, _ = env.reset_to_level(level)
        state2 = state2.replace(
            agent_start_dir=jnp.int32(int(g('agent_start_dir'))))
        state2, obs = env.reset_agent(state2)
        np.testing.assert_array_equal(
            np.asarray(obs['image']), g('obs0_image'))
        rewards = []
        for a in g('student_actions'):
            state2, obs, r, d, _ = env.step(state2, jnp.int32(int(a)))
            rewards.append(float(r))
            if bool(d):
                break
        np.testing.assert_allclose(
            np.asarray(rewards), g('rewards'), atol=1e-6)


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])


def test_perfect_maze_medium_golden_trace():
    """PerfectMazeMedium obs parity vs the reference's own mst_maze.py.

    Fixture recorded by running /root/reference/envs/multigrid/mst_maze.py
    (seed 123) under tools/minigrid_shim.py and scripting 15 actions; the
    same maze + actions replayed through our engine must produce byte-
    identical 5x5 egocentric views (VERDICT r4 weak #6 ruled the view
    semantics out as the PerfectMazeMedium-lag cause — this pins it).
    """
    import numpy as np
    import jax

    from dcd_isaac_tpu.envs.multigrid import AdversarialMultiGrid
    from dcd_isaac_tpu.envs.multigrid.constants import EMPTY, WALL
    from dcd_isaac_tpu.envs.multigrid.mazes import EVAL_ENVS, encode_level

    d = np.load(os.path.join(os.path.dirname(__file__), 'fixtures',
                             'pmaze_ref_trace.npz'))
    t = d['grid'][..., 0]
    g = np.full(t.shape, EMPTY, np.uint8)
    g[t == 2] = WALL
    goal_xy = tuple(np.argwhere(t == 8)[0])
    level = encode_level(g.copy(), (1, 1), 0, goal_xy)

    env = AdversarialMultiGrid(
        EVAL_ENVS['MultiGrid-PerfectMazeMedium-v0'].params)
    state, obs = env.reset_to_level(np.asarray(level))
    step = jax.jit(env.step)
    ours = [np.asarray(obs['image'])]
    for a in d['seq'][:len(d['obs']) - 1]:
        state, obs, r, done, info = step(state, int(a))
        ours.append(np.asarray(obs['image']))
    np.testing.assert_array_equal(np.stack(ours), d['obs'])
