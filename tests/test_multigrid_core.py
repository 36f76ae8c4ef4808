"""MultiGrid engine unit tests.

Validates the JAX engine against hand-computed semantics of the reference
(envs/multigrid/multigrid.py, adversarial.py): step dynamics, rewards,
termination, egocentric views, adversary construction, DR reset, mutation,
encode/decode round trips and BFS metrics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcd_isaac_tpu.envs.multigrid import (
    AdversarialMultiGrid, MultiGridParams, compute_metrics, decode_grid,
    encode_grid, gen_obs, init_state, reset_agent, step_agent,
)
from dcd_isaac_tpu.envs.multigrid.constants import (
    AGENT, EMPTY, GOAL, LAVA, WALL, LEFT, RIGHT, FORWARD, DONE,
)


import functools

P = MultiGridParams(size=6, n_clutter=7, agent_view_size=5, max_steps=50)

STEP = jax.jit(functools.partial(step_agent, params=P))
OBS = jax.jit(functools.partial(gen_obs, params=P))
METRICS = jax.jit(functools.partial(compute_metrics, params=P))


def make_state(walls=(), agent=(1, 1), agent_dir=0, goal=(4, 4), p=P):
    state = init_state(p)
    grid = state.grid
    for (x, y) in walls:
        grid = grid.at[x, y].set(WALL)
    grid = grid.at[goal[0], goal[1]].set(GOAL)
    state = state.replace(
        grid=grid,
        agent_start_pos=jnp.array(agent, dtype=jnp.int32),
        agent_start_dir=jnp.int32(agent_dir),
        goal_pos=jnp.array(goal, dtype=jnp.int32),
    )
    state = METRICS(state) if p is P else compute_metrics(state, p)
    state, _ = reset_agent(state, p)
    return state


class TestStepDynamics:
    def test_turn_left_right(self):
        s = make_state(agent_dir=0)
        s1, _, _, _ = STEP(s, jnp.int32(LEFT))
        assert int(s1.agent_dir) == 3
        s2, _, _, _ = STEP(s1, jnp.int32(RIGHT))
        assert int(s2.agent_dir) == 0
        assert (np.asarray(s2.agent_pos) == np.asarray(s.agent_pos)).all()

    def test_forward_moves_in_dir(self):
        # dir 0=+x, 1=+y, 2=-x, 3=-y
        for d, (dx, dy) in enumerate([(1, 0), (0, 1), (-1, 0), (0, -1)]):
            s = make_state(agent=(2, 2), agent_dir=d)
            s1, _, _, _ = STEP(s, jnp.int32(FORWARD))
            assert tuple(np.asarray(s1.agent_pos)) == (2 + dx, 2 + dy), d

    def test_forward_blocked_by_wall(self):
        s = make_state(walls=[(3, 2)], agent=(2, 2), agent_dir=0)
        s1, _, _, _ = STEP(s, jnp.int32(FORWARD))
        assert tuple(np.asarray(s1.agent_pos)) == (2, 2)

    def test_boundary_wall_blocks(self):
        s = make_state(agent=(1, 1), agent_dir=2)  # facing -x into boundary
        s1, _, _, _ = STEP(s, jnp.int32(FORWARD))
        assert tuple(np.asarray(s1.agent_pos)) == (1, 1)

    def test_goal_reward_and_done(self):
        s = make_state(agent=(3, 4), agent_dir=0, goal=(4, 4))
        s1, _, r, done = STEP(s, jnp.int32(FORWARD))
        # reward = 1 - 0.9 * step_count/max_steps with step_count=1
        assert np.isclose(float(r), 1 - 0.9 * 1 / 50)
        assert bool(done)
        # agent does not move onto the goal
        assert tuple(np.asarray(s1.agent_pos)) == (3, 4)

    def test_lava_kills_without_reward(self):
        s = make_state(agent=(2, 2), agent_dir=0)
        s = s.replace(grid=s.grid.at[3, 2].set(LAVA))
        _, _, r, done = STEP(s, jnp.int32(FORWARD))
        assert float(r) == 0.0 and bool(done)

    def test_timeout(self):
        s = make_state()
        done = False
        for _ in range(P.max_steps):
            s, _, _, done = STEP(s, jnp.int32(DONE))
        assert bool(done)
        assert int(s.step_count) == P.max_steps

    def test_reward_decays_with_time(self):
        s = make_state(agent=(3, 4), agent_dir=0, goal=(4, 4))
        for _ in range(10):
            s, _, _, _ = STEP(s, jnp.int32(DONE))
        _, _, r, _ = STEP(s, jnp.int32(FORWARD))
        assert np.isclose(float(r), 1 - 0.9 * 11 / 50)


class TestObservations:
    def test_obs_shapes(self):
        s = make_state()
        obs = OBS(s)
        assert obs['image'].shape == (5, 5, 3)
        assert obs['image'].dtype == jnp.uint8

    def test_agent_cell_is_empty(self):
        s = make_state()
        img = np.asarray(OBS(s)['image'])
        assert img[2, 4, 0] == EMPTY  # center-bottom = agent's own cell

    def test_view_facing_right_sees_forward(self):
        # Agent at (1,1) facing +x; goal at (3,1) is 2 ahead → in view at
        # center column, 2 rows up from agent position (2, 4-2=2).
        s = make_state(agent=(1, 1), agent_dir=0, goal=(3, 1))
        img = np.asarray(OBS(s)['image'])
        assert img[2, 2, 0] == GOAL

    def test_view_rotation_consistency(self):
        # Place goal directly in front for each facing dir; with the agent at
        # the exact center of an odd-size grid the views must be identical.
        p7 = MultiGridParams(size=7, agent_view_size=5, max_steps=50)
        imgs = []
        for d, (dx, dy) in enumerate([(1, 0), (0, 1), (-1, 0), (0, -1)]):
            s = make_state(agent=(3, 3), agent_dir=d, goal=(3 + dx, 3 + dy),
                           p=p7)
            imgs.append(np.asarray(gen_obs(s, p7)['image']))
        for img in imgs[1:]:
            np.testing.assert_array_equal(img, imgs[0])

    def test_out_of_bounds_is_wall(self):
        s = make_state(agent=(1, 1), agent_dir=3)  # facing -y, near corner
        img = np.asarray(OBS(s)['image'])
        # Left column of view (x<agent) includes out-of-grid cells → wall
        assert (img[0, :, 0] == WALL).all()

    def test_opaque_walls_mask_matches_minigrid_oracle(self):
        # Compare _process_vis against a direct numpy transcription of
        # gym_minigrid's Grid.process_vis flood.
        from dcd_isaac_tpu.envs.multigrid.core import _process_vis

        def oracle(view):
            v = view.shape[0]
            mask = np.zeros((v, v), bool)
            mask[v // 2, v - 1] = True
            for j in reversed(range(v)):
                for i in range(0, v - 1):
                    if not mask[i, j] or view[i, j] == WALL:
                        continue
                    mask[i + 1, j] = True
                    if j > 0:
                        mask[i + 1, j - 1] = True
                        mask[i, j - 1] = True
                for i in reversed(range(1, v)):
                    if not mask[i, j] or view[i, j] == WALL:
                        continue
                    mask[i - 1, j] = True
                    if j > 0:
                        mask[i - 1, j - 1] = True
                        mask[i, j - 1] = True
            return mask

        rng = np.random.RandomState(0)
        for _ in range(20):
            view = np.where(rng.rand(5, 5) < 0.3, WALL, EMPTY).astype(np.uint8)
            view[2, 4] = EMPTY
            got = np.asarray(_process_vis(jnp.asarray(view), 5))
            np.testing.assert_array_equal(got, oracle(view))


class TestAdversary:
    def setup_method(self):
        self.env = AdversarialMultiGrid(P)

    def test_full_construction(self):
        rng = jax.random.PRNGKey(0)
        state, obs = self.env.reset(rng)
        assert obs['image'].shape == (6, 6, 3)
        # place goal at interior loc 0 → (1,1); agent at loc 5 → (1,2)
        # then walls
        locs = [0, 4, 7, 8, 9, 7, 1, 1, 2]  # n_clutter+2 = 9 steps
        done = False
        for i, loc in enumerate(locs):
            rng, sub = jax.random.split(rng)
            state, obs, done = self.env.step_adversary(
                state, jnp.int32(loc), sub)
        assert bool(done)
        grid = np.asarray(state.grid)
        assert grid[1, 1] == GOAL
        assert tuple(np.asarray(state.agent_start_pos)) == (1, 2)  # loc 4 → x=1,y=2
        # walls at locs 7,8,9,1,2 (interior 4-wide): 7→(4,2),8→(1,3),9→(2,3),
        # 1→(2,1),2→(3,1); loc 7 repeated → no double count
        assert int(state.n_clutter_placed) == 5
        assert grid[4, 2] == WALL and grid[1, 3] == WALL

    def test_goal_position_mapping(self):
        # loc → x = loc % (size-2) + 1, y = loc // (size-2) + 1
        rng = jax.random.PRNGKey(1)
        state, _ = self.env.reset(rng)
        state, _, _ = self.env.step_adversary(state, jnp.int32(10), rng)
        assert tuple(np.asarray(state.goal_pos)) == (3, 3)

    def test_agent_collision_with_goal_relocates(self):
        rng = jax.random.PRNGKey(2)
        state, _ = self.env.reset(rng)
        state, _, _ = self.env.step_adversary(state, jnp.int32(0), rng)
        state, _, _ = self.env.step_adversary(state, jnp.int32(0), rng)
        ap = tuple(np.asarray(state.agent_start_pos))
        assert ap != (1, 1)  # moved off the goal
        assert np.asarray(state.grid)[1, 1] == GOAL

    def test_wall_on_goal_is_noop(self):
        rng = jax.random.PRNGKey(3)
        state, _ = self.env.reset(rng)
        state, _, _ = self.env.step_adversary(state, jnp.int32(0), rng)  # goal
        state, _, _ = self.env.step_adversary(state, jnp.int32(5), rng)  # agent
        state, _, _ = self.env.step_adversary(state, jnp.int32(0), rng)  # wall@goal
        assert np.asarray(state.grid)[1, 1] == GOAL
        assert int(state.n_clutter_placed) == 0

    def test_goal_clears_wall(self):
        p = MultiGridParams(size=6, n_clutter=7, max_steps=50,
                            choose_goal_last=True)
        env = AdversarialMultiGrid(p)
        rng = jax.random.PRNGKey(4)
        state, _ = env.reset(rng)
        # first 7 moves are walls; place wall at loc 0, then goal at loc 0
        state, _, _ = env.step_adversary(state, jnp.int32(0), rng)
        assert np.asarray(state.grid)[1, 1] == WALL
        for loc in [1, 2, 3, 5, 6, 7]:
            state, _, _ = env.step_adversary(state, jnp.int32(loc), rng)
        assert int(state.n_clutter_placed) == 7
        state, _, _ = env.step_adversary(state, jnp.int32(0), rng)  # goal
        assert np.asarray(state.grid)[1, 1] == GOAL
        assert int(state.n_clutter_placed) == 6  # wall was cleared

    def test_reset_random(self):
        rng = jax.random.PRNGKey(5)
        state, obs = self.env.reset_random(rng)
        grid = np.asarray(state.grid)
        assert (grid == GOAL).sum() == 1
        assert int(state.n_clutter_placed) == P.n_clutter // 2
        assert obs['image'].shape == (5, 5, 3)
        # agent not on goal or wall
        ap = np.asarray(state.agent_pos)
        assert grid[ap[0], ap[1]] == EMPTY

    def test_encode_decode_roundtrip(self):
        rng = jax.random.PRNGKey(6)
        state, _ = self.env.reset_random(rng)
        level = self.env.get_level(state)
        state2, obs2 = self.env.reset_to_level(level)
        np.testing.assert_array_equal(np.asarray(state.grid),
                                      np.asarray(state2.grid))
        assert tuple(np.asarray(state2.agent_start_pos)) == tuple(
            np.asarray(state.agent_start_pos))
        assert int(state2.agent_start_dir) == int(state.agent_start_dir)
        assert tuple(np.asarray(state2.goal_pos)) == tuple(
            np.asarray(state.goal_pos))

    def test_mutate_preserves_validity(self):
        rng = jax.random.PRNGKey(7)
        state, _ = self.env.reset_random(rng)
        for i in range(10):
            rng, sub = jax.random.split(rng)
            state, obs = self.env.mutate_level(state, sub, num_edits=3)
            grid = np.asarray(state.grid)
            assert (grid == GOAL).sum() == 1
            gp = np.asarray(state.goal_pos)
            assert grid[gp[0], gp[1]] == GOAL
            ap = np.asarray(state.agent_start_pos)
            assert grid[ap[0], ap[1]] == EMPTY
            assert not (ap == gp).all()

    def test_vmapped_batch(self):
        rngs = jax.random.split(jax.random.PRNGKey(8), 16)
        states, obs = jax.vmap(self.env.reset_random)(rngs)
        assert states.grid.shape == (16, 6, 6)
        assert obs['image'].shape == (16, 5, 5, 3)
        actions = jnp.zeros(16, dtype=jnp.int32) + FORWARD
        states2, obs2, r, d = jax.vmap(
            lambda s, a: step_agent(s, a, P))(states, actions)
        assert r.shape == (16,)


class TestMetrics:
    def test_passable_simple(self):
        s = make_state(agent=(1, 1), goal=(4, 4))
        assert bool(s.passable)
        assert int(s.shortest_path_length) == 6  # manhattan in empty grid

    def test_blocked_path(self):
        walls = [(3, 1), (3, 2), (3, 3), (3, 4), (1, 3), (2, 3)]
        # wall off the bottom-right corner entirely
        s = make_state(agent=(1, 1), goal=(4, 4), walls=walls)
        assert not bool(s.passable)
        assert int(s.shortest_path_length) == (6 - 2) ** 2 + 1

    def test_detour_path(self):
        walls = [(2, 1), (2, 2), (2, 3)]
        s = make_state(agent=(1, 1), goal=(3, 1), walls=walls)
        assert bool(s.passable)
        # detour: down to y=4, across, back up: (1,1)->(1,4)->(3,4)->(3,1): 3+2+3=8
        assert int(s.shortest_path_length) == 8

    def test_distance_to_goal(self):
        s = make_state(agent=(1, 1), goal=(4, 3))
        assert int(s.distance_to_goal) == 5


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])
