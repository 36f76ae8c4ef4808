"""Quantitative walker-physics parity vs recorded REAL Box2D traces.

Fixtures in tests/fixtures/walker_box2d_traces.npz were recorded by
tools/record_walker_traces.py executing the reference walker
(/root/reference/envs/bipedalwalker/walker_env.py, Box2D
``world.Step(1/50, 180, 60)``) under scripted actions.  This test replays
identical initial conditions + terrain + actions through the JAX impulse
solver and asserts measured divergence bounds (VERDICT r1 item 6; tolerances
documented in PARITY_WALKER.md).

Box2D's iterative solver and ours differ (40-iter Baumgarte vs 180/60 +
position solver), and contact-rich dynamics are chaotic — bit-exactness is
impossible; these bounds pin the behavioral envelope instead.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcd_isaac_tpu.envs.walker import physics as ph
from dcd_isaac_tpu.envs.walker.env import (
    WalkerState, hull_origin, step_walker,
)

FIXTURE = os.path.join(
    os.path.dirname(__file__), 'fixtures', 'walker_box2d_traces.npz')
TRACES = ['flat_stand', 'flat_gait', 'flat_random',
          'rough_stand', 'rough_gait',
          # box-contact traces: step/wall obstacles in the walker's path
          # (obstacle-box contact path, VERDICT r2 item 5)
          'box_step_gait', 'box_step_random', 'box_wall_stand']


@pytest.fixture(scope='module')
def data():
    return np.load(FIXTURE)


def replay(data, name, extra_steps=120):
    """Run the JAX solver from the recorded Box2D initial state."""
    g = lambda k: data[f'{name}/{k}']
    init = g('init_bodies')    # (5, 8): px,py,wcx,wcy,angle,vx,vy,w
    rb = g('boxes') if f'{name}/boxes' in data.files else np.zeros((0, 4))
    boxes = np.zeros((ph.MAX_BOXES, 4))
    boxes[:len(rb)] = rb
    terrain = ph.Terrain(
        xs=jnp.asarray(g('terrain_x')), ys=jnp.asarray(g('terrain_y')),
        boxes=jnp.asarray(boxes), n_boxes=jnp.int32(len(rb)))
    bodies = ph.Bodies(
        pos=jnp.asarray(init[:, 2:4]),       # worldCenter == centroid
        angle=jnp.asarray(init[:, 4]),
        vel=jnp.asarray(init[:, 5:7]),
        angvel=jnp.asarray(init[:, 7]))
    st = WalkerState(
        bodies=bodies, terrain=terrain,
        prev_shaping=jnp.float32(g('prev_shaping')),
        game_over=jnp.bool_(False), step_count=jnp.int32(0),
        lower_contact=jnp.zeros(2, bool), joint_angle=jnp.zeros(4),
        joint_speed=jnp.zeros(4), level_params=jnp.zeros(8),
        level_seed=jnp.uint32(0), adv_step_count=jnp.int32(0))
    actions = g('actions')
    A = np.concatenate(
        [actions, np.tile(actions[-1:], (extra_steps, 1))], 0)
    step = jax.jit(step_walker)
    hull_xy, joint_angles = [], []
    fall = None
    for t in range(len(A)):
        st, obs, r, d, fin = step(st, jnp.asarray(A[t]))
        o = np.asarray(hull_origin(st.bodies))
        hull_xy.append(o)
        joint_angles.append(np.asarray(st.joint_angle))
        if bool(d):
            fall = t + 1
            break
    return np.array(hull_xy), np.array(joint_angles), fall


class TestHullTrajectory:
    @pytest.mark.parametrize('name', TRACES)
    def test_short_horizon_position(self, data, name):
        """Hull position must track Box2D closely before chaos kicks in."""
        hull_xy, _, _ = replay(data, name)
        ref = data[f'{name}/hull']
        K10 = min(10, len(hull_xy), len(ref))
        K30 = min(30, len(hull_xy), len(ref))
        dx10 = np.abs(hull_xy[:K10, 0] - ref[:K10, 0]).max()
        dx30 = np.abs(hull_xy[:K30, 0] - ref[:K30, 0]).max()
        dy30 = np.abs(hull_xy[:K30, 1] - ref[:K30, 1]).max()
        # measured: dx10 ≤ 0.057, dx30 ≤ 0.21, dy30 ≤ 0.38 over all 8
        # traces (bounds ~1.2x measured; VERDICT r2 item 5 tightening)
        assert dx10 < 0.07, dx10
        assert dx30 < 0.25, dx30
        assert dy30 < 0.45, dy30

    @pytest.mark.parametrize('name', TRACES)
    def test_fall_timing_envelope(self, data, name):
        """Episode termination must occur, within ±35% of the Box2D step
        (measured worst 32%, flat/rough passive collapse).

        Exception: box_step_random — random flailing against an obstacle
        box is the most contact-chaotic trace (Box2D position-solver
        teleports dominate); measured +51%, bounded at ±60%.
        """
        _, _, fall = replay(data, name)
        ref_T = len(data[f'{name}/actions'])
        ref_done = bool(data[f'{name}/dones'][-1])
        assert ref_done
        assert fall is not None, 'JAX walker never terminated'
        frac = 0.60 if name == 'box_step_random' else 0.35
        assert abs(fall - ref_T) <= max(frac * ref_T, 8), (fall, ref_T)


class TestJointTracking:
    @pytest.mark.parametrize('name', [
        'flat_gait', 'flat_random', 'rough_gait',
        'box_step_gait', 'box_wall_stand'])
    def test_joint_angle_correlation(self, data, name):
        """Driven joint trajectories correlate with Box2D over the episode.

        Per-step max error is the wrong metric here: Box2D's position
        solver teleports bodies on deep contact (observed per-step joint
        jumps of 0.6 rad, >5x the motor speed limit), which the Baumgarte
        solver spreads over several steps.  Correlation + RMSE pin the
        behavioral envelope instead (measured: min corr 0.72, RMSE
        0.09–0.33 rad over the driven traces incl. box contacts —
        PARITY_WALKER.md).  Stand traces and box_step_random are
        excluded: near-constant or post-divergence joint signals make
        correlation meaningless there.
        """
        _, ja, _ = replay(data, name)
        ref = data[f'{name}/joints'][:, :4]
        K = min(len(ja), len(ref))
        corrs, rmses = [], []
        for j in range(4):
            corrs.append(np.corrcoef(ja[:K, j], ref[:K, j])[0, 1])
            rmses.append(np.sqrt(((ja[:K, j] - ref[:K, j]) ** 2).mean()))
        assert min(corrs) > 0.70, corrs
        assert np.mean(corrs) > 0.85, corrs
        assert max(rmses) < 0.40, rmses


class TestGroundInteraction:
    @pytest.mark.slow
    def test_no_terrain_penetration(self, data):
        """Standing feet stay within the penetration slop of the ground."""
        name = 'flat_stand'
        g = lambda k: data[f'{name}/{k}']
        terrain = ph.Terrain(
            xs=jnp.asarray(g('terrain_x')), ys=jnp.asarray(g('terrain_y')),
            boxes=jnp.zeros((ph.MAX_BOXES, 4)), n_boxes=jnp.int32(0))
        init = g('init_bodies')
        bodies = ph.Bodies(
            pos=jnp.asarray(init[:, 2:4]), angle=jnp.asarray(init[:, 4]),
            vel=jnp.asarray(init[:, 5:7]), angvel=jnp.asarray(init[:, 7]))
        quiet, worst = 0.0, 0.0
        for t in range(40):
            bodies, *_ = ph.physics_step(
                bodies, terrain, jnp.zeros(4), jnp.zeros(4))
            wv = np.asarray(ph.world_vertices(bodies)).reshape(-1, 2)
            gy, _ = ph.ground_height(terrain, jnp.asarray(wv[:, 0]))
            pen = float((np.asarray(gy) - wv[:, 1]).max())
            worst = max(worst, pen)
            if t <= 15:
                quiet = max(quiet, pen)
        # measured: 4.6 mm quiet stance; 6.6 cm transient during the
        # passive-collapse impact (knee grinding into the ground)
        assert quiet < 0.01, quiet
        assert worst < 0.09, worst

    def test_resting_contact_reported(self, data):
        name = 'flat_stand'
        g = lambda k: data[f'{name}/{k}']
        terrain = ph.Terrain(
            xs=jnp.asarray(g('terrain_x')), ys=jnp.asarray(g('terrain_y')),
            boxes=jnp.zeros((ph.MAX_BOXES, 4)), n_boxes=jnp.int32(0))
        init = g('init_bodies')
        bodies = ph.Bodies(
            pos=jnp.asarray(init[:, 2:4]), angle=jnp.asarray(init[:, 4]),
            vel=jnp.asarray(init[:, 5:7]), angvel=jnp.asarray(init[:, 7]))
        for _ in range(5):
            bodies, lower, *_ = ph.physics_step(
                bodies, terrain, jnp.zeros(4), jnp.zeros(4))
        assert bool(np.asarray(lower).any()), 'feet must report contact'


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])
