"""Record golden Box2D traces from the REFERENCE CarRacing env.

Executes /root/reference/envs/box2d/car_racing_bezier.py — real Box2D
world stepping (``world.Step(1/50, 180, 60)``) with gym's multi-body
``car_dynamics.Car`` (hull + 4 wheel bodies, provided by gymnasium's
identical module) and the FrictionDetector tile-visit contact listener —
under fixed control points and deterministic scripted/closed-loop actions.

Saves to tests/fixtures/carracing_box2d_traces.npz:
  per scenario:
    control_points (12,2), track (N,4 = alpha,beta,x,y), x/y offsets,
    road_poly (N,4,2) tile quads (offset-centred),
    init car state (hull + wheels) after reset's zero-action frame,
    actions (T,3), per-step hull pose/vel (T,6), wheel omegas (T,4),
    step rewards, tile_visited_count, dones, per-step newly-visited tile
    index lists (flattened), car poses for render comparison.

The JAX parity test (tests/test_carracing_box2d_parity.py) replays the
same control points + actions through dcd_isaac_tpu's track builder and
single-body dynamics and measures divergence quantitatively
(VERDICT r2 item 2).

Run manually when regenerating fixtures:
    python tools/record_carracing_traces.py

pyglet is stubbed out (render is never invoked; the rendering comparison
is driven off the recorded road_poly geometry instead — the polygons ARE
what the reference's GL path draws).
"""

import importlib
import math
import sys
import types

import numpy as np

REFERENCE_ROOT = '/root/reference'
OUT = 'tests/fixtures/carracing_box2d_traces.npz'


def _install_shims():
    import gymnasium
    from gymnasium.envs.box2d import car_dynamics
    from gymnasium.utils import EzPickle

    gym = types.ModuleType('gym')
    gym.spaces = gymnasium.spaces
    gym.Env = gymnasium.Env
    utils = types.ModuleType('gym.utils')
    seeding = types.ModuleType('gym.utils.seeding')

    def np_random(seed=None):
        return np.random.RandomState(seed), seed

    seeding.np_random = np_random
    utils.seeding = seeding
    utils.colorize = lambda s, *a, **k: s
    utils.EzPickle = EzPickle
    gym.utils = utils
    gym_envs = types.ModuleType('gym.envs')
    gym_box2d = types.ModuleType('gym.envs.box2d')
    gym_box2d.car_dynamics = car_dynamics
    gym_envs.box2d = gym_box2d
    gym.envs = gym_envs
    sys.modules.update({
        'gym': gym, 'gym.utils': utils, 'gym.utils.seeding': seeding,
        'gym.envs': gym_envs, 'gym.envs.box2d': gym_box2d,
        'gym.envs.box2d.car_dynamics': car_dynamics,
    })

    # pyglet stub: imported at module top, used only by render paths we
    # never call.
    pyglet = types.ModuleType('pyglet')
    gl = types.ModuleType('pyglet.gl')
    pyglet.gl = gl
    pyglet.options = {}
    sys.modules['pyglet'] = pyglet
    sys.modules['pyglet.gl'] = gl

    # Reference package context WITHOUT executing envs/__init__.py (which
    # pulls in the whole multigrid/torch surface).
    envs_pkg = types.ModuleType('envs')
    envs_pkg.__path__ = [f'{REFERENCE_ROOT}/envs']
    sys.modules['envs'] = envs_pkg
    box2d_pkg = types.ModuleType('envs.box2d')
    box2d_pkg.__path__ = [f'{REFERENCE_ROOT}/envs/box2d']
    sys.modules['envs.box2d'] = box2d_pkg
    reg = types.ModuleType('envs.registration')
    reg.register = lambda *a, **k: None
    sys.modules['envs.registration'] = reg

    # util.geo_complexity: used only for the logged complexity_info dict
    # (not part of the recorded physics); shapely isn't installed, so give
    # it our re-derivation.
    sys.path.insert(0, '/root/repo')
    from dcd_isaac_tpu.utils import geo_complexity as geo
    util_pkg = types.ModuleType('util')
    util_pkg.geo_complexity = geo
    sys.modules['util'] = util_pkg
    sys.modules['util.geo_complexity'] = geo


def _load_reference():
    _install_shims()
    return importlib.import_module('envs.box2d.car_racing_bezier')


def _make_env_class(mod):
    class Recordable(mod.CarRacingBezier):
        """Reference env with fixed control points and no GL rendering."""

        def __init__(self, control_points=None, **kw):
            self._fixed_cps = control_points
            super().__init__(**kw)

        def _create_track(self, control_points=None, show_borders=None):
            if control_points is None:
                control_points = self._fixed_cps
            return super()._create_track(
                control_points=control_points, show_borders=show_borders)

        def render(self, mode='human', **kw):
            return None

    return Recordable


def _hull_state(car):
    h = car.hull
    return np.array([
        h.position.x, h.position.y, h.angle,
        h.linearVelocity.x, h.linearVelocity.y, h.angularVelocity,
    ])


def _wheel_states(car):
    out = []
    for w in car.wheels:
        out.append([
            w.position.x, w.position.y, w.angle, w.omega,
            w.joint.angle if w.joint else 0.0,
        ])
    return np.array(out)          # (4, 5)


def _controller(env, steer_sign, lookahead=8, v_target=22.0):
    """Deterministic ground-truth track-following P-controller."""
    car = env.car
    x, y = car.hull.position
    vx, vy = car.hull.linearVelocity
    speed = math.hypot(vx, vy)
    pts = np.array([[p[2] - env.x_offset, p[3] - env.y_offset]
                    for p in env.track])
    i = int(np.argmin(((pts - [x, y]) ** 2).sum(1)))
    tgt = pts[(i + lookahead) % len(pts)]
    desired = math.atan2(tgt[1] - y, tgt[0] - x)
    heading = car.hull.angle + math.pi / 2.0    # forward = (-sin a, cos a)
    err = (desired - heading + math.pi) % (2 * math.pi) - math.pi
    steer = float(np.clip(steer_sign * 2.0 * err, -1.0, 1.0))
    gas = float(np.clip(0.08 + 0.4 * (v_target - speed) / v_target, 0.0, 1.0))
    brake = 0.8 if speed > v_target * 1.3 else 0.0
    return np.array([steer, gas, brake])


def record_scenario(Recordable, control_points, actions=None, T=400,
                    closed_loop=False, steer_sign=-1.0, seed=17):
    env = Recordable(control_points=control_points, seed=seed)
    env.reset()

    init_hull = _hull_state(env.car)
    init_wheels = _wheel_states(env.car)
    track = np.array(env.track)                       # (N, 4)
    road_poly = np.array(
        [quad for quad, color in env.road_poly
         if len(quad) == 4 and color[0] != 1][:len(track)])
    # only tile quads (skip red/white border quads whose color[0]==1)

    if actions is not None:
        T = min(T, len(actions))
    rec_actions, hull, wheels, rewards = [], [], [], []
    counts, dones, new_tiles = [], [], []
    for t in range(T):
        a = (_controller(env, steer_sign) if closed_loop
             else np.asarray(actions[t], np.float64))
        before = {i for i in range(len(env.road))
                  if env.road[i].road_visited}
        _, r, d, _ = env.step(np.asarray(a, np.float64))
        after = {i for i in range(len(env.road))
                 if env.road[i].road_visited}
        rec_actions.append(a)
        hull.append(_hull_state(env.car))
        wheels.append(_wheel_states(env.car)[:, 3])   # omegas
        rewards.append(r)
        counts.append(env.tile_visited_count)
        dones.append(d)
        new_tiles.append(sorted(after - before))
        if d:
            break

    # flatten new-tile lists: (step_index, tile_index) pairs
    visits = np.array([(s, i) for s, lst in enumerate(new_tiles)
                       for i in lst], np.int64).reshape(-1, 2)
    return {
        'control_points': np.asarray(control_points, np.float64),
        'track': track,
        'offsets': np.array([env.x_offset, env.y_offset]),
        'road_poly': road_poly,
        'init_hull': init_hull, 'init_wheels': init_wheels,
        'actions': np.array(rec_actions),
        'hull': np.array(hull), 'wheel_omega': np.array(wheels),
        'rewards': np.array(rewards),
        'tile_count': np.array(counts, np.int64),
        'dones': np.array(dones, bool),
        'visits': visits,
    }


def record_f1_geometry(Recordable, name):
    env = Recordable(track_name=name, seed=3)
    env.reset()
    return {
        'track': np.array(env.track),
        'offsets': np.array([env.x_offset, env.y_offset]),
        'playfield': np.float64(env.playfield),
        'road_poly': np.array(
            [quad for quad, color in env.road_poly
             if len(quad) == 4 and color[0] != 1][:len(env.track)]),
    }


def main():
    mod = _load_reference()
    Recordable = _make_env_class(mod)
    bezier = sys.modules['envs.box2d.bezier']

    PLAYFIELD = mod.PLAYFIELD
    cps7 = bezier.get_random_points(
        n=12, scale=PLAYFIELD, np_random=np.random.RandomState(7))
    cps11 = bezier.get_random_points(
        n=12, scale=PLAYFIELD, np_random=np.random.RandomState(11))

    # open-loop script: launch straight, weave, coast
    T = 300
    t = np.arange(T)
    open_loop = np.stack([
        0.25 * np.sin(0.05 * t),                       # steer
        np.clip(0.5 - 0.001 * t, 0.05, 1.0),           # gas
        np.where((t % 97) < 4, 0.4, 0.0),              # brake pulses
    ], axis=1)

    # pick the steer sign that actually follows the track
    probe = {}
    for sign in (-1.0, 1.0):
        tr = record_scenario(Recordable, cps7, closed_loop=True,
                             steer_sign=sign, T=150)
        probe[sign] = int(tr['tile_count'][-1])
    steer_sign = max(probe, key=probe.get)
    print(f'steer sign probe: {probe} -> {steer_sign}')

    traces = {
        'bez7_ctrl': record_scenario(
            Recordable, cps7, closed_loop=True, steer_sign=steer_sign,
            T=600),
        'bez11_ctrl': record_scenario(
            Recordable, cps11, closed_loop=True, steer_sign=steer_sign,
            T=600),
        'bez7_open': record_scenario(Recordable, cps7, actions=open_loop),
        'bez11_open': record_scenario(Recordable, cps11, actions=open_loop),
    }
    f1 = {'f1_Germany': record_f1_geometry(Recordable, 'Germany'),
          'f1_Italy': record_f1_geometry(Recordable, 'Italy')}

    flat = {}
    for name, tr in {**traces, **f1}.items():
        for k, v in tr.items():
            flat[f'{name}/{k}'] = v
    np.savez_compressed(OUT, **flat)
    for name, tr in traces.items():
        print(f'{name}: T={len(tr["actions"])} tiles={tr["tile_count"][-1]}'
              f'/{len(tr["track"])} total_r={tr["rewards"].sum():.1f} '
              f'done={tr["dones"][-1]} final_pos='
              f'({tr["hull"][-1, 0]:.1f},{tr["hull"][-1, 1]:.1f})')
    print('wrote', OUT)


if __name__ == '__main__':
    main()


# Reference lines validated by these fixtures:
#   track creation  car_racing_bezier.py:284-426
#   tile rewards    car_racing_bezier.py:64-129 (FrictionDetector)
#   step/termination car_racing_bezier.py:654-699
#   car dynamics    gym car_dynamics (multi-body Box2D), constructed at
#                   car_racing_bezier.py:648
