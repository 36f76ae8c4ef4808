"""Record golden Box2D traces from the REFERENCE walker env.

Executes /root/reference/envs/bipedalwalker/walker_env.py (real Box2D
physics, ``world.Step(1/50, 180, 60)``) under scripted actions and saves
terrain + initial body states + per-step trajectories to
tests/fixtures/walker_box2d_traces.npz.

The JAX physics parity test (tests/test_walker_box2d_parity.py) replays the
same initial conditions + actions through dcd_isaac_tpu's impulse solver and
measures divergence quantitatively (VERDICT r1 item 6).

Run manually when regenerating fixtures:
    python tools/record_walker_traces.py
"""

import importlib.util
import sys
import types

import numpy as np

REFERENCE_WALKER = '/root/reference/envs/bipedalwalker/walker_env.py'
OUT = 'tests/fixtures/walker_box2d_traces.npz'


def _install_gym_shim():
    """Minimal `gym` module backed by gymnasium + RandomState seeding.

    The reference uses old-gym APIs: spaces, utils.colorize,
    utils.seeding.np_random (returning a RandomState with .randint/.rand).
    """
    import gymnasium

    gym = types.ModuleType('gym')
    gym.spaces = gymnasium.spaces
    utils = types.ModuleType('gym.utils')

    def colorize(string, *a, **k):
        return string

    seeding = types.ModuleType('gym.utils.seeding')

    def np_random(seed=None):
        rs = np.random.RandomState(seed)
        return rs, seed

    seeding.np_random = np_random
    utils.colorize = colorize
    utils.seeding = seeding
    gym.utils = utils
    gym.Env = gymnasium.Env
    sys.modules['gym'] = gym
    sys.modules['gym.utils'] = utils
    sys.modules['gym.utils.seeding'] = seeding


def _load_reference_walker():
    _install_gym_shim()
    spec = importlib.util.spec_from_file_location(
        'ref_walker_env', REFERENCE_WALKER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _body_state(body):
    return np.array([
        body.position.x, body.position.y,
        body.worldCenter.x, body.worldCenter.y,
        body.angle,
        body.linearVelocity.x, body.linearVelocity.y,
        body.angularVelocity,
    ])


def record_trace(mod, config, seed, actions, ctor_config=None,
                 extra_boxes=()):
    # construct with an obstacle-free config: the constructor's unseeded
    # _reset_env crashes on stump configs (walker_env.py:326 env_seed None);
    # re_init regenerates everything from (config, seed) anyway.
    env = mod.BipedalWalkerCustom(ctor_config or config)
    env.re_init(config, seed)
    # optional hand-placed obstacle boxes in the walker's immediate path:
    # the state-machine obstacles start past x~9 and scripted walkers fall
    # by x~5.5, so box contacts are exercised by planting boxes at start
    # (identical AABBs are replayed through the JAX solver).
    for (x0, y0, x1, y1) in extra_boxes:
        env.fd_polygon.shape.vertices = [
            (x0, y0), (x1, y0), (x1, y1), (x0, y1)]
        t = env.world.CreateStaticBody(fixtures=env.fd_polygon)
        t.color1, t.color2 = (1, 1, 1), (0.6, 0.6, 0.6)
        env.terrain.append(t)
    # re_init ran _reset_env, which takes one zero-action step (the initial
    # random hull force is already integrated). Record the post-reset state.
    bodies = [env.hull, env.legs[0], env.legs[1], env.legs[2], env.legs[3]]
    init = np.stack([_body_state(b) for b in bodies])        # (5, 8)
    terrain_x = np.array(env.terrain_x)
    terrain_y = np.array(env.terrain_y)
    prev_shaping = env.prev_shaping
    # obstacle fixtures (stumps/stair treads/pit walls): 4-vertex polygon
    # static bodies; ground strips are edge fixtures (2 verts)
    boxes = []
    for body in env.terrain:
        for fix in body.fixtures:
            verts = getattr(fix.shape, 'vertices', [])
            if len(verts) == 4:
                w = [body.transform * v for v in verts]
                xs_ = [p[0] for p in w]
                ys_ = [p[1] for p in w]
                boxes.append((min(xs_), min(ys_), max(xs_), max(ys_)))
    boxes = np.array(sorted(boxes), np.float64).reshape(-1, 4)

    T = len(actions)
    hull = np.zeros((T, 8))
    obs = np.zeros((T, 24))
    joints = np.zeros((T, 8))
    rewards = np.zeros(T)
    dones = np.zeros(T, bool)
    n = T
    for t, a in enumerate(actions):
        o, r, d, info = env.step(np.asarray(a, np.float64))
        hull[t] = _body_state(env.hull)
        obs[t] = o
        joints[t] = [env.joints[j].angle for j in range(4)] + \
                    [env.joints[j].speed for j in range(4)]
        rewards[t] = r
        dones[t] = d
        if d:
            n = t + 1
            break
    return {
        'terrain_x': terrain_x, 'terrain_y': terrain_y,
        'boxes': boxes,
        'init_bodies': init, 'prev_shaping': np.float64(prev_shaping),
        'actions': np.asarray(actions, np.float64)[:n],
        'hull': hull[:n], 'obs': obs[:n], 'joints': joints[:n],
        'rewards': rewards[:n], 'dones': dones[:n],
    }


def main():
    mod = _load_reference_walker()
    flat = mod.EnvConfig(
        name='flat', ground_roughness=0,
        pit_gap=[], stump_width=[], stump_height=[], stump_float=[],
        stair_height=[], stair_width=[], stair_steps=[])
    rough = mod.EnvConfig(
        name='rough', ground_roughness=0.6,
        pit_gap=[], stump_width=[], stump_height=[], stump_float=[],
        stair_height=[], stair_width=[], stair_steps=[])
    # obstacle configs: exercise the box-contact path (VERDICT r2 item 5)
    stumps = mod.EnvConfig(
        name='stumps', ground_roughness=0,
        pit_gap=[], stump_width=[1, 2], stump_height=[1, 2],
        stump_float=[0, 1],
        stair_height=[], stair_width=[], stair_steps=[])
    stairs = mod.EnvConfig(
        name='stairs', ground_roughness=0,
        pit_gap=[], stump_width=[], stump_height=[], stump_float=[],
        stair_height=[1, 2], stair_width=[4, 5], stair_steps=[3, 5])
    pits = mod.EnvConfig(
        name='pits', ground_roughness=0,
        pit_gap=[2, 3], stump_width=[], stump_height=[], stump_float=[],
        stair_height=[], stair_width=[], stair_steps=[])

    T = 250
    t = np.arange(T)
    stand = np.zeros((T, 4))
    gait = 0.6 * np.stack([
        np.sin(0.12 * t), np.cos(0.12 * t),
        -np.sin(0.12 * t), -np.cos(0.12 * t)], axis=1)
    rng = np.random.RandomState(0)
    random_acts = rng.uniform(-1, 1, (T, 4))

    traces = {
        'flat_stand': record_trace(mod, flat, 11, stand),
        'flat_gait': record_trace(mod, flat, 11, gait),
        'flat_random': record_trace(mod, flat, 11, random_acts),
        'rough_stand': record_trace(mod, rough, 13, stand),
        'rough_gait': record_trace(mod, rough, 13, gait),
        # box-contact traces: knee-height step + hull-height wall ahead
        # (TERRAIN_HEIGHT=3.33, walker starts at x~4.67)
        'box_step_gait': record_trace(
            mod, flat, 17, gait,
            extra_boxes=[(5.2, 3.0, 6.0, 3.8)]),
        'box_step_random': record_trace(
            mod, flat, 19, random_acts,
            extra_boxes=[(5.1, 3.0, 5.9, 3.75)]),
        'box_wall_stand': record_trace(
            mod, flat, 23, stand,
            extra_boxes=[(5.15, 3.0, 5.55, 4.6)]),
    }

    flat_data = {}
    for name, tr in traces.items():
        for k, v in tr.items():
            flat_data[f'{name}/{k}'] = v
    np.savez_compressed(OUT, **flat_data)
    for name, tr in traces.items():
        print(f'{name}: T={len(tr["actions"])} '
              f'final_x={tr["hull"][-1, 0]:.3f} '
              f'total_r={tr["rewards"].sum():.2f} done={tr["dones"][-1]}')
    print('wrote', OUT)


if __name__ == '__main__':
    main()
