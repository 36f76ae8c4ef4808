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


def record_trace(mod, config, seed, actions):
    env = mod.BipedalWalkerCustom(config)
    env.re_init(config, seed)
    # re_init ran _reset_env, which takes one zero-action step (the initial
    # random hull force is already integrated). Record the post-reset state.
    bodies = [env.hull, env.legs[0], env.legs[1], env.legs[2], env.legs[3]]
    init = np.stack([_body_state(b) for b in bodies])        # (5, 8)
    terrain_x = np.array(env.terrain_x)
    terrain_y = np.array(env.terrain_y)
    prev_shaping = env.prev_shaping

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
