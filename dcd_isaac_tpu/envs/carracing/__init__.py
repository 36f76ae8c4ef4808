from .adversarial import (
    AdversarialCarRacing, CarRacingUEDParams, make_carracing_env,
)
from .env import CarRacingConfig, CarRacingState
from .track import Track, build_track


def make_eval_builder(env_name: str):
    if env_name.startswith('CarRacingF1'):
        from .f1 import make_f1_eval_builder
        return make_f1_eval_builder(env_name)
    if env_name == 'CarRacing-Vanilla-v0':
        # classic polar-checkpoint tracks (reference keeps the original gym
        # generator for this env, car_racing_bezier.py:428-621); tracks are
        # generated host-side and shipped as level arrays
        import jax.numpy as jnp

        from .env import CarRacingConfig, make_carracing_core
        from .polar import POLAR_CAPACITY, generate_polar_level
        from .track import build_track

        class PolarEval:
            def __init__(self):
                self.cfg = CarRacingConfig(
                    track_capacity=POLAR_CAPACITY, reward_shaping=False)
                self._fresh_state, self._step = make_carracing_core(self.cfg)

            def reset_to_level(self, level):
                n = level[0, 0].astype(jnp.int32)
                points = level[1:]
                valid = jnp.arange(POLAR_CAPACITY) < n
                track = build_track(points, valid=valid)
                return self._fresh_state(track, jnp.zeros(1), jnp.uint32(0))

            def step(self, state, action, rng=None):
                return self._step(state, action, rng)

        env = CarRacingConfig()

        def build(np_rng, n):
            import numpy as np
            return jnp.asarray(np.stack(
                [generate_polar_level(np_rng) for _ in range(n)]))

        return PolarEval(), 1000 // env.num_action_repeat, build
    if env_name == 'CarRacing-Bezier-v0':
        # random bezier tracks as the eval distribution
        import jax.numpy as jnp
        env = AdversarialCarRacing()

        class RandomBezierEval:
            cfg = env.cfg

            def reset_to_level(self, level):
                import jax
                return env.reset_random(
                    jax.random.PRNGKey(level[0].astype(jnp.uint32)))

            def step(self, state, action, rng=None):
                return env.step(state, action, rng)

        def build(np_rng, n):
            return jnp.asarray(
                np_rng.randint(0, 2 ** 31 - 1, size=(n, 1)), 'uint32')

        return RandomBezierEval(), env.max_episode_steps, build
    raise ValueError(env_name)
