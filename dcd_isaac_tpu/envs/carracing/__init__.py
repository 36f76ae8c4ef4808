from .adversarial import (
    AdversarialCarRacing, CarRacingUEDParams, make_carracing_env,
)
from .env import CarRacingConfig, CarRacingState
from .track import Track, build_track


def make_eval_builder(env_name: str):
    if env_name.startswith('CarRacingF1'):
        from .f1 import make_f1_eval_builder
        return make_f1_eval_builder(env_name)
    if env_name in ('CarRacing-Vanilla-v0', 'CarRacing-Bezier-v0'):
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
