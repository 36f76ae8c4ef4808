from .adversarial import AdversarialWalker, WalkerParams, make_walker_env
from .env import WalkerState, reset_walker, step_walker, gen_walker_obs
from . import physics, terrain
