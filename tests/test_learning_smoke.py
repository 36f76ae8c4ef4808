"""Learning-curve smoke test (SURVEY §4e; VERDICT r1 'weak' item 7).

Trains DR PPO on the mini adversarial grid long enough that the agent must
demonstrably improve: mean episode return over the last quarter of training
must beat the first quarter by a clear margin.  Fixed seed; generous
thresholds to stay robust while still failing on a broken learner
(e.g. sign-flipped advantages, dead optimizer, mis-wired masks).
"""

import numpy as np
import pytest

from dcd_isaac_tpu.arguments import parser
from dcd_isaac_tpu.envs.registry import make_env
from dcd_isaac_tpu.runner.adversarial_runner import AdversarialRunner
from dcd_isaac_tpu.utils.make_agent import make_all_models

import jax


@pytest.mark.slow
def test_dr_ppo_learns_minigrid():
    # time-pressured 7x7 grid (max_steps=20): a random policy rarely finds
    # the goal in time (mean return ~0.06), leaving clear learning headroom
    # — the registered Mini/Medium envs saturate near 0.75+ from update 1
    from dcd_isaac_tpu.envs.multigrid import (
        AdversarialMultiGrid, MultiGridParams,
    )
    args = parser.parse_args([
        '--env_name', 'MultiGrid-MiniAdversarial-v0',
        '--ued_algo', 'domain_randomization',
        '--num_processes', '32', '--num_steps', '32',
        '--ppo_epoch', '2', '--num_mini_batch', '1',
        '--lr', '3e-4', '--entropy_coef', '0.01',
        '--seed', '1',
    ])
    env = AdversarialMultiGrid(MultiGridParams(
        size=7, n_clutter=6, agent_view_size=5, max_steps=20))
    models = make_all_models(args, env)
    runner = AdversarialRunner(args, env, models, jax.random.PRNGKey(1))

    n_updates = 60
    returns = []
    for _ in range(n_updates):
        stats = runner.run()
        returns.append(stats['mean_agent_return'])

    first = float(np.mean(returns[:15]))
    last = float(np.mean(returns[-15:]))
    # measured with this seed: 0.063 -> 0.126 over 60 updates
    assert last > first * 1.4, (first, last, returns[::10])
    assert last > 0.09, (first, last)


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])
