"""Measure production-config throughput vs --cycles_per_dispatch.

The r3 campaign ran the reference's N=32 config at ~17k env-steps/s —
launch-latency-bound, 29x under the N=4096 bench (PERF.md r3, VERDICT r3
weak #3). This probe times runner.run_batched(K) at the ACCEL campaign
config for a list of K values.

Usage: python tools/bench_dispatch.py [--ks 1,10,50] [--reps 3]
"""

import argparse
import sys
import time

sys.path.insert(0, '.')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ks', type=str, default='1,10,50')
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--num_processes', type=int, default=32)
    ap.add_argument('--num_steps', type=int, default=256)
    cli = ap.parse_args()

    import jax
    import numpy as np

    from dcd_isaac_tpu.arguments import parser
    from dcd_isaac_tpu.envs.registry import make_env
    from dcd_isaac_tpu.runner.adversarial_runner import AdversarialRunner
    from dcd_isaac_tpu.utils.compile_cache import enable_persistent_cache
    from dcd_isaac_tpu.utils.make_agent import make_all_models

    enable_persistent_cache()
    # the r4 ACCEL campaign config (tools/run_campaign_r4.sh)
    args = parser.parse_args([
        '--env_name', 'MultiGrid-GoalLastEmptyAdversarialEnv-Edit-v0',
        '--ued_algo', 'domain_randomization',
        '--num_processes', str(cli.num_processes),
        '--num_steps', str(cli.num_steps),
        '--ppo_epoch', '5', '--num_mini_batch', '1',
        '--handle_timelimits', 'True',
        '--recurrent_arch', 'lstm', '--recurrent_agent', 'True',
        '--recurrent_adversary_env', 'False',
        '--entropy_coef', '0.0',
        '--use_plr', 'True', '--level_replay_prob', '0.8',
        '--level_replay_rho', '0.5',
        '--level_replay_seed_buffer_size', '4000',
        '--level_replay_temperature', '0.3',
        '--level_replay_strategy', 'positive_value_loss',
        '--level_replay_score_transform', 'rank',
        '--no_exploratory_grad_updates', 'True',
        '--use_editor', 'True', '--level_editor_prob', '1.0',
        '--num_edits', '5', '--base_levels', 'easy',
        '--log_action_complexity', 'True',
        '--log_plr_buffer_stats', 'True',
        '--log_replay_complexity', 'True',
    ])
    env = make_env(args.env_name)
    models = make_all_models(args, env)
    N, T = args.num_processes, args.num_steps

    for k in [int(x) for x in cli.ks.split(',')]:
        runner = AdversarialRunner(args, env, models, jax.random.PRNGKey(0))
        np.random.seed(0)
        t0 = time.perf_counter()
        runner.run_batched(k)
        jax.block_until_ready(runner.state.agent.params)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(cli.reps):
            t0 = time.perf_counter()
            runner.run_batched(k)
            jax.block_until_ready(runner.state.agent.params)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f'K={k:4d}: {k / dt:8.2f} updates/s  '
              f'{N * T * k / dt:12.0f} steps/s  '
              f'(first-call {compile_s:.1f}s, best-of-{cli.reps} '
              f'{dt:.3f}s)', flush=True)


if __name__ == '__main__':
    main()
