"""--xpid_finetune: student agent initialized from a base run's checkpoint
(reference train.py:112-141)."""

import jax
import numpy as np
import pytest

from dcd_isaac_tpu.train import main

BASE = [
    '--env_name', 'MultiGrid-MiniAdversarial-v0',
    '--num_processes', '4', '--num_steps', '16',
    '--ppo_epoch', '1', '--num_mini_batch', '1',
    '--test_interval', '0', '--test_env_names', '',
]


def test_finetune_loads_agent_only(tmp_path):
    # base run: PAIRED with checkpointing
    base = main(BASE + [
        '--ued_algo', 'paired', '--num_env_steps', str(4 * 16 * 2),
        '--checkpoint', 'true', '--checkpoint_interval', '1',
        '--log_dir', str(tmp_path), '--xpid', 'base_run'])
    base_params = jax.tree.leaves(base.state.agent.params)

    # fine-tune run: DIFFERENT ued algo (DR + PLR) — only the student agent
    # transfers; teacher/PLR state must be fresh
    ft = main(BASE + [
        '--ued_algo', 'domain_randomization', '--use_plr', 'true',
        '--level_replay_seed_buffer_size', '8',
        '--num_env_steps', '0',
        '--xpid_finetune', 'base_run',
        '--log_dir', str(tmp_path), '--xpid', 'ft_run'])
    ft_params = jax.tree.leaves(ft.state.agent.params)

    for a, b in zip(base_params, ft_params):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ft.num_updates == 0                      # counters fresh
    assert not bool(ft.state.plr_agent.filled.any())  # PLR fresh


def test_finetune_missing_base_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        main(BASE + [
            '--ued_algo', 'domain_randomization',
            '--num_env_steps', '0',
            '--xpid_finetune', 'no_such_run',
            '--log_dir', str(tmp_path), '--xpid', 'ft_bad'])


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])
