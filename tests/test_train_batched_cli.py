"""train.py --cycles_per_dispatch: batched update loop end-to-end.

The K>1 loop must produce per-cycle logs.csv rows with exact update
indices, honor checkpoint buckets, and resume from a checkpoint exactly
like the sequential loop (the r4 campaigns run entirely through this
path)."""

import csv
import os

from dcd_isaac_tpu.train import main

BASE = [
    '--env_name', 'MultiGrid-MiniAdversarial-v0',
    '--ued_algo', 'domain_randomization',
    '--use_plr', 'true',
    '--no_exploratory_grad_updates', 'true',
    '--num_processes', '4', '--num_steps', '16',
    '--ppo_epoch', '1', '--num_mini_batch', '1',
    '--level_replay_seed_buffer_size', '8',
    '--test_interval', '0', '--test_env_names', '',
    '--log_interval', '1',
    '--cycles_per_dispatch', '3',
]


def test_batched_loop_rows_and_resume(tmp_path):
    run = main(BASE + [
        '--num_env_steps', str(9 * 4 * 16),   # 9 updates, 3 dispatches
        '--checkpoint', 'true', '--checkpoint_interval', '3',
        '--log_dir', str(tmp_path), '--xpid', 'bt'])
    assert run.num_updates == 9
    logs = os.path.join(str(tmp_path), 'bt', 'logs.csv')
    rows = list(csv.DictReader(open(logs)))
    assert [int(float(r['total_updates'])) for r in rows] == list(
        range(1, 10))
    assert os.path.exists(os.path.join(str(tmp_path), 'bt', 'model.tar'))

    # resume: extend the budget to 15 updates; must restart at 9 and
    # append rows 10..15 without duplicates
    run2 = main(BASE + [
        '--num_env_steps', str(15 * 4 * 16),
        '--checkpoint', 'true', '--checkpoint_interval', '3',
        '--log_dir', str(tmp_path), '--xpid', 'bt'])
    assert run2.num_updates == 15
    rows = list(csv.DictReader(open(logs)))
    ticks = [int(float(r['total_updates'])) for r in rows]
    assert ticks == sorted(set(ticks)), 'duplicate log rows after resume'
    assert ticks[-1] == 15


def test_batched_loop_final_update_eval(tmp_path):
    # ADVICE r4: when (num_updates - 1) is not a test_interval multiple,
    # the batched loop must still eval the final params and merge the
    # solved_rate columns into the final update's row (the sequential
    # loop's `j == num_updates - 1` clause) — as a MERGE, not an extra
    # row: total_updates ticks must stay unique
    argv = [a for a in BASE]
    argv[argv.index('--test_interval') + 1] = '4'
    argv[argv.index('--test_env_names') + 1] = 'MultiGrid-Labyrinth-v0'
    run = main(argv + [
        '--test_num_episodes', '2',
        '--num_env_steps', str(6 * 4 * 16),   # 6 updates; 5 % 4 != 0
        '--log_dir', str(tmp_path), '--xpid', 'fe'])
    assert run.num_updates == 6
    logs = os.path.join(str(tmp_path), 'fe', 'logs.csv')
    rows = list(csv.DictReader(open(logs)))
    key = 'solved_rate:MultiGrid-Labyrinth-v0'
    final = [r for r in rows if int(float(r['total_updates'])) == 6
             and r.get(key)]
    assert final, 'final-update row missing solved_rate columns'
    ticks = [int(float(r['total_updates'])) for r in rows]
    assert ticks == sorted(set(ticks)), 'duplicate total_updates rows'
