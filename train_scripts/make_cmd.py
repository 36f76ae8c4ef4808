"""Grid-config → command-line generator (reference train_scripts/make_cmd.py).

Expands JSON hyperparameter grids (the reference's grid_configs/*.json files
work unchanged) into ``python -m dcd_isaac_tpu.train`` command lines with the
canonical xpid naming scheme, so runs are directly comparable with published
reference results.

Usage:
  python train_scripts/make_cmd.py --json <path/to/grid.json> --num_trials 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _argparse_defaults():
    """Fill unlisted grid keys from the real CLI defaults, mirroring the
    reference's hand-maintained defaults dict (make_cmd.py:187-244) without
    a second copy that can drift from arguments.py."""
    from dcd_isaac_tpu.arguments import parser as train_parser
    return {a.dest: a.default for a in train_parser._actions
            if a.dest != 'help'}


def generate_all_params_for_grid(grid, defaults=None):
    defaults = dict(defaults or {})
    params_list = [defaults]
    for param, choices in grid.items():
        params_list = [
            {**p, param: v} for v in choices for p in params_list]
    return params_list


def xpid_from_params(p, prefix=''):
    """Canonical experiment id (reference make_cmd.py:127-181)."""
    ued_algo = p['ued_algo']
    is_train_env = ued_algo in ('paired', 'flexible_paired', 'minimax')

    env_prefix = ''
    if p['env_name'].startswith(('MultiGrid', 'Bipedal')):
        env_prefix = p['env_name']
    elif p['env_name'].startswith('CarRacing'):
        env_prefix = f"{p['env_name']}_{p.get('num_control_points', 12)}pts"
    if p.get('grayscale', False):
        env_prefix += '_gray'

    prefix_str = '' if prefix == '' else f'-{prefix}'

    rnn_prefix = ''
    rnn_agent = 'a' if p.get('recurrent_agent') else ''
    rnn_env = 'e' if p.get('recurrent_adversary_env') and is_train_env else ''
    if rnn_agent or rnn_env:
        rnn_prefix = (f"-{p['recurrent_arch']}"
                      f"{p['recurrent_hidden_size']}{rnn_agent}{rnn_env}")

    ppo_prefix = (f"-lr{p['lr']}-epoch{p['ppo_epoch']}"
                  f"-mb{p['num_mini_batch']}-v{p.get('value_loss_coef', 0.5)}"
                  f"-gc{p.get('max_grad_norm', 0.5)}")
    if p['env_name'].startswith('CarRacing') and not p.get(
            'clip_value_loss', True):
        ppo_prefix += (f"-no_clipv-gamma-{p['gamma']}"
                       f"-lambda{p.get('gae_lambda', 0.95)}"
                       f"-gclip{p.get('clip_param', 0.2)}")

    entropy_prefix = (f"-henv{p.get('adv_entropy_coef', 0.0)}"
                      f"-ha{p.get('entropy_coef', 0.0)}")

    plr_prefix = ''
    if p.get('use_plr') and p.get('level_replay_prob', 0) > 0:
        plr_prefix = (
            f"-plr{p['level_replay_prob']}-rho{p['level_replay_rho']}"
            f"-n{p['level_replay_seed_buffer_size']}"
            f"-st{p['staleness_coef']}-{p['level_replay_strategy']}"
            f"-{p['level_replay_score_transform']}"
            f"-t{p['level_replay_temperature']}")

    editing_prefix = ''
    if p.get('use_editor'):
        editing_prefix = (
            f"-editor{p['level_editor_prob']}"
            f"-{p.get('level_editor_method', 'random')}-n{p['num_edits']}"
            f"-base{p.get('base_levels', 'batch')}")

    timelimits = '-tl' if p.get('handle_timelimits') else ''
    global_critic = '-global' if p.get('use_global_critic') else ''
    noexpgrad = '-noexpgrad' if p.get('no_exploratory_grad_updates') else ''
    finetune = (f"-ft_{p['xpid_finetune']}"
                if p.get('xpid_finetune') else '')

    return (f'ued{prefix_str}-{env_prefix}-{ued_algo}{finetune}{noexpgrad}'
            f'{rnn_prefix}{ppo_prefix}{entropy_prefix}{plr_prefix}'
            f'{editing_prefix}{global_critic}{timelimits}')


def generate_train_cmds(params, num_trials=1, start_index=0, newlines=False,
                        xpid_generator=xpid_from_params, xpid_prefix=''):
    separator = ' \\\n' if newlines else ' '
    cmds = []
    if xpid_generator:
        # xpid naming needs values for flags the grid may not pin; fill
        # those from the CLI defaults (naming only — the emitted command
        # keeps just the grid's own keys, letting argparse supply the rest).
        params['xpid'] = xpid_generator(
            {**_argparse_defaults(), **params}, xpid_prefix)
    start_seed = params.get('seed', 1)
    for t in range(num_trials):
        params['seed'] = start_seed + t + start_index
        cmd = ['python -m dcd_isaac_tpu.train']
        trial_idx = t + start_index
        for k, v in params.items():
            if k == 'xpid':
                v = f'{v}_{trial_idx}'
            cmd.append(f'--{k}={v}')
        cmds.append(separator.join(cmd))
    return cmds


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--json', type=str, required=True)
    p.add_argument('--num_trials', type=int, default=1)
    p.add_argument('--start_index', type=int, default=0)
    p.add_argument('--newlines', action='store_true')
    p.add_argument('--xpid_prefix', type=str, default='')
    args = p.parse_args()

    with open(os.path.expanduser(args.json)) as f:
        grid = json.load(f)['grid']
    all_params = generate_all_params_for_grid(grid, defaults={'seed': 1})
    for params in all_params:
        for cmd in generate_train_cmds(
                params, num_trials=args.num_trials,
                start_index=args.start_index, newlines=args.newlines,
                xpid_prefix=args.xpid_prefix):
            print(cmd)
            print()


if __name__ == '__main__':
    main()
