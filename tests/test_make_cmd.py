"""make_cmd.py: every vendored grid config must generate commands that the
training CLI parses (regression: the ACCEL configs crashed xpid naming on
missing staleness_coef — grid JSONs don't pin every flag the canonical
xpid references; defaults come from arguments.py)."""

import glob
import os
import shlex
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'train_scripts'))

from make_cmd import generate_all_params_for_grid, generate_train_cmds  # noqa: E402

from dcd_isaac_tpu.arguments import parser as train_parser  # noqa: E402

CONFIGS = sorted(glob.glob(
    os.path.join(REPO, 'train_scripts', 'grid_configs', '**', '*.json'),
    recursive=True))


def test_all_grid_configs_generate_parseable_commands():
    import json
    assert len(CONFIGS) >= 21, CONFIGS
    for path in CONFIGS:
        with open(path) as f:
            grid = json.load(f)['grid']
        for params in generate_all_params_for_grid(grid, {'seed': 1}):
            cmds = generate_train_cmds(dict(params), num_trials=1)
            assert len(cmds) == 1
            argv = shlex.split(cmds[0])
            assert argv[:3] == ['python', '-m', 'dcd_isaac_tpu.train']
            args = train_parser.parse_args(argv[3:])
            assert args.xpid.startswith('ued-'), (path, args.xpid)
            assert args.env_name == params['env_name']


def test_xpid_matches_reference_scheme():
    """The canonical xpid for the 25-block PAIRED config must follow the
    reference naming so runs are comparable by name."""
    import json
    path = os.path.join(REPO, 'train_scripts', 'grid_configs', 'minigrid',
                        '25_blocks', 'mg_25b_paired.json')
    with open(path) as f:
        grid = json.load(f)['grid']
    params = generate_all_params_for_grid(grid, {'seed': 1})[0]
    cmd = generate_train_cmds(dict(params), num_trials=1)[0]
    xpid = [a for a in shlex.split(cmd) if a.startswith('--xpid=')][0]
    assert '-paired' in xpid and 'lstm256' in xpid and '-lr' in xpid
