"""Zero-shot benchmark bar plots (reference results/plot_eval_bars.py).

Reads eval-result CSVs in EITHER dialect —
  reference: ``metric,0,1,…``            (one column per training seed)
  this repo: ``metric,<xpid…>,mean,std`` (eval.py output)
— and renders a grouped bar chart of mean ± std per (env × method), so a
run from this framework can be placed directly beside the reference's
published per-seed CSVs (results/minigrid_ood/*.csv etc.).

Usage:
  python tools/plot_eval_bars.py \
      -r /root/reference/results/minigrid_ood -r results \
      -f mg_60_blocks-accel_20k_updates.csv -f my_run_eval.csv \
      -l "reference ACCEL" -l "dcd_isaac_tpu ACCEL" \
      --row_prefix solved_rate --output results/eval_bars.png

Chart conventions: grouped bars (magnitude comparison across categories),
one axis, fixed categorical color order (validated palette — see
tools/_viz_palette), recessive grid, legend for ≥2 series.
"""

from __future__ import annotations

import argparse
import csv
import os
from typing import Dict, List, Optional

import numpy as np

# Validated categorical palette (fixed assignment order, never cycled;
# passes CVD-separation and contrast gates on the light surface).
PALETTE = ['#2a78d6', '#eb6834', '#1baf7a', '#eda100',
           '#e87ba4', '#008300', '#4a3aa7', '#e34948']
SURFACE = '#fcfcfb'
INK = '#333330'
GRID = '#e5e4df'


def read_result_csv(path: str) -> Dict[str, Dict[str, float]]:
    """→ {metric_row: {'mean': m, 'std': s, 'n': seeds}} for both dialects."""
    out = {}
    with open(path) as f:
        rows = list(csv.reader(f))
    header = rows[0]
    has_mean = 'mean' in header
    for row in rows[1:]:
        if not row or not row[0]:
            continue
        name = row[0]
        if has_mean:
            m = float(row[header.index('mean')])
            s = float(row[header.index('std')]) if 'std' in header else 0.0
            n = max(len(header) - 3, 1)
        else:
            vals = np.array([float(v) for v in row[1:] if v != ''])
            m, s, n = vals.mean(), vals.std(), len(vals)
        out[name] = {'mean': m, 'std': s, 'n': n}
    return out


def _short_env(metric: str, prefix: str) -> str:
    name = metric[len(prefix) + 1:]
    for pre in ('MultiGrid-', 'MiniGrid-', 'BipedalWalker-', 'CarRacingF1-',
                'CarRacing-'):
        if name.startswith(pre):
            name = name[len(pre):]
    return name[:-3] if name.endswith('-v0') else name


def collect(result_paths: List[str], files: List[str], row_prefix: str,
            metrics: Optional[List[str]] = None):
    """→ (env_names, per-file {env: (mean, std)})."""
    data = []
    for fname in files:
        path = next((os.path.join(r, fname) for r in result_paths
                     if os.path.exists(os.path.join(r, fname))), None)
        if path is None:
            raise FileNotFoundError(f'{fname} not in {result_paths}')
        rows = read_result_csv(path)
        d = {}
        for k, v in rows.items():
            if k.startswith(row_prefix + ':'):
                d[_short_env(k, row_prefix)] = (v['mean'], v['std'])
        data.append(d)
    envs = [e for e in data[0] if all(e in d for d in data)]
    if metrics:
        short = [_short_env(f'{row_prefix}:{m}', row_prefix) for m in metrics]
        envs = [e for e in short if e in envs]
    return envs, data


def plot_bars(envs, data, labels, row_prefix, output, title=None):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    M = len(data)
    x = np.arange(len(envs))
    width = min(0.8 / M, 0.25)
    fig, ax = plt.subplots(
        figsize=(max(6, 1.1 * len(envs) + 2), 3.6), facecolor=SURFACE)
    ax.set_facecolor(SURFACE)
    for i, (d, lab) in enumerate(zip(data, labels)):
        means = [d[e][0] for e in envs]
        stds = [d[e][1] for e in envs]
        ax.bar(x + (i - (M - 1) / 2) * width, means, width * 0.92,
               yerr=stds, capsize=2, label=lab,
               color=PALETTE[i % len(PALETTE)],
               error_kw=dict(ecolor=INK, lw=0.8))
    ax.set_xticks(x)
    ax.set_xticklabels(envs, rotation=30, ha='right', fontsize=8, color=INK)
    ax.set_ylabel(row_prefix.replace('_', ' '), color=INK)
    if row_prefix == 'solved_rate':
        ax.set_ylim(0, 1.05)
    ax.yaxis.grid(True, color=GRID, lw=0.6)
    ax.set_axisbelow(True)
    for s in ('top', 'right'):
        ax.spines[s].set_visible(False)
    for s in ('left', 'bottom'):
        ax.spines[s].set_color(GRID)
    ax.tick_params(colors=INK)
    if M >= 2:
        ax.legend(frameon=False, fontsize=8, ncol=min(M, 4),
                  loc='lower center', bbox_to_anchor=(0.5, 1.01))
    if title:
        ax.set_title(title, fontsize=10, color=INK, pad=26)
    fig.tight_layout()
    fig.savefig(output, dpi=160)
    print(f'wrote {output}')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('-r', '--result_path', action='append', required=True)
    p.add_argument('-f', '--files', action='append', required=True)
    p.add_argument('-l', '--labels', action='append', default=None)
    p.add_argument('--row_prefix', default='solved_rate')
    p.add_argument('--metrics', nargs='*', default=None)
    p.add_argument('--title', default=None)
    p.add_argument('--output', default='eval_bars.png')
    args = p.parse_args()

    labels = args.labels or [os.path.splitext(f)[0] for f in args.files]
    envs, data = collect(args.result_path, args.files, args.row_prefix,
                         args.metrics)
    if not envs:
        raise SystemExit('no common metric rows across the given files')
    plot_bars(envs, data, labels, args.row_prefix, args.output, args.title)


if __name__ == '__main__':
    main()
