"""Training-curve plots from a run's logs.csv.

Companion to plot_eval_bars.py for the in-training signal: mean agent
return and per-env zero-shot solved rates over update count (the
Evaluator logs them every --test_interval updates).

Usage:
  python tools/plot_curves.py results/runs/r3_accel_60b_s1/logs.csv \
      --metrics mean_agent_return "solved_rate:*" \
      --output results/figures/accel_curves.png
"""

from __future__ import annotations

import argparse
import csv
import fnmatch
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from plot_eval_bars import GRID, INK, PALETTE, SURFACE  # noqa: E402


def load_series(path, patterns):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    fields = rows[0].keys()
    cols = []
    for pat in patterns:
        hit = [c for c in fields if fnmatch.fnmatch(c, pat)]
        cols.extend(c for c in hit if c not in cols)
    out = {}
    x = np.array([float(r.get('total_updates') or r.get('_tick') or i)
                  for i, r in enumerate(rows)])
    for c in cols:
        y = np.array([float(r[c]) if r.get(c) not in (None, '', 'None')
                      else np.nan for r in rows])
        if np.isfinite(y).sum() >= 2:
            out[c] = (x[np.isfinite(y)], y[np.isfinite(y)])
    return out


def _short(c):
    c = c.replace('solved_rate:', 'solved: ').replace(
        'test_returns:', 'return: ')
    return (c.replace('MultiGrid-', '').replace('BipedalWalker-', '')
            .replace('-v0', ''))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('logs', help='path to logs.csv')
    p.add_argument('--metrics', nargs='+',
                   default=['mean_agent_return', 'solved_rate:*'])
    p.add_argument('--smooth', type=int, default=1,
                   help='rolling-mean window (rows)')
    p.add_argument('--title', default=None)
    p.add_argument('--output', default='curves.png')
    args = p.parse_args()

    series = load_series(args.logs, args.metrics)
    if not series:
        raise SystemExit('no matching metric columns with data')

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7.2, 3.6), facecolor=SURFACE)
    ax.set_facecolor(SURFACE)
    for i, (name, (x, y)) in enumerate(series.items()):
        if args.smooth > 1 and len(y) > args.smooth:
            k = args.smooth
            y = np.convolve(y, np.ones(k) / k, mode='valid')
            x = x[k - 1:]
        ax.plot(x, y, lw=2, color=PALETTE[i % len(PALETTE)],
                label=_short(name))
    ax.set_xlabel('update', color=INK)
    ax.yaxis.grid(True, color=GRID, lw=0.6)
    ax.set_axisbelow(True)
    for s in ('top', 'right'):
        ax.spines[s].set_visible(False)
    for s in ('left', 'bottom'):
        ax.spines[s].set_color(GRID)
    ax.tick_params(colors=INK)
    if len(series) >= 2:
        ax.legend(frameon=False, fontsize=8,
                  loc='lower center', bbox_to_anchor=(0.5, 1.01),
                  ncol=min(len(series), 3))
    if args.title:
        ax.set_title(args.title, fontsize=10, color=INK, pad=30)
    fig.tight_layout()
    fig.savefig(args.output, dpi=160)
    print(f'wrote {args.output}')


if __name__ == '__main__':
    main()
