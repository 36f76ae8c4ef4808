"""CarRacing F1 benchmark plot (reference results/plot_f1.py).

Per-track mean test return per method (bars, mean ± std across training
seeds), plus an overall-mean summary panel and an optional literature
threshold line.  Reads both CSV dialects (see plot_eval_bars.read_result_csv)
— reference F1 CSVs carry seeds × episodes columns (group with
--num_test_episodes, as the reference does), this repo's eval.py output
carries mean/std directly.

Usage:
  python tools/plot_f1.py -r /root/reference/results/car_racing_f1 \
      -f f1-dr-5M_steps.csv -f f1-robust_plr-5M_steps.csv \
      -l DR -l "PLR Robust" --num_test_episodes 10 \
      --threshold 477.71 --threshold_label 'Tang et al, 2020' \
      --output results/f1_eval.png
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from plot_eval_bars import GRID, INK, PALETTE, SURFACE, _short_env  # noqa: E402


def read_f1_csv(path: str, num_test_episodes: int):
    """→ {env: (mean, std across seeds)} for test_returns rows."""
    with open(path) as f:
        rows = list(csv.reader(f))
    header = rows[0]
    has_mean = 'mean' in header
    out = {}
    for row in rows[1:]:
        if not row or not row[0].startswith('test_returns:'):
            continue
        env = _short_env(row[0], 'test_returns')
        if has_mean:
            out[env] = (float(row[header.index('mean')]),
                        float(row[header.index('std')])
                        if 'std' in header else 0.0)
        else:
            vals = np.array([float(v) for v in row[1:] if v != ''])
            k = num_test_episodes if len(vals) % num_test_episodes == 0 \
                else 1
            per_seed = vals.reshape(-1, k).mean(1)
            out[env] = (per_seed.mean(), per_seed.std())
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('-r', '--result_path', action='append', required=True)
    p.add_argument('-f', '--files', action='append', required=True)
    p.add_argument('-l', '--labels', action='append', default=None)
    p.add_argument('--num_test_episodes', type=int, default=10)
    p.add_argument('--threshold', type=float, default=None)
    p.add_argument('--threshold_label', default=None)
    p.add_argument('--output', default='f1_eval.png')
    args = p.parse_args()

    labels = args.labels or [os.path.splitext(f)[0] for f in args.files]
    data = []
    for fname in args.files:
        path = next((os.path.join(r, fname) for r in args.result_path
                     if os.path.exists(os.path.join(r, fname))), None)
        if path is None:
            raise SystemExit(f'{fname} not in {args.result_path}')
        data.append(read_f1_csv(path, args.num_test_episodes))
    tracks = sorted(set.intersection(*(set(d) for d in data)))
    if not tracks:
        raise SystemExit('no common tracks')

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    M = len(data)
    x = np.arange(len(tracks))
    width = min(0.8 / M, 0.22)
    fig, (ax, ax2) = plt.subplots(
        1, 2, figsize=(max(8, 0.65 * len(tracks) + 3), 3.8),
        gridspec_kw={'width_ratios': [len(tracks), 2.2]}, facecolor=SURFACE)
    for a in (ax, ax2):
        a.set_facecolor(SURFACE)
        a.yaxis.grid(True, color=GRID, lw=0.6)
        a.set_axisbelow(True)
        for s in ('top', 'right'):
            a.spines[s].set_visible(False)
        for s in ('left', 'bottom'):
            a.spines[s].set_color(GRID)
        a.tick_params(colors=INK)

    for i, (d, lab) in enumerate(zip(data, labels)):
        means = [d[t][0] for t in tracks]
        stds = [d[t][1] for t in tracks]
        ax.bar(x + (i - (M - 1) / 2) * width, means, width * 0.92,
               yerr=stds, capsize=1.5, label=lab,
               color=PALETTE[i % len(PALETTE)],
               error_kw=dict(ecolor=INK, lw=0.7))
        # overall mean across tracks
        om = np.mean(means)
        ax2.bar([i], [om], 0.7, color=PALETTE[i % len(PALETTE)])
        ax2.text(i, om, f'{om:.0f}', ha='center', va='bottom',
                 fontsize=8, color=INK)

    if args.threshold is not None:
        for a in (ax, ax2):
            a.axhline(args.threshold, color=INK, lw=0.9, ls='--')
        if args.threshold_label:
            ax.text(0, args.threshold, ' ' + args.threshold_label,
                    va='bottom', fontsize=7, color=INK)

    ax.set_xticks(x)
    ax.set_xticklabels(tracks, rotation=40, ha='right', fontsize=7,
                       color=INK)
    ax.set_ylabel('test return', color=INK)
    if M >= 2:
        ax.legend(frameon=False, fontsize=8, ncol=min(M, 5))
    ax2.set_xticks(range(M))
    ax2.set_xticklabels(labels, rotation=40, ha='right', fontsize=7,
                        color=INK)
    ax2.set_title('mean over tracks', fontsize=9, color=INK)
    fig.tight_layout()
    fig.savefig(args.output, dpi=160)
    print(f'wrote {args.output}')


if __name__ == '__main__':
    main()
