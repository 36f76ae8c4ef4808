"""Summarize a run's logs.csv: return/solved-rate trajectory + throughput.

    python tools/summarize_run.py results/runs/r5_walker_accel_s1 [--every 10]

Prints a compact table of update, mean return, sps, and every solved_rate
column present, sampling rows evenly — the source for RESULTS.md curve
tables.
"""
import argparse
import csv
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('run_dir')
    ap.add_argument('--every', type=int, default=0,
                    help='print every Nth row (default: ~15 rows)')
    cli = ap.parse_args()
    path = os.path.join(cli.run_dir, 'logs.csv')
    rows = list(csv.DictReader(open(path)))
    if not rows:
        print('no rows'); return
    solved_cols = sorted(
        {k for r in rows for k, v in r.items()
         if k.startswith('solved_rate:') and v})
    step = cli.every or max(1, len(rows) // 15)
    hdr = ['update', 'ret', 'sps', 'grad_upd'] + [
        c.split(':')[1].replace('BipedalWalker', 'BW')
         .replace('MultiGrid-', '').replace('-v0', '').replace('-v3', '')
        for c in solved_cols]
    print('  '.join(f'{h:>14}' for h in hdr))

    def fmt(r):
        def g(k, d='-'):
            v = r.get(k, '')
            try:
                return f'{float(v):.2f}'
            except (TypeError, ValueError):
                return d
        cells = [str(int(float(r.get('total_updates', 0)))),
                 g('mean_agent_return'), g('sps'),
                 str(int(float(r['total_student_grad_updates'])))
                 if r.get('total_student_grad_updates') else '-']
        cells += [g(c) for c in solved_cols]
        return '  '.join(f'{c:>14}' for c in cells)

    picks = set(range(0, len(rows), step)) | {len(rows) - 1}
    # always include rows carrying eval columns
    picks |= {i for i, r in enumerate(rows)
              if any(r.get(c) for c in solved_cols)}
    for i in sorted(picks):
        print(fmt(rows[i]))


if __name__ == '__main__':
    main()
