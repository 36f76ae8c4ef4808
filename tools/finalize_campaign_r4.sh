#!/bin/bash
# Round-4 post-campaign figures (run AFTER tools/run_campaign_r4.sh).
# The per-run 100-episode benchmark evals are already produced by the
# campaign script itself (results/maze-r4_accel_60b_s.csv has one column
# per seed); this renders the comparison figures.
set -u
RUNS=${1:-/root/repo/results/runs}
OUT=/root/repo/results
mkdir -p "$OUT/figures"

python tools/plot_curves.py "$RUNS/r4_accel_60b_s1/logs.csv" --smooth 3 \
  --title "60-block ACCEL seed 1, 20k updates, N=32 T=256 (bf16)" \
  --output "$OUT/figures/r4_accel_curves.png" || true
python tools/plot_curves.py "$RUNS/r4_robust_plr_25b_s1/logs.csv" --smooth 3 \
  --title "25-block PLR-perp, full 250M-step budget" \
  --output "$OUT/figures/r4_robust_plr_curves.png" || true

if [ -f "$OUT/maze-r4_accel_60b_s.csv" ]; then
  python tools/plot_eval_bars.py \
    -r /root/reference/results/minigrid_ood -r "$OUT" \
    -f mg_60_blocks-accel_20k_updates.csv -f maze-r4_accel_60b_s.csv \
    -l "reference ACCEL (5 seeds, 20k)" \
    -l "dcd_isaac_tpu ACCEL (3 seeds, 20k)" \
    --row_prefix solved_rate \
    --output "$OUT/figures/r4_accel_vs_reference.png" || true
fi
if [ -f "$OUT/maze-r4_robust_plr_25b_s.csv" ]; then
  python tools/plot_eval_bars.py \
    -r /root/reference/results/minigrid_ood -r "$OUT" \
    -f mg_25_blocks-robust_plr-250M_steps.csv \
    -f maze-r4_robust_plr_25b_s.csv \
    -l "reference PLR-perp (10 seeds, 250M)" \
    -l "dcd_isaac_tpu PLR-perp (seed 1, 250M)" \
    --row_prefix solved_rate \
    --output "$OUT/figures/r4_robust_plr_vs_reference.png" || true
fi
if [ -f "$OUT/bipedal-r4_walker_accel_s.csv" ]; then
  python tools/plot_eval_bars.py \
    -r /root/reference/results/bipedal -r "$OUT" \
    -f bipedal8d-accel_20k-updates.csv -f bipedal-r4_walker_accel_s.csv \
    -l "reference bipedal ACCEL (20k)" \
    -l "dcd_isaac_tpu bipedal ACCEL (slice)" \
    --row_prefix solved_rate \
    --output "$OUT/figures/r4_walker_vs_reference.png" || true
fi
if [ -f "$OUT/f1-r4_cr_robust_plr_s.csv" ]; then
  python tools/plot_eval_bars.py \
    -r /root/reference/results/car_racing_f1 -r "$OUT" \
    -f f1-robust_plr-5M_steps.csv -f f1-r4_cr_robust_plr_s.csv \
    -l "reference F1 PLR-perp (5M)" \
    -l "dcd_isaac_tpu F1 PLR-perp (5.5M)" \
    --row_prefix test_returns \
    --output "$OUT/figures/r4_f1_vs_reference.png" || true
fi
ls "$OUT"/*.csv "$OUT"/figures/r4_*.png 2>/dev/null