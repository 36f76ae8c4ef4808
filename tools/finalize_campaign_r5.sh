#!/bin/bash
# Round-5 post-campaign figures (run AFTER tools/run_campaign_r5.sh stages).
set -u
RUNS=${1:-/root/repo/results/runs}
OUT=/root/repo/results
mkdir -p "$OUT/figures"

# Walker: first trained campaign (r4 was hard-blocked at ~0.4% budget)
python tools/plot_curves.py "$RUNS/r5_walker_accel_s1/logs.csv" --smooth 3 \
  --title "BipedalWalker ACCEL seed 1 (r5; fixed seed codec + K=5 dispatch)" \
  --output "$OUT/figures/r5_walker_curves.png" || true
if [ -f "$OUT/bipedal-r5_walker_accel_s.csv" ]; then
  python tools/plot_eval_bars.py \
    -r /root/reference/results/bipedal -r "$OUT" \
    -f bipedal8d-accel_20k-updates.csv -f bipedal-r5_walker_accel_s.csv \
    -l "reference ACCEL (10 seeds, 20k grad updates)" \
    -l "dcd_isaac_tpu ACCEL (seed 1, partial budget)" \
    --row_prefix solved_rate \
    --output "$OUT/figures/r5_walker_vs_reference.png" || true
fi

# Flagship PAIRED: protagonist/antagonist returns + teacher regret +
# zero-shot solved rates (VERDICT r4 item 5's curve figure)
for S in 1 2; do
  python tools/plot_curves.py "$RUNS/r5_paired_25b_s$S/logs.csv" --smooth 3 \
    --metrics mean_agent_return mean_adversary_agent_return \
              mean_env_return "solved_rate:*" \
    --title "25-block PAIRED seed $S, 250M steps" \
    --output "$OUT/figures/r5_paired_curves_s$S.png" || true
done
if [ -f "$OUT/maze-r5_paired_25b_s.csv" ]; then
  python tools/plot_eval_bars.py \
    -r /root/reference/results/minigrid_ood -r "$OUT" \
    -f mg_25_blocks-paired-250M_steps.csv -f maze-r5_paired_25b_s.csv \
    -l "reference PAIRED (10 seeds, 250M)" \
    -l "dcd_isaac_tpu PAIRED (250M)" \
    --row_prefix solved_rate \
    --output "$OUT/figures/r5_paired_vs_reference.png" || true
fi

# ACCEL at the true 20k-grad-update budget
if [ -f "$OUT/accel_20kgu/maze-r4_accel_60b_s.csv" ]; then
  python tools/plot_eval_bars.py \
    -r /root/reference/results/minigrid_ood -r "$OUT/accel_20kgu" \
    -f mg_60_blocks-accel_20k_updates.csv -f maze-r4_accel_60b_s.csv \
    -l "reference ACCEL (5 seeds, 20k grad updates)" \
    -l "dcd_isaac_tpu ACCEL (3 seeds, 20k grad updates)" \
    --row_prefix solved_rate \
    --output "$OUT/figures/r5_accel_20kgu_vs_reference.png" || true
fi

# PLR-perp with 3 seeds (r4 s1 aliased + r5 s2,s3)
if [ -f "$OUT/maze-r5_robust_plr_25b_s.csv" ]; then
  python tools/plot_eval_bars.py \
    -r /root/reference/results/minigrid_ood -r "$OUT" \
    -f mg_25_blocks-robust_plr-250M_steps.csv \
    -f maze-r5_robust_plr_25b_s.csv \
    -l "reference PLR-perp (10 seeds, 250M)" \
    -l "dcd_isaac_tpu PLR-perp (3 seeds, 250M)" \
    --row_prefix solved_rate \
    --output "$OUT/figures/r5_robust_plr_vs_reference.png" || true
fi

# CarRacing 100-episode re-eval vs reference protocol
if [ -f "$OUT/cr_100ep/f1-r4_cr_robust_plr_s.csv" ]; then
  python tools/plot_f1.py || true
fi
echo "figures under $OUT/figures/"
