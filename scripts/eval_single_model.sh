#!/bin/bash
# Run one model over the benchmark battery
# (reference: mantis/benchmark/eval_single_model.sh).
set -e
cd "$(dirname "$0")/.."
MODEL=${1:?usage: eval_single_model.sh <model_name> [results_dir]}
RESULTS=${2:-results}
python -m mantis_tpu.benchmark.eval --model_name "$MODEL" \
    --dataset_path TIGER-Lab/Mantis-eval --dataset_name mantis_eval \
    --results_dir "$RESULTS"
python -m mantis_tpu.benchmark.eval --model_name "$MODEL" \
    --dataset_path TIGER-Lab/NLVR2 --dataset_name nlvr2 \
    --results_dir "$RESULTS"
[ -n "$QBENCH2_JSON" ] && python -m mantis_tpu.benchmark.eval \
    --model_name "$MODEL" --dataset_path "$QBENCH2_JSON" \
    --dataset_name q-bench2-a1-pair-dev --results_dir "$RESULTS"
# BLINK: convert once with benchmark/prepare_blink.py, then point
# BLINK_JSON at the produced val.json (reference ran an external fork)
[ -n "$BLINK_JSON" ] && python -m mantis_tpu.benchmark.eval \
    --model_name "$MODEL" --dataset_path "$BLINK_JSON" \
    --dataset_name blink --results_dir "$RESULTS"
[ -n "$MVBENCH_DIR" ] && python -m mantis_tpu.benchmark.eval_on_mvbench \
    --model_name "$MODEL" --json_dir "$MVBENCH_DIR/json" \
    --video_dir "$MVBENCH_DIR/video" --num_frames "${NUM_FRAMES:-8}" \
    --results_dir "$RESULTS/mvbench"
python -m mantis_tpu.benchmark.print_leaderboard --results_dir "$RESULTS"
