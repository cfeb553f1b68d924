#!/usr/bin/env bash
# Round-3 campaign, leg 4: shape-keyed fused attention branch at the N=64
# stages (OUTGRIDVIT_FUSED_ATTN_N) + copy/reshape/convert drill-downs.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p outputs/campaign

run() { _run "$1.json" "$2" "${@:3}"; }
runtxt() { _run "$1.txt" "$2" "${@:3}"; }
_run() {
  local out="$1" t="$2"; shift 2
  echo "=== $out ===" >&2
  timeout "$t" "$@" >"outputs/campaign/$out" 2>"outputs/campaign/${out%.*}.log"
  echo "--- $out rc=$? ---" >&2
  tail -c 400 "outputs/campaign/$out" >&2 || true
  echo >&2
}

run ab_fattn64_tin64 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_FUSED_ATTN_N=64 --batch 128 --k 8 --legs 6 --steps 48

run ab_fattn64_c64 2400 python scripts/ab_env.py \
  --config configs/cifar100_64_model_a.yaml \
  --env OUTGRIDVIT_FUSED_ATTN_N=64 --batch 128 --k 8 --legs 6 --steps 48

runtxt probe_transfer 1200 python scripts/probe_transfer.py \
  --batch 256 --img 32 --batches 64 --reps 3

runtxt drill_tin64_copy 2400 python scripts/profile_step.py \
  --config configs/tinyimagenet200_model_a.yaml --batch 128 --top 40 \
  --kind copy,reshape,convert_reduce

runtxt drill_flag_copy 2400 python scripts/profile_step.py \
  --config configs/cifar100_model_a_7m.yaml --batch 128 --top 40 \
  --kind copy,reshape,convert_reduce

echo "campaign r3d done" >&2
