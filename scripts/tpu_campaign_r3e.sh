#!/usr/bin/env bash
# Round-3 campaign, leg 5: re-measure with the fused-branch default ON,
# K-dispatch sweep, and post-fattn re-checks of earlier losers.
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

run sweep_tin64_fattn 2400 python scripts/bench_config.py \
  --config configs/tinyimagenet200_model_a.yaml --batch 96 128 192 256 --k 8

run sweep_c64_fattn 2400 python scripts/bench_config.py \
  --config configs/cifar100_64_model_a.yaml --batch 128 256 --k 8

run ksweep_flag 2400 python scripts/bench_config.py \
  --config configs/cifar100_model_a_7m.yaml --batch 128 --ks 8 16 32 --steps 192

run ksweep_tin64 2400 python scripts/bench_config.py \
  --config configs/tinyimagenet200_model_a.yaml --batch 128 --ks 8 16 --steps 64

run ab_dwbwd_tin64_post 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_DW_BWD=1 --batch 128 --k 8 --legs 6 --steps 48

run ab_fattnall_flag 2400 python scripts/ab_env.py \
  --config configs/cifar100_model_a_7m.yaml \
  --env OUTGRIDVIT_FUSED_ATTN=1 --batch 128 --k 8 --legs 6 --steps 96

run ab_mlprow_flag 2400 python scripts/ab_env.py \
  --config configs/cifar100_model_a_7m.yaml \
  --env OUTGRIDVIT_FUSED_MLP=r64 --batch 128 --k 8 --legs 6 --steps 96

run bench_fattn 1200 python bench.py

runtxt profile_tin64_fattn 2400 python scripts/profile_step.py \
  --config configs/tinyimagenet200_model_a.yaml --batch 128 --top 30

echo "campaign r3e done" >&2
