#!/usr/bin/env bash
# Round-3 campaign, leg 7: branch-kernel bwd-budget knee + pack2 combo.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p outputs/campaign

run() { _run "$1.json" "$2" "${@:3}"; }
_run() {
  local out="$1" t="$2"; shift 2
  echo "=== $out ===" >&2
  timeout "$t" "$@" >"outputs/campaign/$out" 2>"outputs/campaign/${out%.*}.log"
  echo "--- $out rc=$? ---" >&2
  tail -c 400 "outputs/campaign/$out" >&2 || true
  echo >&2
}

run ab_bbwd4096_tin64 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_BRANCH_BWD_KIB=4096 --batch 128 --k 8 --legs 6 --steps 48

run ab_bbwd8192_tin64 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_BRANCH_BWD_KIB=8192 --batch 128 --k 8 --legs 6 --steps 48

run ab_combo_tin64 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_BRANCH_BWD_KIB=6144,OUTGRIDVIT_ATTN_PACK=2 \
  --batch 128 --k 8 --legs 6 --steps 48

run ab_bbwd6144_c64 2400 python scripts/ab_env.py \
  --config configs/cifar100_64_model_a.yaml \
  --env OUTGRIDVIT_BRANCH_BWD_KIB=6144 --batch 128 --k 8 --legs 6 --steps 48

echo "campaign r3g done" >&2
