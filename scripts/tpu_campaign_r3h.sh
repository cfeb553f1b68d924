#!/usr/bin/env bash
# Round-3 campaign, leg 8 (final): t-kernel-family VMEM budget probes on
# the flagship — the same fixed-cost-amortization lever that won +2.7%/+3.1%
# for the branch kernel at 64px.
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

run ab_attnt14_flag 2400 python scripts/ab_env.py \
  --config configs/cifar100_model_a_7m.yaml \
  --env OUTGRIDVIT_ATTN_T_BWD_KIB=14336 --batch 128 --k 8 --legs 6 --steps 96

run ab_attnt6_flag 2400 python scripts/ab_env.py \
  --config configs/cifar100_model_a_7m.yaml \
  --env OUTGRIDVIT_ATTN_T_BWD_KIB=6144 --batch 128 --k 8 --legs 6 --steps 96

run ab_mlp8_flag 2400 python scripts/ab_env.py \
  --config configs/cifar100_model_a_7m.yaml \
  --env OUTGRIDVIT_MLP_BWD_KIB=8192 --batch 128 --k 8 --legs 6 --steps 96

echo "campaign r3h done" >&2
