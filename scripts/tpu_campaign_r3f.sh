#!/usr/bin/env bash
# Round-3 campaign, leg 6: post-fattn re-checks (the schedule changed) and
# branch-kernel VMEM budget sweep on TIN-64; flagship eval-K retry.
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

run ab_bbwd6144_tin64 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_BRANCH_BWD_KIB=6144 --batch 128 --k 8 --legs 6 --steps 48

run ab_bfwd8192_tin64 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_BRANCH_FWD_KIB=8192 --batch 128 --k 8 --legs 6 --steps 48

run ab_outagg_tin64_post 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_OUTAGG=1 --batch 128 --k 8 --legs 6 --steps 48

run ab_pack2_tin64_post 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_ATTN_PACK=2 --batch 128 --k 8 --legs 6 --steps 48

run ab_eval_k_flag_retry 2400 python scripts/ab_eval_k.py \
  --config configs/cifar100_model_a_7m.yaml --ks 1 8 --reps 5 \
  --batch-size 256 --num-samples 10240

echo "campaign r3f done" >&2
