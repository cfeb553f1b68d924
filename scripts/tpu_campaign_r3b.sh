#!/usr/bin/env bash
# Round-3 campaign, continuation: legs the box restart killed
# (ab_attnxla64, ab_outaggv, ab_eval_k_tin64, profile_tin64) plus the
# new per-block rematerialization A/Bs. Same harness as tpu_campaign.sh.
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

run ab_remat_tin64 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_REMAT=dots --batch 128 --k 8 --legs 6 --steps 48

run ab_rematn_tin64 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_REMAT=nothing --batch 128 --k 8 --legs 6 --steps 48

run ab_attnxla64_tin64 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_ATTN_XLA_N=64 --batch 128 --k 8 --legs 6 --steps 48

run ab_outaggv_tin64 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_OUTAGG=2 --batch 128 --k 8 --legs 6 --steps 48

run ab_remat_flagship 2400 python scripts/ab_env.py \
  --config configs/cifar100_model_a_7m.yaml \
  --env OUTGRIDVIT_REMAT=dots --batch 128 --k 8 --legs 6 --steps 96

run ab_eval_k_tin64 2400 python scripts/ab_eval_k.py \
  --config configs/tinyimagenet200_model_a.yaml --ks 1 8 --reps 3 \
  --batch-size 256 --num-samples 10240

runtxt profile_tin64 2400 python scripts/profile_step.py \
  --config configs/tinyimagenet200_model_a.yaml --batch 128 --top 30

echo "campaign r3b done" >&2
