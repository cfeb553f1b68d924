#!/usr/bin/env bash
# Round-3 campaign, continuation 2: the legs the 16:36 box restart killed.
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

run ab_rematn_tin64 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_REMAT=nothing --batch 128 --k 8 --legs 6 --steps 48

run ab_remat_flagship 2400 python scripts/ab_env.py \
  --config configs/cifar100_model_a_7m.yaml \
  --env OUTGRIDVIT_REMAT=dots --batch 128 --k 8 --legs 6 --steps 96

run ab_rematn_flagship 2400 python scripts/ab_env.py \
  --config configs/cifar100_model_a_7m.yaml \
  --env OUTGRIDVIT_REMAT=nothing --batch 128 --k 8 --legs 6 --steps 96

echo "campaign r3c done" >&2
