#!/usr/bin/env bash
# Round-3 TPU measurement campaign — run when the device is reachable.
# One TPU process at a time (single chip); every step bounded by timeout;
# results land in outputs/campaign/*.json for docs/PERFORMANCE.md.
#
# Experiments (VERDICT r2 "Next round" items 1/2/6):
#   1. canonical flagship number (bench.py, default env)
#   2. fused dw-conv backward kernel A/B (same-process alternating legs)
#      on the 64px TIN config and the 32px flagship
#   3. grid-pack P=2 at the 64px N=64 stages
#   4. eval superstep k=1 vs k=8 (same-process alternating epochs)
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p outputs/campaign

run() { # run <name> <timeout_s> <cmd...>  (stdout is one JSON line)
  _run "$1.json" "$2" "${@:3}"
}

runtxt() { # runtxt <name> <timeout_s> <cmd...>  (human-readable tables)
  _run "$1.txt" "$2" "${@:3}"
}

_run() {
  local out="$1" t="$2"; shift 2
  echo "=== $out ===" >&2
  timeout "$t" "$@" >"outputs/campaign/$out" 2>"outputs/campaign/${out%.*}.log"
  echo "--- $out rc=$? ---" >&2
  tail -c 400 "outputs/campaign/$out" >&2 || true
  echo >&2
}

run bench_default 1800 python bench.py

# batch-size re-sweep with the current kernel set (the r2 sweep predates
# the transposed kernels; VERDICT r2 item 2)
run sweep_flagship 3000 python scripts/bench_config.py \
  --config configs/cifar100_model_a_7m.yaml --batch 64 128 192 256 --k 8 \
  --steps 96

run sweep_tin64 3000 python scripts/bench_config.py \
  --config configs/tinyimagenet200_model_a.yaml --batch 96 128 192 256 \
  --k 8 --steps 48

run ab_dwbwd_tin64 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_DW_BWD=1 --batch 128 --k 8 --legs 6 --steps 48

run ab_dwbwd_flagship 2400 python scripts/ab_env.py \
  --config configs/cifar100_model_a_7m.yaml \
  --env OUTGRIDVIT_DW_BWD=1 --batch 128 --k 8 --legs 6 --steps 96

run ab_pack2_tin64 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_ATTN_PACK=2 --batch 128 --k 8 --legs 6 --steps 48

run ab_outagg_tin64 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_OUTAGG=1 --batch 128 --k 8 --legs 6 --steps 48

run ab_outagg_flagship 2400 python scripts/ab_env.py \
  --config configs/cifar100_model_a_7m.yaml \
  --env OUTGRIDVIT_OUTAGG=1 --batch 128 --k 8 --legs 6 --steps 96

run ab_attnxla64_tin64 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_ATTN_XLA_N=64 --batch 128 --k 8 --legs 6 --steps 48

run ab_outaggv_tin64 2400 python scripts/ab_env.py \
  --config configs/tinyimagenet200_model_a.yaml \
  --env OUTGRIDVIT_OUTAGG=2 --batch 128 --k 8 --legs 6 --steps 48

run ab_eval_k_flagship 2400 python scripts/ab_eval_k.py \
  --config configs/cifar100_model_a_7m.yaml --ks 1 8 --reps 3 \
  --batch-size 256 --num-samples 20480

run ab_eval_k_tin64 2400 python scripts/ab_eval_k.py \
  --config configs/tinyimagenet200_model_a.yaml --ks 1 8 --reps 3 \
  --batch-size 256 --num-samples 10240

# per-component profiles at both image sizes with the round-3 winners OFF
# (the baseline attribution the next attack starts from) and, for TIN-64,
# with the two candidate kernels ON
runtxt profile_tin64 2400 python scripts/profile_step.py \
  --config configs/tinyimagenet200_model_a.yaml --batch 128 --top 30

runtxt profile_tin64_kernels 2400 env OUTGRIDVIT_DW_BWD=1 OUTGRIDVIT_OUTAGG=1 \
  python scripts/profile_step.py \
  --config configs/tinyimagenet200_model_a.yaml --batch 128 --top 30

runtxt profile_flagship 2400 python scripts/profile_step.py \
  --batch 128 --top 30

echo "campaign done; results in outputs/campaign/" >&2
