#!/bin/bash
# VERDICT r4 #7: measure the train/eval CLI cold start with the persistent
# compile cache ON vs OFF — one controlled pair per CLI, on-chip, same tiny
# synthetic workload. Run from the repo root with the chip otherwise idle:
#
#   PYTHONPATH=/root/.axon_site:. bash tools/coldstart_cli.sh
#
# Protocol per CLI: (1) cache ON, populate (unmeasured arm unless the cache
# is already warm); (2) cache ON, warm (the measured cache-hit arm);
# (3) cache OFF (the fresh-compile arm). Every arm is a FRESH process.
# Interpretation caveat from PERF.md "Cold start": first-exec relay staging
# is a per-process draw measured anywhere from 0.8 s to 530 s in r4-r5 on
# BOTH fresh-compiled and cache-deserialized executables — single pairs
# bound the compile-time difference, not the staging lottery.
set -u
cd "$(dirname "$0")/.."
ROOT=$(mktemp -d /tmp/coldstart_ds.XXXX)
EVAL_ARGS="--preset tiny --synthetic --dataset-root $ROOT --max-images 4"
TRAIN_ARGS="--preset tiny --synthetic --dataset-root $ROOT --steps 10 --no-final-eval --set train.warmup_steps=0 --set train.checkpoint_every=1000000"

run() { # name, env, module, args
  local name=$1 env=$2 mod=$3 args=$4
  local t0=$(date +%s.%N)
  env $env python -m "$mod" $args > /tmp/coldstart_$name.log 2>&1
  local rc=$?
  local t1=$(date +%s.%N)
  echo "$name: $(echo "$t1 $t0" | awk '{printf "%.1f", $1-$2}')s rc=$rc"
}

echo "== cli.eval =="
run eval_cache_populate  "MPNET_COMPILE_CACHE="    multipathnet_tpu.cli.eval "$EVAL_ARGS"
run eval_cache_warm      "MPNET_COMPILE_CACHE="    multipathnet_tpu.cli.eval "$EVAL_ARGS"
run eval_cache_off       "MPNET_COMPILE_CACHE=off" multipathnet_tpu.cli.eval "$EVAL_ARGS"
echo "== cli.train =="
run train_cache_populate "MPNET_COMPILE_CACHE="    multipathnet_tpu.cli.train "$TRAIN_ARGS"
run train_cache_warm     "MPNET_COMPILE_CACHE="    multipathnet_tpu.cli.train "$TRAIN_ARGS"
run train_cache_off      "MPNET_COMPILE_CACHE=off" multipathnet_tpu.cli.train "$TRAIN_ARGS"
