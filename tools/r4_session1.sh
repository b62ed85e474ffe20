#!/bin/bash
# Round-4 TPU measurement session 1: budget + W4A8 + fp8-KV + lm-head-fp4.
# Sequential (never two TPU processes), generous timeouts, line-buffered.
set -x
cd /root/repo
L=/tmp/r4s1
mkdir -p $L

echo "=== 1. bench.py quick suite (sanity + verify surface)"
timeout 900 python -u bench.py --verbose > $L/bench.log 2>&1

echo "=== 2. step budget 8L"
timeout 2400 python -u tools/step_budget.py --layers 8 > $L/budget.log 2>&1

echo "=== 3. w4a8 mid-m"
timeout 2400 python -u tools/w4a8_midm.py > $L/w4a8.log 2>&1

echo "=== 4a. proxy baseline (engine operating point)"
timeout 1200 python -u tools/serve_bench.py --format nvfp4p2 \
  --kv-window 256 --seq 512 > $L/proxy_base.log 2>&1

echo "=== 4b. proxy + fp4 lm_head"
timeout 1200 python -u tools/serve_bench.py --format nvfp4p2 \
  --kv-window 256 --seq 512 --lm-head-fp4 > $L/proxy_head4.log 2>&1

echo "=== 5a. engine long-context bf16 KV (r3 comparison point)"
timeout 2400 python -u tools/serve_bench.py --engine --format nvfp4p2 \
  --seq 2048 --new-tokens 960 --decode-block 128 \
  > $L/eng_bf16.log 2>&1

echo "=== 5b. engine long-context fp8 KV (VERDICT #2)"
timeout 2400 python -u tools/serve_bench.py --engine --format nvfp4p2 \
  --seq 2048 --new-tokens 960 --decode-block 128 --kv-dtype fp8 \
  > $L/eng_fp8.log 2>&1

echo "=== 5c. engine long-context fp8 KV + fp4 head"
timeout 2400 python -u tools/serve_bench.py --engine --format nvfp4p2 \
  --seq 2048 --new-tokens 960 --decode-block 128 --kv-dtype fp8 \
  --lm-head-fp4 > $L/eng_fp8_head4.log 2>&1

echo "=== done"; grep -H . $L/*.log | tail -5
