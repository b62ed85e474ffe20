#!/bin/bash
# Round-4 TPU session 2: fp8-KV engine (VERDICT #2), post-kv_append
# budget, W4A8 precompute, bench suite. Sequential.
set -x
cd /root/repo
L=/tmp/r4s2
mkdir -p $L

echo "=== 1. engine long-context fp8 KV (VERDICT #2, headed SWAR + kv_append)"
timeout 2400 python -u tools/serve_bench.py --engine --format nvfp4p2 \
  --seq 2048 --new-tokens 960 --decode-block 128 --kv-dtype fp8 \
  > $L/eng_fp8.log 2>&1

echo "=== 2. engine long-context fp8 KV + fp4 head"
timeout 2400 python -u tools/serve_bench.py --engine --format nvfp4p2 \
  --seq 2048 --new-tokens 960 --decode-block 128 --kv-dtype fp8 \
  --lm-head-fp4 > $L/eng_fp8_head4.log 2>&1

echo "=== 3. proxy post-kv_append (clean attribution, no head4)"
timeout 1200 python -u tools/serve_bench.py --format nvfp4p2 \
  --kv-window 256 --seq 512 > $L/proxy_kvapp.log 2>&1

echo "=== 4. step budget 8L (post-kv_append)"
timeout 2400 python -u tools/step_budget.py --layers 8 > $L/budget.log 2>&1

echo "=== 5. w4a8 mid-m with precomputed requant"
timeout 2400 python -u tools/w4a8_midm.py > $L/w4a8.log 2>&1

echo "=== 6. bench quick suite (longer timeout)"
timeout 1800 python -u bench.py --verbose > $L/bench.log 2>&1

echo "=== 7. engine short-context bf16 (r3 569.0 comparison point)"
timeout 1800 python -u tools/serve_bench.py --engine --format nvfp4p2 \
  --seq 512 --new-tokens 224 --decode-block 128 > $L/eng_short.log 2>&1

echo "=== done"
