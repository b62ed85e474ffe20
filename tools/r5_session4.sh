#!/bin/bash
# Round-5 TPU session 4: p2z across the reference's own benchmark suites —
# full 24-shape Llama-70B suite, 8-way-TP 70B shard shapes, production
# trace — plus an 8K-context engine scaling point.
set -x
cd /root/repo
L=/tmp/r5s4
mkdir -p $L

echo "=== 1. full 24-shape Llama-70B suite, nvfp4p2z"
timeout 3600 python -u bench.py --full --format nvfp4p2z --verbose \
  > $L/full_p2z.log 2>&1

echo "=== 2. 70B 8-way TP shard shapes, nvfp4p2z"
timeout 2400 python -u bench.py --shard70b --format nvfp4p2z --verbose \
  > $L/shard70b_p2z.log 2>&1

echo "=== 3. production trace suite, nvfp4p2z"
timeout 3600 python -u bench.py --trace --format nvfp4p2z --verbose \
  > $L/trace_p2z.log 2>&1

echo "=== 4. engine 8K-context scaling point (fp8 KV + FP4 head)"
timeout 3000 python -u tools/serve_bench.py --engine --format nvfp4p2z \
  --seq 8192 --new-tokens 3840 --decode-block 256 --kv-dtype fp8 \
  --lm-head-fp4 > $L/eng8k.log 2>&1

echo "=== done"
