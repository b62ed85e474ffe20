#!/bin/bash
# Round-4 TPU session 4 (follow-up to r4_session3.sh):
#   0. kvapp_diff — localize the headed-fp8 kv_append byte mismatch
#   1-3. engine numbers at matched best conditions (tuned table +
#        pipelined drain + decode-block 256): short-ctx, 2K bf16,
#        2K fp8 (the session-3 2K fp8 number predates pipelining/blk256)
#   4. bench.py quick sanity (BENCH_r4 preview)
set -x
cd /root/repo
L=/tmp/r4s4
mkdir -p $L

echo "=== 0. kvapp_diff"
timeout 900 python -u tools/kvapp_diff.py > $L/kvapp_diff.log 2>&1

echo "=== 1. engine short-ctx best (tuned, blk256, fp4 head)"
timeout 2400 python -u tools/serve_bench.py --engine --format nvfp4p2 \
  --decode-block 256 --lm-head-fp4 > $L/eng_short_best.log 2>&1

echo "=== 2. engine short-ctx best (tuned, blk256, bf16 head)"
timeout 2400 python -u tools/serve_bench.py --engine --format nvfp4p2 \
  --decode-block 256 > $L/eng_short.log 2>&1

echo "=== 3. engine 2K fp8 KV (tuned, blk256, fp4 head)"
timeout 2400 python -u tools/serve_bench.py --engine --format nvfp4p2 \
  --seq 2048 --new-tokens 960 --decode-block 256 --kv-dtype fp8 \
  --lm-head-fp4 > $L/eng2k_fp8_best.log 2>&1

echo "=== 4. w4a8 mid-m after the magic-constant bf16 round fix"
timeout 2400 python -u tools/w4a8_midm.py --ms 128,256,384 > $L/w4a8.log 2>&1

echo "=== 5. bench.py quick"
timeout 590 python -u bench.py > $L/bench_quick.log 2>&1

echo "=== done"
