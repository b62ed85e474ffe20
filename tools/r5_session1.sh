#!/bin/bash
# Round-5 TPU session 1: engine roofline with nvfp4p2z (VERDICT r4 #2),
# paged-vs-contiguous hardware numbers (#4), spec serve-scale measurement
# (#6), step budget re-itemization.
set -x
cd /root/repo
L=/tmp/r5s1
mkdir -p $L

echo "=== 1. model-step proxy, nvfp4p2z"
timeout 1800 python -u tools/serve_bench.py --format nvfp4p2z \
  > $L/proxy_p2z.log 2>&1

echo "=== 2. engine 2K-context bf16 KV, nvfp4p2z (r4 comparison: 728.8)"
timeout 2400 python -u tools/serve_bench.py --engine --format nvfp4p2z \
  --seq 2048 --new-tokens 960 --decode-block 128 \
  > $L/eng2k_p2z.log 2>&1

echo "=== 3. engine 2K fp8 KV + fp4 head, nvfp4p2z"
timeout 2400 python -u tools/serve_bench.py --engine --format nvfp4p2z \
  --seq 2048 --new-tokens 960 --decode-block 128 --kv-dtype fp8 \
  --lm-head-fp4 > $L/eng2k_p2z_fp8_head4.log 2>&1

echo "=== 4. engine 4K fp8 KV + fp4 head, nvfp4p2z (r4: 726.8)"
timeout 3000 python -u tools/serve_bench.py --engine --format nvfp4p2z \
  --seq 4096 --new-tokens 1920 --decode-block 256 --kv-dtype fp8 \
  --lm-head-fp4 > $L/eng4k_p2z_fp8_head4.log 2>&1

echo "=== 5. engine 4K paged backend, same config (VERDICT #4 numbers)"
timeout 3000 python -u tools/serve_bench.py --engine --format nvfp4p2z \
  --seq 4096 --new-tokens 1920 --decode-block 256 --kv-dtype fp8 \
  --lm-head-fp4 --backend paged > $L/eng4k_p2z_paged.log 2>&1

echo "=== 6. step budget, nvfp4p2z (GEMM rows vs their floors)"
timeout 2400 python -u tools/step_budget.py --format nvfp4p2z \
  > $L/budget_p2z.log 2>&1

echo "=== 7. spec serve-scale measurement (VERDICT #6)"
timeout 5400 python -u tools/spec_serve_bench.py --layers 32 \
  --format nvfp4p2z > $L/spec32.log 2>&1

echo "=== done"
