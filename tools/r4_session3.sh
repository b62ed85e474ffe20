#!/bin/bash
# Round-4 TPU session 3: 4K-context fp8-vs-bf16 (VERDICT #2 completion),
# decode-block 256, kv_append hardware exactness, weak-shape tuning.
set -x
cd /root/repo
L=/tmp/r4s3
mkdir -p $L

echo "=== 0. kv_append hardware exactness probe"
timeout 900 python -u tools/kvapp_probe.py > $L/kvapp.log 2>&1

echo "=== 1. engine 4K-context bf16 KV"
timeout 3000 python -u tools/serve_bench.py --engine --format nvfp4p2 \
  --seq 4096 --new-tokens 1920 --decode-block 256 \
  > $L/eng4k_bf16.log 2>&1

echo "=== 2. engine 4K-context fp8 KV"
timeout 3000 python -u tools/serve_bench.py --engine --format nvfp4p2 \
  --seq 4096 --new-tokens 1920 --decode-block 256 --kv-dtype fp8 \
  > $L/eng4k_fp8.log 2>&1

echo "=== 3. engine 4K-context fp8 KV + fp4 head"
timeout 3000 python -u tools/serve_bench.py --engine --format nvfp4p2 \
  --seq 4096 --new-tokens 1920 --decode-block 256 --kv-dtype fp8 \
  --lm-head-fp4 > $L/eng4k_fp8_head4.log 2>&1

echo "=== 4. engine 2K-context bf16, decode-block 256 (block-size effect)"
timeout 2400 python -u tools/serve_bench.py --engine --format nvfp4p2 \
  --seq 2048 --new-tokens 960 --decode-block 256 \
  > $L/eng2k_blk256.log 2>&1

echo "=== 5. weak-shape tuning (wqkv/wo decode + fp4 head shapes)"
timeout 5400 python -u tools/tune_r4.py > $L/tune.log 2>&1

echo "=== done"

echo "=== 6. w4a8 mid-m after bf16-domain round"
timeout 2400 python -u tools/w4a8_midm.py --ms 128,256,384 > $L/w4a8_r2.log 2>&1
echo "=== really done"
