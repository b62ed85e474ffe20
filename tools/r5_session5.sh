#!/bin/bash
# Round-5 TPU session 5: mxfp4z (zero-free MXFP4) measurements — quick
# GEMM suite + MoE engine with mxfp4z experts.
set -x
cd /root/repo
L=/tmp/r5s5
mkdir -p $L

echo "=== 1. quick GEMM suite, mxfp4z"
timeout 1800 python -u bench.py --format mxfp4z --verbose \
  > $L/bench_mxz.log 2>&1

echo "=== 2. quick GEMM suite, mxfp4 (same-session baseline)"
timeout 1800 python -u bench.py --format mxfp4 --verbose \
  > $L/bench_mx.log 2>&1

echo "=== 3. MoE engine, mxfp4z experts"
timeout 2400 python -u tools/moe_bench.py --moe-fmt mxfp4z --engine \
  > $L/moe_mxz.log 2>&1

echo "=== done"
