#!/bin/bash
# Round-5 TPU session 2: spec serve-scale measurement (VERDICT #6, fixed
# max_new_tokens overflow), zero-free tuned entries for the weak decode
# shapes, MoE with p2z experts, then re-measured engine + budget on the
# new entries.
set -x
cd /root/repo
L=/tmp/r5s2
mkdir -p $L

echo "=== 1. spec serve-scale measurement (VERDICT #6)"
timeout 5400 python -u tools/spec_serve_bench.py --layers 32 \
  --format nvfp4p2z > $L/spec32.log 2>&1

echo "=== 2. zero-free tuned entries (weak decode shapes + head)"
timeout 5400 python -u tools/tune_r5.py > $L/tune.log 2>&1

echo "=== 3. step budget on the new entries"
timeout 2400 python -u tools/step_budget.py --format nvfp4p2z \
  > $L/budget_p2z2.log 2>&1

echo "=== 4. engine 2K long-context on the new entries"
timeout 2400 python -u tools/serve_bench.py --engine --format nvfp4p2z \
  --seq 2048 --new-tokens 960 --decode-block 128 \
  > $L/eng2k_p2z2.log 2>&1

echo "=== 5. MoE p2z experts (grouped flag-free kernel)"
timeout 2400 python -u tools/moe_bench.py --moe-fmt nvfp4p2z --engine \
  > $L/moe_p2z.log 2>&1

echo "=== 6. MoE mxfp4 baseline re-measure (same session, fair compare)"
timeout 2400 python -u tools/moe_bench.py --moe-fmt mxfp4 --engine \
  > $L/moe_mx.log 2>&1

echo "=== done"
