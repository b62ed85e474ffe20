#!/bin/bash
# Round-5 TPU session 3: spec decoding in its native regime (bs=1
# single-stream, latency-bound), kv_append hardware exactness re-probe,
# final quick-suite bench on the round-5 kernels + tuned entries.
set -x
cd /root/repo
L=/tmp/r5s3
mkdir -p $L

echo "=== 1. spec serve-scale at bs=1 (latency-bound regime)"
timeout 5400 python -u tools/spec_serve_bench.py --layers 32 --bs 1 \
  --format nvfp4p2z --gammas 3,5,7 --force 0.0,0.5,0.8,0.95 \
  > $L/spec_bs1.log 2>&1

echo "=== 1b. burst admission: paged vs contiguous (VERDICT #4 criterion)"
timeout 2400 python -u tools/admit_probe.py > $L/admit.log 2>&1

echo "=== 2. kv_append hardware exactness probe (session ritual)"
timeout 900 python -u tools/kvapp_probe.py > $L/kvapp.log 2>&1

echo "=== 3. final quick-suite bench (headline JSON)"
timeout 1800 python -u bench.py --verbose > $L/bench.log 2>&1

echo "=== done"
