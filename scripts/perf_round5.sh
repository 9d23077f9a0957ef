#!/bin/bash
# Round-5 opening measurement sweep:
#   1. Cave phase breakdown at N=128 / 512 / 1024 (N-sweep, VERDICT r4 #7)
#   2. Cathedral breakdown at N=64 and N=256
# Results land in /tmp/perf_phase_*_r5.log
set -x
cd "$(dirname "$0")/.."
timeout 1700 python scripts/perf_phase.py 128 > /tmp/perf_phase_cave128_r5.log 2>&1
timeout 1700 python scripts/perf_phase.py 512 > /tmp/perf_phase_cave512_r5.log 2>&1
timeout 1700 python scripts/perf_phase.py 1024 > /tmp/perf_phase_cave1024_r5.log 2>&1
timeout 1700 python scripts/perf_phase.py 64 \
    /root/reference/assets/samples/levels/Cathedral.ron \
    > /tmp/perf_phase_cath64_r5.log 2>&1
timeout 1700 python scripts/perf_phase.py 256 \
    /root/reference/assets/samples/levels/Cathedral.ron \
    > /tmp/perf_phase_cath256_r5.log 2>&1
echo DONE
