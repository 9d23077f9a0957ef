#!/bin/bash
# Round-4 measurement sweep (run when the TPU tunnel is up):
#   1. headline bench (N=1024) -> /tmp/bench_r4.json
#   2. Cave datagen phase breakdown (N=128)
#   3. Cathedral breakdown (N=64)
#   4. Cave breakdown at N=1024 (the batch-size regression: datagen was
#      109.4 us/inst at N=1024 vs 89.0 at N=128 in the round-4 opening)
set -x
cd "$(dirname "$0")/.."
timeout 2400 python bench.py > /tmp/bench_r4.json 2>/tmp/bench_r4.err
timeout 1700 python scripts/perf_phase.py 128 > /tmp/perf_phase_cave_r4.log 2>&1
timeout 1700 python scripts/perf_phase.py 64 \
    /root/reference/assets/samples/levels/Cathedral.ron \
    > /tmp/perf_phase_cath_r4.log 2>&1
timeout 1700 python scripts/perf_phase.py 1024 \
    > /tmp/perf_phase_cave1024_r4.log 2>&1
echo DONE
