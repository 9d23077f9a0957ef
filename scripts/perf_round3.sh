#!/bin/bash
# One-shot round-3 measurement sweep (run when the TPU tunnel is up):
#   1. headline bench (N=1024) -> /tmp/bench_r3.json
#   2. Cave datagen phase breakdown (N=128)
#   3. Cathedral breakdown (N=64)
set -x
cd "$(dirname "$0")/.."
timeout 1700 python bench.py > /tmp/bench_r3.json 2>/tmp/bench_r3.err
timeout 1700 python scripts/perf_phase.py 128 > /tmp/perf_phase_cave_r3.log 2>&1
timeout 1700 python scripts/perf_phase.py 64 \
    /root/reference/assets/samples/levels/Cathedral.ron \
    > /tmp/perf_phase_cath_r3.log 2>&1
echo DONE
