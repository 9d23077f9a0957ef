#!/bin/sh
# CI gate (the reference's .github/workflows equivalent): fast test
# subset, the multi-chip sharding dry run, and a CPU end-to-end smoke.
set -e
cd "$(dirname "$0")/.."
python scripts/xtask.py ci
