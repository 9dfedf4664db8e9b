#!/bin/sh
# Pre-snapshot gate: full test suite + driver entry-point smoke.
# Run from the repo root before every milestone commit:
#   sh tools/precommit.sh          # full suite (~11 min on CPU)
#   sh tools/precommit.sh -q       # quick: entry smoke + fast test subset
set -e
cd "$(dirname "$0")/.."

if [ "$1" = "-q" ]; then
    JAX_PLATFORMS=cpu python -m pytest tests/test_algorithms.py tests/test_krylov.py -q
else
    python -m pytest tests/ -q
fi

# driver entry points: jittable forward step + sharded dry run
JAX_PLATFORMS=cpu python __graft_entry__.py
echo "precommit: OK"
