#!/usr/bin/env bash
# The round-close gate as a MECHANISM instead of a convention
# (round-4 VERDICT weak item 5): one command that runs every suite a
# kernel- or driver-touching change must pass before it ships.
#
#   tools/gate.sh          # CPU suite + on-chip suite + multichip dryrun
#   tools/gate.sh --cpu    # CPU-mesh suite only (no TPU in the loop)
#
# CPU suite: tests/ on the simulated 8-device mesh (conftest forces
# jax_platforms=cpu).  On-chip suite: tests_tpu/ on the real chip —
# REQUIRED whenever a Pallas kernel or driver changes; interpret mode
# cannot see Mosaic-only failures (CLAUDE.md).  Dryrun: the multi-chip
# sharding path compiled + executed on 8 virtual CPU devices, exactly
# as the driver runs it.
set -euo pipefail
cd "$(dirname "$0")/.."

python -m pytest tests/ -x -q

if [[ "${1:-}" != "--cpu" ]]; then
    python -m pytest tests_tpu/ -q
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
fi
echo "gate: all green"
