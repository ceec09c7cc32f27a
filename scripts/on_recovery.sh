#!/bin/bash
# Tunnel-recovery runbook (CLAUDE.md "FIRST THINGS on recovery"), one command.
#
# Runs, in order, with logs under /tmp/recovery/:
#   1. bench.py        — warms the compile cache, records the pending
#                        kv_fp8_x / int8_fp8_x / mulaw_x numbers.
#   2. stagger_probe   — re-measures batched streaming admission latency
#                        after the ramp-waiters-only pressure-tier gate
#                        (expected: p50 neutral, whole-WAV drains faster).
#
# Each step is bounded; a hang does not wedge the shell.
set -u
mkdir -p /tmp/recovery
cd /root/repo

echo "=== step 1: bench.py ($(date)) ==="
timeout 3600 python bench.py > /tmp/recovery/bench.out 2> /tmp/recovery/bench.err
rc=$?
tail -20 /tmp/recovery/bench.err
tail -3 /tmp/recovery/bench.out
if [ $rc -ne 0 ]; then
  echo "bench.py FAILED (rc=$rc) — tunnel likely still degraded; stopping."
  exit $rc
fi

echo "=== step 2: stagger_probe ($(date)) ==="
timeout 2400 python bench/stagger_probe.py > /tmp/recovery/stagger.out 2>&1
tail -20 /tmp/recovery/stagger.out

echo "=== done ($(date)) — full logs in /tmp/recovery/ ==="
