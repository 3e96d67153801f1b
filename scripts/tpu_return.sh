#!/bin/bash
# Run this when the axon TPU relay comes back (it was down the whole
# r2 follow-up session, 2026-08-17 ~18:00 onward). Order matters:
# everything below shares one process where possible so the cold
# remote-compile pathology (first compile 6-20 min, serializes the
# compile service) is paid once, and no two cold-cache TPU processes
# ever run concurrently (CLAUDE.md).
set -e
cd "$(dirname "$0")/.."

echo "=== 1. probe ==="
timeout 1800 python -c "import jax; print(jax.devices())"

echo "=== 2. re-tune (REQUIRED: pre-fix caches have artifact winners"
echo "        in small-shape buckets - BASELINE.md tuning notes) ==="
timeout 7200 python -m stormtpu tune

echo "=== 3. on-device failure-mode suite (covers the new stream_query"
echo "        diagonal gather-mirror and cross queries if added there) ==="
STORMTPU_TPU_TESTS=1 timeout 7200 python -m pytest tests/test_tpu_device.py -q

echo "=== 4. bench (driver contract; verified-before-report) ==="
timeout 7200 python bench.py | tail -1

echo "ALL TPU-RETURN CHECKS DONE - record numbers in BASELINE.md"
