#!/bin/bash
# Run this when the axon TPU relay comes back after an outage. Order
# matters: everything below shares warm compile caches where possible so
# the cold remote-compile pathology (first compile 6-20 min, serializes
# the compile service) is paid once, and no two cold-cache TPU processes
# ever run concurrently (CLAUDE.md).
#
# IMPORTANT: run NOTHING else on this 1-core host while this script is
# going — host-timed probes (the tune's K4 refit) are poisoned by any
# concurrent process (measured 2026-08-18: a parallel pytest inflated
# np.unique 100x and zeroed the fitted cost model).
set -u
set -o pipefail  # bench step pipes through tail; the pipeline status must be bench's
cd "$(dirname "$0")/.."
fail=0

echo "=== 0. arm access tracking for the compile-cache prune ==="
# the seed refresh (step 5) packs only executables this script's flows
# actually LOAD, bounding the shipped tarball (VERDICT r4 weak #6: the
# unpruned seed grew 24->56 MB in one round). relatime only bumps atime
# when it is older than mtime, so backdate every entry first — one read
# during tune/suite/bench then marks it live.
CACHE_DIR="$HOME/.cache/stormtpu/xla_cache"
MARKER=$(mktemp)
if [ -d "$CACHE_DIR" ]; then
  find "$CACHE_DIR" -type f -exec touch -a -d "2 days ago" {} + 2>/dev/null
fi

echo "=== 1. probe ==="
timeout 1800 python -c "import jax; print(jax.devices())" || exit 1

echo "=== 2. re-tune (bare tune = FULL shape grid; checkpoints the"
echo "        cache after every bucket) ==="
timeout 7200 python -m stormtpu tune || fail=1

echo "=== 2b. snapshot the tuned cost/rate cache into the repo (the"
echo "        machine is reimaged between rounds; ~/.cache does not"
echo "        survive) ==="
cp "$HOME/.cache/stormtpu/tuning.json" stormtpu/data/tuning_snapshot.json || fail=1

echo "=== 3. on-device failure-mode suite ==="
STORMTPU_TPU_TESTS=1 timeout 7200 python -m pytest tests/test_tpu_device.py -q || fail=1

echo "=== 4. bench (driver contract; verified-before-report) ==="
# canonical run: ONLY this script may write bench_details.json (driver
# or ad-hoc runs write dated side files and cannot clobber the record)
timeout 7200 env STORMTPU_BENCH_CANONICAL=1 python bench.py | tail -1 || fail=1

echo "=== 5. pruned compile-cache seed (entries loaded or compiled by"
echo "        the flows above; orphans from dead code paths drop out) ==="
if [ -d "$CACHE_DIR" ]; then
  ( cd "$HOME/.cache/stormtpu" && \
    { find xla_cache -type f -neweram "$MARKER"; \
      find xla_cache -type f -newer "$MARKER"; } | sort -u \
      > /tmp/seed_keep.txt )
  kept=$(wc -l < /tmp/seed_keep.txt)
  total=$(find "$CACHE_DIR" -type f | wc -l)
  if [ "$kept" -gt 0 ]; then
    tar czf stormtpu/data/xla_cache_seed.tar.gz -C "$HOME/.cache/stormtpu" \
        -T /tmp/seed_keep.txt || fail=1
    echo "seed: kept $kept of $total cache entries," \
         "$(du -h stormtpu/data/xla_cache_seed.tar.gz | cut -f1)"
  else
    echo "seed: access tracking recorded nothing — keeping the old seed"
  fi
fi
rm -f "$MARKER"

if [ "$fail" -ne 0 ]; then
  echo "TPU-RETURN CHECKS FINISHED WITH FAILURES - inspect output above"
  exit 1
fi
echo "ALL TPU-RETURN CHECKS DONE - record numbers in BASELINE.md"
