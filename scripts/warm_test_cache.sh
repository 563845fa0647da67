#!/bin/sh
# Pre-seed the persistent XLA compile cache (/tmp/jax_test_cache) used by the
# test suite (tests/conftest.py). Cold, the slow tier costs ~10 min of XLA
# compiles; warm, the full suite is dominated by actual test work.
#
#   sh scripts/warm_test_cache.sh          # fast tier + slow tier once
#
# Subsequent `pytest tests/` (fast tier, default) and `pytest tests/ -m slow`
# runs reuse the cache across processes and reboots of the test runner.
set -x
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python -m pytest tests/ -q -m slow
