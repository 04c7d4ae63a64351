#!/bin/sh
# Pre-warm the persistent XLA compilation cache for bench.py.
#
# Run this ONCE after the last hot-path code change (any edit under
# kge_tpu/) and BEFORE the driver's end-of-round bench run: the driver
# reuses the same cache (same machine/user), so a warmed cache turns every
# stage's whole-epoch-scan compile into a cache hit (~1 min total instead
# of 10+ min). bench.py records which full stages compiled for the current
# source tree in $KGE_CACHE/bench_stamp.json; a stale stamp makes the
# driver run fall back to cheap-compiling quick variants instead of
# blowing the budget on a cold compile.
set -e
cd "$(dirname "$0")/.."
KGE_BENCH_BUDGET="${KGE_BENCH_BUDGET:-100000}" exec python bench.py
