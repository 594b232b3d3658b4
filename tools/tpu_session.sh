#!/bin/bash
# One-shot TPU measurement session: runs every tunnel-gated item from the
# round-3 queue, teeing to /tmp/tpu_session/. Safe to re-run; each step is
# independently time-boxed so one hang doesn't eat the session.
set -u
OUT=/tmp/tpu_session
mkdir -p "$OUT"
run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name: $* (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  rc=$?
  echo "--- rc=$rc; stdout tail:"; tail -5 "$OUT/$name.out"
  echo "--- stderr tail:"; tail -3 "$OUT/$name.err"
}

cd "$(dirname "$0")/.."

# 1. config-4 progressive-train bench at the pinned 32-steps/stage workload
run bench4 2400 python bench.py --config 4 --backend default

# 2. remat A/B: temp bytes + step time at flagship shapes
run ab_remat_256 2400 python tools/ab_remat.py --res 256 --batch 8
run ab_remat_512 3000 python tools/ab_remat.py --res 512 --batch 2

# 3. grouped-dx fused DoubleConv variant A/B (expected negative; record)
run ab_double_conv 2400 python tools/ab_double_conv.py

# 4. fresh flagship + remaining configs
run bench2 2400 python bench.py --config 2 --backend default
run bench1 1800 python bench.py --config 1 --backend default
run bench3 2400 python bench.py --config 3 --backend default
run bench5 2400 python bench.py --config 5 --backend default

echo "=== session done; results in $OUT ==="
