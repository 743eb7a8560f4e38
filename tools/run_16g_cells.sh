#!/bin/bash
# 4N-level cells at executor-proportional memory (16g = 2g/core at 8 cores,
# vs the N level's 8g = 4g/core — the 4N level still gets HALF the per-core
# memory, so the resulting efficiency is a conservative bound).
# Strictly serial; one JSON line per run appended to /tmp/cells_16g.jsonl.
set -u
cd /root/repo
out=/tmp/cells_16g.jsonl
run() {
  local mode=$1 amp_rounds=$2 tag=$3
  SPARK_GRAFT_SCALE_MODE=$mode SPARK_GRAFT_AMPLIFY_ROUNDS=$amp_rounds \
  SPARK_GRAFT_DRIVER_MEM=16g SPARK_GRAFT_CRAWL_DEBUG=1 \
  python tools/scaling_bench.py --worker 8 > /tmp/cell_$tag.log 2>&1
  # stage-progress \r fragments share the JSON's physical line: split first
  tr '\r' '\n' < /tmp/cell_$tag.log | grep -a '^{' | tail -1 | sed "s/^{/{\"tag\": \"$tag\", /" >> $out
  grep -a '^\[crawl' /tmp/cell_$tag.log | sed "s/^/[$tag] /" >> /tmp/cells_16g_phases.log
  echo "done $tag"
}
run superstep 256 ss16_r1
run superstep 256 ss16_r2
run rounds 256 rd256_16_r0
run rounds 256 rd256_16_r1
run rounds 256 rd256_16_r2
run rounds 1024 rd1024_16_r0
run rounds 1024 rd1024_16_r1
run rounds 1024 rd1024_16_r2
echo ALL_DONE
