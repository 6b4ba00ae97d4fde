#!/bin/bash
# Round-16 adjudication battery: the 6 >=2x BENCH_r15 flags + 2 unflagged
# controls, BenchOne REPS=3 warm medians at CPUS=32 / sf0.1 (standing
# protocol, BASELINE.md).
set -u
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
cd /root/repo
OUT=/tmp/r16_adjudicate.log
: > "$OUT"
for q in dd_lsh_recall txt_lm_score a_winsorize dd_cluster_canonical \
         g_random_walk cy_merge_return a1_daily_rollup dd_exact; do
  echo "=== $q ===" >> "$OUT"
  sbt -batch "runMain graft.BenchOne $q 3" 2>&1 | grep -E "\[bench-one\]|\[stage\]|error" >> "$OUT"
done
echo "=== DONE ===" >> "$OUT"
