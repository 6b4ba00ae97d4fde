#!/bin/bash
# Round-15 adjudication battery: the 7 >2x BENCH_r14 flags + 2 unflagged
# controls, BenchOne REPS=3 warm medians at CPUS=32 / sf0.1 (standing
# protocol, BASELINE.md). Plus a staged cy_store_roundtrip breakdown.
set -u
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
cd /root/repo
OUT=/tmp/r15_adjudicate.log
: > "$OUT"
for q in j1_broadcast_agg dd_exact funnel_conversion eval_retrieval_metrics \
         cy_multi_hop_agg funnel_latency txt_lm_score pipeline_loader_manifest \
         cy_store_roundtrip; do
  echo "=== $q ===" >> "$OUT"
  sbt -batch "runMain graft.BenchOne $q 3" 2>&1 | grep -E "\[bench-one\]|\[stage\]|error" >> "$OUT"
done
echo "=== cy_store_roundtrip STAGES ===" >> "$OUT"
SPARK_GRAFT_STAGES=1 sbt -batch "runMain graft.BenchOne cy_store_roundtrip 2" 2>&1 \
  | grep -E "\[bench-one\]|\[stage\]|error" >> "$OUT"
echo "=== DONE ===" >> "$OUT"
