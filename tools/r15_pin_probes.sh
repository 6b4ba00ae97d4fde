#!/bin/bash
# Pin-time adjudication probes for entries that inflated >1.5x in the
# round-15 recording (BASELINE.md protocol): isolated BenchOne REPS=3.
set -u
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
cd /root/repo
OUT=/tmp/r15_pin_probes.log
: > "$OUT"
for q in pipeline_corpus_prep pipeline_day_metrics g_hits mm_scene_cuts \
         pipeline_loader_manifest lake_cdc_apply g_kpaths_cheapest \
         mm_decode_video; do
  echo "=== $q ===" >> "$OUT"
  sbt -batch "runMain graft.BenchOne $q 3" 2>&1 | grep -E "\[bench-one\]" >> "$OUT"
done
echo "=== DONE ===" >> "$OUT"
