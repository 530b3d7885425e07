#!/bin/bash
# Fresh-JVM standalone re-measure of every stream_* bench entry at sf0.1.
cd /root/repo
OUT=/tmp/remeasure_r15
mkdir -p $OUT
QS="stream_achilles_counts stream_achilles_dist stream_corpus_admit stream_dedup stream_dedup_incremental stream_dqd_runs stream_gopher_gate stream_join_within stream_running_stats stream_semdedup_admit stream_sessionize stream_upsert_zone stream_windowed_counts"
for q in $QS; do
  echo "=== $q $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)" >> $OUT/log.txt
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY=$q \
    sbt -batch "runMain graft.Bench" > $OUT/$q.out 2>&1
  cp bench_out.json $OUT/$q.json 2>/dev/null
done
echo "DONE $(date +%T)" >> $OUT/log.txt
