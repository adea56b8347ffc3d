#!/usr/bin/env bash
# Isolated-session BenchScale driver — one JVM per family, so one
# family's pinned localCheckpoints (the r19 finding: gopher_gate's
# corpus-scale checkpoint blocks made the NEXT family's run spill,
# 6.25 s -> 26.9 s) cannot pollute the next row. Usage:
#   scripts/benchscale_isolated.sh <sfDir> [family...]
# No family args = all families. Per-row session boundaries are
# recorded as SESSION-START/SESSION-END lines around each family's
# output, so a published table can prove its rows were isolated.
set -u
set -o pipefail
SFDIR="${1:?usage: benchscale_isolated.sh <sfDir> [family...]}"
shift
FAMILIES=("$@")
if [ ${#FAMILIES[@]} -eq 0 ]; then
  FAMILIES=(ivfpq_serve ivfpq_grid multisignal_dedup semdedup
    heavy_hitters source_overlap knn_graph knn_graph_probe2
    repeated_spans html_extract qsketch sq8_serve unigram_encode
    gopher_gate backoff_score quality_funnel knn_store_delta_append)
fi
CP="target/scala-2.13/classes:/opt/spark/jars/*"
CPUS="${SPARK_GRAFT_CPUS:-32}"
LOGDIR="${BENCHSCALE_LOGDIR:-/tmp/benchscale_logs}"
mkdir -p "$LOGDIR"
for fam in "${FAMILIES[@]}"; do
  echo "[benchscale-isolated] SESSION-START family=$fam sf=$SFDIR"
  # record the JVM's own exit status, not grep's: a BenchScale JVM
  # that crashes AFTER emitting one [benchscale] line must not record
  # rc=0 (pipefail + PIPESTATUS[0]); stderr goes to a per-family log
  # instead of /dev/null so a crash is diagnosable
  SPARK_GRAFT_CPUS="$CPUS" java -cp "$CP" graft.BenchScale "$SFDIR" "$fam" \
    2>"$LOGDIR/$fam.err" | grep '^\[benchscale\]'
  rc=${PIPESTATUS[0]}
  echo "[benchscale-isolated] SESSION-END family=$fam rc=$rc"
done
