#!/bin/bash
# Job-level two-parallelism scaling measurement over the DEPLOYMENT
# surface (spark-submit --class graft.SubmitMain): the full bucketed
# extraction job — generation, salted-bucket shuffle, sort-within-
# partitions, dynamic-partition parquet write, manifest aggregate —
# run alternately at N and 4N local cores on the SAME input, three
# pairs, min-per-config headline (the Bench protocol's minima rule).
#
# The scaling figure is SubmitMain's self-reported job_sec (input
# resolution → manifest collect): the number a cluster's job history
# would show, excluding one-time JVM/session startup (~19 s here,
# identical at both widths, amortized to nothing on a long-lived
# cluster). Wall-clock including startup is printed alongside.
#
# Three sidecar measurements per invocation make the number honest:
#  - PROBE lines (graft.HostProbe, pure JVM, no Spark): per-width
#    compute throughput — the box's own scaling ceiling for the window
#    (normalize job efficiency by it) — plus the fresh-page lazy-paging
#    detector. Run before each pair; a page_sec > 1 s or a probe-ratio
#    collapse marks the window dirty.
#  - FIXED lines: the same job over a 1 000-turn input at each width —
#    the core-count-independent driver-side cost (planning, dynamic-
#    partition commit renames, manifest read-back ~10-12 s). Marginal
#    efficiency = ((n_big - n_fixed) / (w_big - w_fixed)) / 4 is the
#    per-turn figure that survives to 10^12-turn scale, where the fixed
#    component is amortized to nothing (at the bench input it is ~25 %
#    of the wide run's wall — a local-mode artifact, not engine cost).
#  - RUN lines: the measured jobs themselves, alternating n/w.
#
# Shuffle/scratch lives on /dev/shm per the measurement protocol
# (BASELINE.md pathology #2: the shared /tmp disk is a cross-VM noise
# source a multi-node cluster would not have).
#
# Usage: scripts/job_scale.sh [narrow_cores] [wide_cores] [turns] [pairs]
set -u
N=${1:-2}; W=${2:-8}; TURNS=${3:-3600000}; PAIRS=${4:-3}
JAR=/root/repo/target/scala-2.13/ocrpipelinespark_2.13-0.1.0.jar
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/scala-library*.jar)"
mkdir -p /dev/shm/graft-local
probe() {
  java -Xmx1g -cp "$CP" graft.HostProbe "$1"
}
submit() { # cores turns outdir -> prints job_sec value or -1
  local c=$1 t=$2 out=$3
  rm -rf "$out"
  /opt/spark/bin/spark-submit --class graft.SubmitMain --master "local[$c]" \
    --driver-memory 16g \
    --conf spark.driver.extraJavaOptions="-Xms16g -XX:+AlwaysPreTouch" \
    --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
    --conf spark.local.dir=/dev/shm/graft-local \
    "$JAR" "gen:$t" "$out" 32 2>/dev/null | grep -o 'job_sec=[0-9.]*' | cut -d= -f2
}
run() {
  local c=$1 tag=$2 js rc
  local out=/dev/shm/graft-js-$tag
  local t0=$(date +%s.%N)
  js=$(submit "$c" "$TURNS" "$out")
  # rc from the captured value, not $?: the submit pipeline ends in cut
  # (exit 0 even on empty input) and `local x=$(...)` masks status with
  # the builtin's anyway — a failed spark-submit shows as empty js
  if [ -n "$js" ]; then rc=0; else rc=1; fi
  local t1=$(date +%s.%N)
  awk -v a="$t0" -v b="$t1" -v tag="$tag" -v c="$c" -v rc="$rc" -v js="${js:--1}" \
    'BEGIN{printf "RUN %s cores=%s rc=%s wall=%.1f job_sec=%s\n", tag, c, rc, b-a, js}'
  rm -rf "$out"
}
# fixed-cost calibration once per invocation, both widths
for c in "$N" "$W"; do
  js=$(submit "$c" 1000 /dev/shm/graft-js-fixed)
  echo "FIXED cores=$c job_sec=${js:--1}"
  rm -rf /dev/shm/graft-js-fixed
done
for i in $(seq 1 "$PAIRS"); do
  probe "$N"
  probe "$W"
  run "$N" "n$i"
  run "$W" "w$i"
done
rm -rf /dev/shm/graft-local
