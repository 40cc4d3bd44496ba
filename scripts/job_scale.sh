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
# Shuffle/scratch lives on /dev/shm per the measurement protocol
# (BASELINE.md pathology #2: the shared /tmp disk is a cross-VM noise
# source a multi-node cluster would not have).
#
# Usage: scripts/job_scale.sh [narrow_cores] [wide_cores] [turns]
set -u
N=${1:-2}; W=${2:-8}; TURNS=${3:-3600000}
JAR=/root/repo/target/scala-2.13/ocrpipelinespark_2.13-0.1.0.jar
mkdir -p /dev/shm/graft-local
run() {
  local c=$1 tag=$2
  local out=/dev/shm/graft-js-$tag
  rm -rf "$out"
  local t0=$(date +%s.%N)
  local js=$(/opt/spark/bin/spark-submit --class graft.SubmitMain --master "local[$c]" \
    --driver-memory 16g \
    --conf spark.driver.extraJavaOptions="-Xms16g -XX:+AlwaysPreTouch" \
    --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
    --conf spark.local.dir=/dev/shm/graft-local \
    "$JAR" "gen:$TURNS" "$out" 32 2>/dev/null | grep -o 'job_sec=[0-9.]*' | cut -d= -f2)
  local rc=$?
  local t1=$(date +%s.%N)
  awk -v a="$t0" -v b="$t1" -v tag="$tag" -v c="$c" -v rc="$rc" -v js="${js:--1}" \
    'BEGIN{printf "%s cores=%s rc=%s wall=%.1f job_sec=%s\n", tag, c, rc, b-a, js}'
  rm -rf "$out"
}
for i in 1 2 3; do
  run "$N" "n$i"
  run "$W" "w$i"
done
rm -rf /dev/shm/graft-local
