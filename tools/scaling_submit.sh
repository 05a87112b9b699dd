#!/usr/bin/env bash
# The north rule, to the letter: "launched via spark-submit at N and 4N
# executors, the parse→enrich→route→aggregate path must sustain ≥0.8
# throughput scaling efficiency". This drives graft.Main through REAL
# spark-submit against local-cluster masters with N=1 and 4N=4 separate
# executor JVMs (8 cores / 12 GiB each) on the same generated input,
# interleaved best-of-REPS, and prints one JSON line.
#
# Interpretation on this sandbox host: the box is CPU-overcommitted — the
# in-band calibration in ScalingBench/JvmScalingBench measures only
# ~2.1-3.0x hardware speedup from 8→32 threads (ceiling 0.52-0.76), so read
# the raw ratio against BASELINE.md's recorded ceiling for the same window;
# JvmScalingBench is the rigorous in-process version of this measurement.
#
#   bash tools/scaling_submit.sh            # ~25 min at the default 115M turns
#   SUBMIT_SCALE_CONVS=400000 SUBMIT_SCALE_REPS=1 bash tools/scaling_submit.sh  # smoke
set -euo pipefail
cd "$(dirname "$0")/.."
CONVS="${SUBMIT_SCALE_CONVS:-6400000}"
REPS="${SUBMIT_SCALE_REPS:-2}"
BASE="$(mktemp -d /dev/shm/graft-submit-scale-XXXX)"
trap 'rm -rf "$BASE"' EXIT
export SPARK_SCALA_VERSION=2.13

sbt -batch package > "$BASE/package.log" 2>&1 || { tail -20 "$BASE/package.log"; exit 1; }
JAR="$(ls target/scala-2.13/logadempiricalspark_2.13-*.jar | head -1)"

submit() { # master extra-conf... -- classArgs...
  local master="$1"; shift
  /opt/spark/bin/spark-submit --master "$master" \
    --driver-memory "${SUBMIT_DRIVER_MEM:-8g}" \
    --conf spark.ui.enabled=false \
    --conf spark.sql.session.timeZone=UTC \
    --conf spark.local.dir="$BASE/spark-local" \
    "$@"
}

echo "[submit-scale] generating ${CONVS} conversations on tmpfs..." >&2
submit 'local[32]' --class graft.GenTranscripts "$JAR" "$CONVS" "$BASE/input" \
  > "$BASE/gen.log" 2>&1 || { tail -20 "$BASE/gen.log"; exit 1; }

run_one() { # tag master shufflePartitions
  # timing = Main's self-reported pipeline_sec: the warmup pass inside the
  # SAME JVM removes whole-stage-codegen JIT (each fresh executor JVM pays
  # it separately, which otherwise swamps the N-vs-4N comparison) and the
  # external JVM/executor startup seconds, which a long-running cluster job
  # pays once, not per measurement.
  local tag="$1" master="$2" parts="$3"
  local out
  out=$(GRAFT_MAIN_WARMUP=1 submit "$master" \
    --conf spark.sql.shuffle.partitions="$parts" \
    --conf spark.executor.memory=11g \
    --class graft.Main "$JAR" "$BASE/run-$tag" "$BASE/input" \
    2>"$BASE/run-$tag.log" | tail -1)
  rm -rf "$BASE/run-$tag"
  case "$out" in *'"fused":true'*) ;; *) echo "FAIL($tag): $out" >&2; tail -30 "$BASE/run-$tag.log" >&2; exit 1;; esac
  TURNS=$(printf '%s' "$out" | sed -n 's/.*"turns":\([0-9]*\).*/\1/p')
  PSEC=$(printf '%s' "$out" | sed -n 's/.*"pipeline_sec":\([0-9.]*\).*/\1/p')
  echo "$PSEC $TURNS"
}

N_MASTER='local-cluster[1,8,12288]'
N4_MASTER='local-cluster[4,8,12288]'
BEST_N=""; BEST_4N=""; TURNS=""
for rep in $(seq 1 "$REPS"); do
  read -r tN  turns  <<< "$(run_one "n-$rep"  "$N_MASTER" 8)"
  read -r t4N turns2 <<< "$(run_one "4n-$rep" "$N4_MASTER" 32)"
  [ "$turns" = "$turns2" ] || { echo "FAIL: turn counts differ ($turns vs $turns2)"; exit 1; }
  TURNS="$turns"
  echo "[submit-scale] rep $rep: N(1x8)=${tN}s 4N(4x8)=${t4N}s turns=$turns" >&2
  BEST_N=$(echo "${BEST_N:-$tN} $tN" | awk '{print ($1<$2)?$1:$2}')
  BEST_4N=$(echo "${BEST_4N:-$t4N} $t4N" | awk '{print ($1<$2)?$1:$2}')
done

echo "$BEST_N $BEST_4N $TURNS" | awk '{printf \
  "{\"metric\":\"submit_scaling\",\"value\":%.3f,\"unit\":\"n_to_4n_efficiency\",\"turns\":%d,\"n_executors_sec\":%.2f,\"four_n_executors_sec\":%.2f,\"speedup\":%.2f}\n", \
  ($1/$2)/4.0, $3, $1, $2, $1/$2}'
