#!/usr/bin/env bash
# The north rule, to the letter: "launched via spark-submit at N and 4N
# executors, the parse→enrich→route→aggregate path must sustain ≥0.8
# throughput scaling efficiency". This drives graft.Main through REAL
# spark-submit against local-cluster masters with N=1 and 4N=4 separate
# executor JVMs (8 cores / 12 GiB each) on the same generated input,
# interleaved best-of-REPS (default 4 — round 4's 2 reps were inside the
# host's ±23-62% steal band and statistically unreadable), and prints ONE
# JSON line.
#
# Normalization: this sandbox host is CPU-overcommitted — a pure-CPU spin at
# 8 vs 32 threads (graft.HwCalibrate, run through the SAME spark-submit path
# immediately before AND after the measurement window) delivers only
# ~2.1-3.0x of the ideal 4.0x. The JSON therefore carries the raw ratio,
# the measured hw ceiling for this window (mean of the two calibrations),
# and the hardware-NORMALIZED efficiency — the number comparable to the 0.8
# bar (JvmScalingBench is the in-process version of the same methodology).
#
#   bash tools/scaling_submit.sh            # ~45 min at the default 115M turns x 4 reps
#   SUBMIT_SCALE_CONVS=400000 SUBMIT_SCALE_REPS=1 bash tools/scaling_submit.sh  # smoke
set -euo pipefail
cd "$(dirname "$0")/.."
CONVS="${SUBMIT_SCALE_CONVS:-6400000}"
REPS="${SUBMIT_SCALE_REPS:-4}"
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

calibrate() { # -> "aluSpeedup memSpeedup"
  submit 'local[1]' --class graft.HwCalibrate "$JAR" 2>/dev/null | \
    sed -n 's/.*"speedup_8_to_32":\([0-9.]*\).*"mem_speedup_8_to_32":\([0-9.]*\).*/\1 \2/p'
}

# pre-calibration BEFORE generation: the round-5 run calibrated right after
# the 32-core gen pass and read an inflated spin8 (gen-JVM shutdown tail)
echo "[submit-scale] hw calibration (pre)..." >&2
read -r SPEEDUP_PRE MEM_PRE <<< "$(calibrate)"
# fail NOW, not after the ~45-min measurement: an empty read means the
# calibration submit died or its JSON shape drifted from the sed pattern
[ -n "${SPEEDUP_PRE:-}" ] && [ -n "${MEM_PRE:-}" ] || {
  echo "FAIL: pre-calibration produced no parsable output" >&2; exit 1; }
echo "[submit-scale] pre: alu=${SPEEDUP_PRE} mem=${MEM_PRE}" >&2

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
N_REPS=""; N4_REPS=""; TURNS=""
for rep in $(seq 1 "$REPS"); do
  read -r tN  turns  <<< "$(run_one "n-$rep"  "$N_MASTER" 8)"
  read -r t4N turns2 <<< "$(run_one "4n-$rep" "$N4_MASTER" 32)"
  [ "$turns" = "$turns2" ] || { echo "FAIL: turn counts differ ($turns vs $turns2)"; exit 1; }
  TURNS="$turns"
  echo "[submit-scale] rep $rep/$REPS: N(1x8)=${tN}s 4N(4x8)=${t4N}s turns=$turns" >&2
  N_REPS="$N_REPS $tN"; N4_REPS="$N4_REPS $t4N"
done

echo "[submit-scale] hw calibration (post)..." >&2
read -r SPEEDUP_POST MEM_POST <<< "$(calibrate)"
# a dead post-calibration must not discard the completed measurement:
# fall back to the pre values and say so
[ -n "${SPEEDUP_POST:-}" ] && [ -n "${MEM_POST:-}" ] || {
  echo "WARN: post-calibration produced no parsable output; reusing pre" >&2
  SPEEDUP_POST="$SPEEDUP_PRE"; MEM_POST="$MEM_PRE"; }
echo "[submit-scale] post: alu=${SPEEDUP_POST} mem=${MEM_POST}" >&2

N_REPS="$N_REPS" N4_REPS="$N4_REPS" TURNS="$TURNS" REPS="$REPS" \
SPEEDUP_PRE="$SPEEDUP_PRE" SPEEDUP_POST="$SPEEDUP_POST" \
MEM_PRE="$MEM_PRE" MEM_POST="$MEM_POST" \
python3 - <<'PY'
import json, os
n = [float(x) for x in os.environ["N_REPS"].split()]
n4 = [float(x) for x in os.environ["N4_REPS"].split()]
pre, post = float(os.environ["SPEEDUP_PRE"]), float(os.environ["SPEEDUP_POST"])
mpre, mpost = float(os.environ["MEM_PRE"]), float(os.environ["MEM_POST"])
best_n, best_4n = min(n), min(n4)
speedup = best_n / best_4n          # best-of: the least-interfered estimate per config
raw = speedup / 4.0
hw_speedup = (pre + post) / 2.0     # the window's measured 8->32-thread ALU ceiling
ceiling = hw_speedup / 4.0
print(json.dumps({
    "metric": "submit_scaling",
    "value": round(raw, 3),
    "unit": "n_to_4n_efficiency",
    "turns": int(os.environ["TURNS"]),
    "reps": int(os.environ["REPS"]),
    "n_executors_sec": round(best_n, 2),
    "four_n_executors_sec": round(best_4n, 2),
    "n_executors_reps": n,
    "four_n_executors_reps": n4,
    "speedup": round(speedup, 2),
    "hw_speedup_8_to_32": round(hw_speedup, 2),
    "hw_speedup_pre": round(pre, 2),
    "hw_speedup_post": round(post, 2),
    "hw_ceiling": round(ceiling, 3),
    "normalized": round(raw / ceiling, 3),
    "mem_speedup_8_to_32": round((mpre + mpost) / 2.0, 2),
    "mem_speedup_pre": round(mpre, 2),
    "mem_speedup_post": round(mpost, 2),
}, separators=(",", ":")))
PY
