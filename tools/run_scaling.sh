#!/bin/bash
# Scale rehearsal driver (BENCH_SCALING.md "Reproduce").
#
# Generates the synthetic corpus family with graft.tools.ScaleCorpus,
# times the heavy-gate set with graft.tools.ScalingBench — ONE JVM
# PER SCALE POINT (a shared JVM measurably polluted mid-series
# points; see BENCH_SCALING.md Method) — and fits exponents with
# tools/fit_scaling.py.
#
# Usage: tools/run_scaling.sh [sf ...]       (default: 0.1 0.2 0.4 1.0 2.0 4.0)
# Env:   SPARK_GRAFT_SCALE_QUERIES  comma list overriding the gate set
#        SCALE_DATA_DIR             corpus root (default ./scaledata)
set -euo pipefail
cd "$(dirname "$0")/.."

SFS=("${@:-}")
if [ ${#SFS[@]} -eq 0 ] || [ -z "${SFS[0]}" ]; then SFS=(0.1 0.2 0.4 1.0 2.0 4.0); fi
DATA="${SCALE_DATA_DIR:-$PWD/scaledata}"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
JFLAGS=(-Xmx48g
  --add-exports java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens java.base/java.nio=ALL-UNNAMED
  --add-opens java.base/java.util=ALL-UNNAMED
  --add-opens java.base/java.lang=ALL-UNNAMED
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens java.base/jdk.internal.misc=ALL-UNNAMED)

sbt -batch compile

OUTS=()
for sf in "${SFS[@]}"; do
  dir="$DATA/sf${sf}e"
  if [ ! -d "$dir" ]; then
    echo "== generating sf$sf -> $dir"
    java "${JFLAGS[@]}" -cp "$CP" graft.tools.ScaleCorpus "$sf" "$dir"
  fi
  out="$DATA/scaling_sf${sf}.json"
  echo "== timing sf$sf (fresh JVM)"
  java "${JFLAGS[@]}" -cp "$CP" graft.tools.ScalingBench "$out" "${sf}=${dir}"
  OUTS+=("$out")
done

python3 tools/fit_scaling.py "${OUTS[@]}"
