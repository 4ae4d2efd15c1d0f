#!/bin/bash
# Vocab-scaled rehearsal (BENCH_SCALING.md "Unsaturated shingle regime").
#
# The default rehearsal corpus keeps the driver corpus's vocab-30
# text at every SF, so the 3-gram space saturates the absolute
# maxDf cutoff past sf~1e and the exact-Jaccard family measures the
# SATURATED regime (near-zero posting mass survives). This driver
# grows the vocabulary as V = 30*(sf/0.1)^(1/3) so the shingle
# space grows ~linearly with the corpus and mean df stays flat —
# the realistic-web regime where the inverted index does full work
# at every scale. One JVM per point, same as run_scaling.sh.
#
# Usage: tools/run_vocab_scaling.sh
set -euo pipefail
cd "$(dirname "$0")/.."

DATA="${SCALE_DATA_DIR:-$PWD/scaledata}"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
JFLAGS=(-Xmx48g
  --add-exports java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens java.base/java.nio=ALL-UNNAMED
  --add-opens java.base/java.util=ALL-UNNAMED
  --add-opens java.base/java.lang=ALL-UNNAMED
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens java.base/jdk.internal.misc=ALL-UNNAMED)

GATES="dedup_minhash_lsh,dedup_ngram_jaccard,dedup_char_ngram,dedup_containment,source_overlap,dedup_shingle_df_stats,dedup_char_shingle_df_stats,decontamination_bloom,dedup_span_coverage,bm25_search,text_tf_idf"

sbt -batch compile

# (sf label, corpus dir, vocab) — v = 30*(sf/0.1)^(1/3) rounded
declare -a POINTS=("0.1=sf0.1e=30" "1.0=sf1.0e-v65=65" "4.0=sf4.0e-v103=103")
OUTS=()
for p in "${POINTS[@]}"; do
  IFS='=' read -r sf sub v <<< "$p"
  dir="$DATA/$sub"
  if [ ! -d "$dir" ]; then
    echo "== generating sf$sf vocab$v -> $dir"
    java "${JFLAGS[@]}" -cp "$CP" graft.tools.ScaleCorpus "$sf" "$dir" "$v"
  fi
  out="$DATA/scaling_vocab_sf${sf}.json"
  echo "== timing sf$sf vocab$v (fresh JVM)"
  SPARK_GRAFT_SCALE_QUERIES="$GATES" SPARK_GRAFT_SCALE_NO_BUNDLES=1 \
    java "${JFLAGS[@]}" -cp "$CP" graft.tools.ScalingBench "$out" "${sf}=${dir}"
  OUTS+=("$out")
done

python3 tools/fit_scaling.py "${OUTS[@]}"
