#!/bin/bash
# Round-12 receipt chain: every dev-study harness run SEQUENTIALLY so
# no study's wall numbers contend with another's. java -cp directly
# (the BenchAB child pattern) — no sbt JVM in the timing window.
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
J="java $AO -Dspark.ui.enabled=false -Xmx48g -cp $CP"

run() { # run <logtag> <outfile> <class> [args...]
  local tag=$1 out=$2; shift 2
  echo "=== $tag start $(date -u +%H:%M:%S) ==="
  $J "$@" 2>/tmp/r12_${tag}.err | grep -E '^\{' >> "$out"
  echo "=== $tag done rc=$? $(date -u +%H:%M:%S) ==="
}

: > tools/scalewide_r12.json
run scalewide tools/scalewide_r12.json graft.ScaleWideStudy

: > tools/ann_corpus_r12.json
run mog05 tools/ann_corpus_r12.json graft.AnnCorpusStudy mog 200000 256 0.5
run mog10 tools/ann_corpus_r12.json graft.AnnCorpusStudy mog 200000 256 1.0
run mog20 tools/ann_corpus_r12.json graft.AnnCorpusStudy mog 200000 256 2.0
run replica tools/ann_corpus_r12.json graft.AnnCorpusStudy replica /root/testdata/sf0.1 100

: > tools/streambench_r12.json
run streambench tools/streambench_r12.json graft.StreamBench /root/testdata/sf0.1 25

: > tools/skew_escape_r12.json
run skew tools/skew_escape_r12.json graft.SkewEscapeStudy /root/testdata/sf0.1 10

: > tools/plan_envelope_r12.json
run envelope tools/plan_envelope_r12.json graft.PlanEnvelopeStudy

# jar-vs-jar drift: r11 classes vs r12 classes, interleaved inside one
# window (BenchAB's own design); runs last so the above are clean
$J graft.BenchAB --a /tmp/graft_r11/target/scala-2.13/classes \
  --b target/scala-2.13/classes --runs 3 \
  > tools/benchab_r11_r12.json 2>/tmp/r12_benchab.err
echo "=== benchab done rc=$? $(date -u +%H:%M:%S) ==="
echo ALL_DONE
