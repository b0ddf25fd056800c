#!/usr/bin/env bash
# Data-scaling probe: bench a query subset at an arbitrary synthesized
# scale factor while recording the JVM's memory high-water mark.
#
#   tools/sfprobe.sh <sfDir> <outPrefix> <query...>
#
# Writes <outPrefix>.log (full sbt/bench output; the last stdout JSON
# line is the per-query record), <outPrefix>.rss (peak RSS in KiB of the
# bench's OWN process tree, sampled at 2 s — not every java process on
# the host, which would fold the sbt launcher and unrelated JVMs into
# the high-water mark), and greps the log for spill evidence. Pair with
# tools/make_sf.py, e.g.:
#   python3 tools/make_sf.py /root/testdata/sf0.1 /tmp/sf10 100
#   tools/sfprobe.sh /tmp/sf10 /tmp/probe_graph q_scan q_pagerank ...
set -u
SFDIR=$1; OUT=$2; shift 2
SPARK_GRAFT_SF_DIR=$SFDIR sbt -batch "runMain graft.Bench $*" \
  > "$OUT.log" 2>&1 & BENCH=$!
( peak=0
  while kill -0 "$BENCH" 2>/dev/null; do
    # the bench pid plus all descendants (sbt launcher forks the JVM).
    # NB: word-split $frontier/$all through set -- so the comma list
    # never carries a stray trailing separator (pgrep rejects "123,")
    all=$BENCH; frontier=$BENCH
    while :; do
      set -- $frontier
      kids=$(pgrep -P "$(IFS=,; echo "$*")" 2>/dev/null | tr '\n' ' ')
      set -- $kids
      [ $# -eq 0 ] && break
      all="$all $kids"; frontier="$kids"
    done
    set -- $all
    cur=$(ps -o rss= -p "$(IFS=,; echo "$*")" 2>/dev/null \
      | awk '{s+=$1} END {print s+0}')
    [ "$cur" -gt "$peak" ] && peak=$cur && echo "$peak" > "$OUT.rss"
    sleep 2
  done ) & POLL=$!
wait "$BENCH"
rc=$?
kill $POLL 2>/dev/null
echo "exit=$rc peak_rss_kib=$(cat "$OUT.rss" 2>/dev/null || echo 0)"
grep -io "spill" "$OUT.log" | wc -l | xargs echo "spill_mentions="
grep -o '{"metric".*' "$OUT.log" | tail -1
