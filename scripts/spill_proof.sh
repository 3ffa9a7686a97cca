#!/bin/bash
# Constrained-memory spill proof (VERDICT r7, next-round #2).
#
# Runs graft.tools.SpillProof twice on the same (10x-scaled) inputs:
#   1. comfortable heap (default JVM sizing on this 128 GiB host)
#   2. capped heap (-Xmx2g) so hash-agg / sort / shuffle MUST spill
# then asserts (a) every query's canonical result hash is identical and
# (b) the capped run actually spilled (a no-spill "proof" proves nothing).
#
# Usage: scripts/spill_proof.sh [sfDir] [capMB]
#   sfDir default /tmp/sf0.1-x10 (build it first:
#     sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf0.1-x10 10")
set -euo pipefail
cd "$(dirname "$0")/.."

DIR="${1:-/tmp/sf0.1-x10}"
CAP="${2:-2g}"

# run through sbt so the fork inherits build.sbt's JDK-17 --add-opens set
# (Spark 4 outside spark-submit needs them; a bare `java` dies in Kryo the
# moment memory pressure forces a serialized broadcast). SPARK_DRIVER_MEM
# is build.sbt's documented -Xmx override.
echo "== pass 1: default heap =="
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.tools.SpillProof $DIR /tmp/spill_big.json" 2>/tmp/spill_big_err.log | grep '\[spill\]'
echo "== pass 2: -Xmx${CAP} =="
SPARK_DRIVER_MEM="$CAP" SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.tools.SpillProof $DIR /tmp/spill_small.json" 2>/tmp/spill_small_err.log | grep '\[spill\]'

python3 - <<'EOF'
import json, sys
big = json.load(open('/tmp/spill_big.json'))
small = json.load(open('/tmp/spill_small.json'))
bad = [q for q in big['queries']
       if big['queries'][q]['hash'] != small['queries'][q]['hash']]
print(f"heap {big['heap_max_mb']}MB -> {small['heap_max_mb']}MB; "
      f"capped-run spill: mem={small['spill_mem_mb']}MB disk={small['spill_disk_mb']}MB")
if bad:
    print("HASH MISMATCH under memory pressure:", bad); sys.exit(1)
if small['spill_mem_mb'] == 0 and small['spill_disk_mb'] == 0:
    print("WARNING: capped run never spilled - lower the cap or scale up the data"); sys.exit(2)
print(f"OK: {len(big['queries'])} queries bit-identical across heap sizes, spill exercised")
EOF
