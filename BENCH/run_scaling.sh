#!/usr/bin/env bash
# Scaling-efficiency evidence for the north_rule's two-cluster-size gate:
# the identical job at N and 4N parallelism (local[8] vs local[32]) on the
# same input; efficiency = T_4N / (4 × T_N) computed on throughput
# (turns/sec of the ingest→tiered-rollup pipeline).
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
OUT="${1:-BENCH/scaling_raw.json}"

echo "== local[8] =="
J8=$(SPARK_GRAFT_CPUS=8 SPARK_GRAFT_SF_DIR="$SF_DIR" python bench.py | tail -1)
echo "$J8"
echo "== local[32] =="
J32=$(SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$SF_DIR" python bench.py | tail -1)
echo "$J32"

python - "$J8" "$J32" "$OUT" <<'EOF'
import json, sys
j8, j32 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
t8, t32 = j8["turns_per_sec"], j32["turns_per_sec"]
eff = t32 / (4 * t8)
out = {"local8": j8, "local32": j32,
       "throughput_8": t8, "throughput_32": t32,
       "scaling_efficiency_8_to_32": round(eff, 3)}
with open(sys.argv[3], "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out, indent=2))
EOF
