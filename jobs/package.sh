#!/usr/bin/env bash
# Build the --py-files artifact for cluster submission:
#   bash jobs/package.sh && spark-submit --py-files dist/biomed_timeseries_preprocessing_spark.zip \
#     jobs/rollup_job.py --source ... --warehouse ... --run-id ...
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/biomed_timeseries_preprocessing_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/biomed_timeseries_preprocessing_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("biomed_timeseries_preprocessing_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/biomed_timeseries_preprocessing_spark.zip")
EOF
