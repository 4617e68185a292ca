#!/usr/bin/env bash
# Package the engine and launch the pipeline via spark-submit --py-files
# (BASELINE.json:14).  In this sandbox there is no cluster manager, so
# the default master is local[*]; on a real cluster set --master
# yarn/k8s and executor sizing, and add the Iceberg runtime:
#   --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
#   --conf spark.sql.catalog.ice=org.apache.iceberg.spark.SparkCatalog \
#   --conf spark.sql.catalog.ice.type=rest --conf spark.sql.catalog.ice.uri=...
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=${TSC_ZIP:-/tmp/tsc_spark.zip}
INPUT=${1:-/root/testdata/sf0.001}
ROOT=${2:-/tmp/tsc_submit_run}

rm -f "$ZIP"
# package only the library (scripts ship as the job file)
python - "$ZIP" <<'EOF'
import sys, zipfile, pathlib
zip_path = sys.argv[1]
pkg = pathlib.Path("timeseriescorrelation_spark")
with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(pkg.rglob("*.py")):
        z.write(p, p.as_posix())
print("packaged", zip_path)
EOF

exec spark-submit \
  --master "${SPARK_MASTER:-local[*]}" \
  --py-files "$ZIP" \
  scripts/run_pipeline.py \
  --input "$INPUT" --root "$ROOT" --run-id "${RUN_ID:-run0}"
