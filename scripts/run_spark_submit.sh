#!/usr/bin/env bash
# Package the engine and run the encode job via spark-submit --py-files
# (the north_rule submission mode). Example:
#   scripts/run_spark_submit.sh /root/repo/.bench_tmp/transcripts_scaling \
#       /root/repo/.bench_tmp/submit_out local[32]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
INPUT="${1:?input parquet path}"
OUT="${2:?output dir}"
MASTER="${3:-local[32]}"

cd "$REPO"
rm -f .bench_tmp/orc_format_spark.zip
mkdir -p .bench_tmp
python -c "
import shutil, zipfile, os
with zipfile.ZipFile('.bench_tmp/orc_format_spark.zip', 'w') as z:
    for root, _, files in os.walk('orc_format_spark'):
        if '__pycache__' in root: continue
        for f in files:
            p = os.path.join(root, f)
            z.write(p, p)
"
exec spark-submit --master "$MASTER" \
    --conf spark.sql.shuffle.partitions=32 \
    --py-files .bench_tmp/orc_format_spark.zip \
    scripts/submit_encode.py "$INPUT" "$OUT"
