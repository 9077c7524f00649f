#!/usr/bin/env bash
# Build the --py-files zip and smoke-test it through spark-submit
# (the north_rule ship format: spark-submit --py-files dist/*.zip).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/wiki_entity_linker_spark.zip
zip -qr dist/wiki_entity_linker_spark.zip wiki_entity_linker_spark -x '*__pycache__*'
echo "built dist/wiki_entity_linker_spark.zip"
if [[ "${1:-}" == "--smoke" ]]; then
    SPARK_SUBMIT=$(python - <<'EOF'
import os, pyspark
print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))
EOF
)
    "$SPARK_SUBMIT" --master 'local[4]' \
        --py-files dist/wiki_entity_linker_spark.zip \
        scripts/submit_smoke.py
fi
