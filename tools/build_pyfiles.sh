#!/usr/bin/env bash
# Package the library for spark-submit --py-files (north rule deployment path).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/entity_matching_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/entity_matching_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("entity_matching_spark"):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith(".py"):
                p = os.path.join(root, fn)
                z.write(p, p)
print("wrote dist/entity_matching_spark.zip")
EOF
