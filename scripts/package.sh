#!/bin/sh
# Build dist/sequali_spark.zip for spark-submit --py-files.
# Models/patterns ship inside the zip (resources/); executors need no
# network and no repo checkout.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/sequali_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/sequali_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("sequali_spark"):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith((".pyc",)):
                continue
            p = os.path.join(root, fn)
            z.write(p, p)
print("wrote dist/sequali_spark.zip")
EOF
