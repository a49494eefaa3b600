#!/bin/sh
# Package gdal_spark for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/gdal_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/gdal_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("gdal_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("dist/gdal_spark.zip written")
EOF
