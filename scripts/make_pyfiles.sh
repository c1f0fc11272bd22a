#!/bin/sh
# Package the engine for spark-submit --py-files.
set -eu
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/lexis_minhash_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/lexis_minhash_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("lexis_minhash_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/lexis_minhash_spark.zip")
EOF
