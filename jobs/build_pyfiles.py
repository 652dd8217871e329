"""Build dist/log_analysis_ai_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile


def build(out: str = "dist/log_analysis_ai_spark.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(root, "dist"), exist_ok=True)
    out_path = os.path.join(root, out)
    pkg = os.path.join(root, "log_analysis_ai_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    print(build())
