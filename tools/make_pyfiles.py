#!/usr/bin/env python
"""Package montezuma_spark into dist/montezuma_spark.zip for
``spark-submit --py-files`` (executors import the engine from the zip)."""

from __future__ import annotations

import os
import zipfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out: str | None = None) -> str:
    out = out or os.path.join(HERE, "dist", "montezuma_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(HERE, "montezuma_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, HERE))
    return out


if __name__ == "__main__":
    print(build_zip())
