"""Zip the engine for spark-submit --py-files (S14 analog: the reference
tars model dirs, utils/file_utils.py:8-15; here we zip the package)."""

from __future__ import annotations

import os
import zipfile


def main(out: str = "engine.zip") -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "dense_retriever_spark")
    out = out if os.path.isabs(out) else os.path.join(root, out)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(dirpath, f)
                    z.write(p, os.path.relpath(p, root))
    print(out)


if __name__ == "__main__":
    import sys

    main(*sys.argv[1:2])
