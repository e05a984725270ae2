"""Build the spark-submit artifact: zip the crawler_spark package into
engine.zip for `spark-submit --py-files engine.zip run_crawl.py ...`
(north_rule deployment shape; run_crawl.py module docstring).

Usage: python tools/package.py [out.zip]   (default: ./engine.zip)

The zip contains the package rooted at `crawler_spark/` so executors and
the driver resolve `import crawler_spark.*` straight from the archive
(PEP 273 zipimport — the mechanism --py-files relies on). Pure-python,
no binary deps, so one artifact serves every executor platform.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> int:
    n = 0
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "crawler_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
                n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "engine.zip")
    n = build(out)
    print(f"wrote {out} ({n} modules)")
