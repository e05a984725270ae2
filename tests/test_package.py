"""The spark-submit artifact (tools/package.py) must be self-contained:
every crawler_spark module importable from the zip alone, the way
--py-files distributes it to executors."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_engine_zip_importable(tmp_path):
    out = str(tmp_path / "engine.zip")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py"), out],
        capture_output=True, text=True, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr
    probe = (
        "import sys; sys.path.insert(0, %r); "
        "sys.path = [p for p in sys.path if p not in (%r, '')]; "
        "import crawler_spark.driver, crawler_spark.plans.round, "
        "crawler_spark.streaming.ingest, crawler_spark.queries.pipeline_ops; "
        "assert crawler_spark.driver.__file__.startswith(%r)"
    ) % (out, REPO, out)
    r2 = subprocess.run(
        [sys.executable, "-c", probe], capture_output=True, text=True, cwd=str(tmp_path),
    )
    assert r2.returncode == 0, r2.stderr
