"""Real `spark-submit --py-files engine.zip` smoke: the north-rule
deployment shape executed for real, not just zipimport-probed. The
submitted driver script resolves crawler_spark ONLY from the shipped
zip (the repo dir is scrubbed from sys.path), runs a 2-round crawl,
and checks the trace against the in-package simulator."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")

_DRIVER = """
import sys

# prove imports come from the --py-files zip, not the repo checkout
sys.path = [p for p in sys.path if p not in ({repo!r}, "")]
import crawler_spark.driver as drv
assert ".zip" in drv.__file__, f"package not loaded from zip: {{drv.__file__}}"

from crawler_spark.session import build_session
from crawler_spark.config import CrawlConfig
from crawler_spark.genweb import generate
from crawler_spark.driver import CrawlRun
from crawler_spark.simulator import Simulator
from crawler_spark.schema import DOCUMENTS, REDIRECTS, ROBOTS_RULES

spark = build_session(app_name="submit_smoke", master="local[4]", shuffle_partitions=4)
web = generate(n_docs=40, n_hosts=4, seed=21, n_redirects=2)
docs = spark.createDataFrame(web["documents"].to_dict("records"), DOCUMENTS)
red = web["redirects"]
redirects = spark.createDataFrame(red.to_dict("records") if len(red) else [], REDIRECTS)
rob = web["robots_rules"]
robots = spark.createDataFrame(rob.to_dict("records") if len(rob) else [], ROBOTS_RULES)
cfg = CrawlConfig(seeds=tuple(web["seeds"]["url"]),
                  domain_include_patterns=("example.org",), per_host_budget=2)
# Simulator reads href_directions/form_instructions from the web dict;
# CrawlRun must get the SAME ones or the traces legitimately diverge
run = CrawlRun(spark, cfg, {state!r}, docs, redirects, robots,
               directions=web["href_directions"],
               form_instructions=web["form_instructions"], bloom_buckets=8)
run.seed(list(cfg.seeds))
run.run(max_rounds=2)
sim = Simulator(web, cfg)
sim.seed(list(cfg.seeds))
res = sim.run(max_rounds=2)
assert run.fetch_order() == res.fetch_order, "trace diverged under spark-submit"
assert run.url_seen_state() == res.url_seen
print("SUBMIT_SMOKE_OK", len(res.fetch_order))
spark.stop()
"""


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_end_to_end(tmp_path):
    zip_path = str(tmp_path / "engine.zip")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py"), zip_path],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    script = tmp_path / "driver.py"
    script.write_text(_DRIVER.format(repo=REPO, state=str(tmp_path / "state")))
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    r2 = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path, str(script)],
        capture_output=True, text=True, cwd=str(tmp_path), env=env, timeout=600,
    )
    assert r2.returncode == 0, f"stdout:\n{r2.stdout[-3000:]}\nstderr:\n{r2.stderr[-3000:]}"
    assert "SUBMIT_SMOKE_OK" in r2.stdout, r2.stdout[-2000:]
