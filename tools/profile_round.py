"""Per-round wall-time profiler for the crawl driver (fixed-cost tuning).

Generates a small deterministic web, runs a few rounds at a chosen
parallelism, and prints per-round seconds plus the driver's phase timing
breakdown (CrawlRun collects it when SPARK_GRAFT_TIMING=1).

Usage: python tools/profile_round.py [cpus] [n_docs] [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_TIMING", "1")


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from crawler_spark.config import CrawlConfig
    from crawler_spark.driver import CrawlRun
    from crawler_spark.genweb_spark import write_benchweb
    from crawler_spark.session import build_session

    web = os.path.join(REPO, "_data", f"profweb_{n_docs}")
    state = os.path.join(REPO, "_data", "profstate")
    spark = build_session(app_name="profile", master=f"local[{cpus}]", shuffle_partitions=cpus)
    if not os.path.exists(os.path.join(web, "documents.parquet")):
        shutil.rmtree(web, ignore_errors=True)
        write_benchweb(spark, web, n_docs=n_docs, n_hosts=max(50, n_docs // 500), links_per_doc=5, seed=42)

    documents = spark.read.parquet(os.path.join(web, "documents.parquet"))
    redirects = spark.read.parquet(os.path.join(web, "redirects.parquet"))
    robots = spark.read.parquet(os.path.join(web, "robots_rules.parquet"))
    seeds_df = documents.where(F.xxhash64("doc_id") % 3 == 0).select(
        F.xxhash64("doc_id").alias("pos"), F.col("doc_id").alias("raw")
    )
    cfg = CrawlConfig(
        seeds=(), domain_include_patterns=("example.org",),
        per_host_budget=50, scheduler_salts=8,
    )
    shutil.rmtree(state, ignore_errors=True)
    run = CrawlRun(spark, cfg, state, documents, redirects, robots)
    t0 = time.time()
    run.seed_df(seeds_df)
    t_seed = time.time() - t0
    print(f"seed: {t_seed:.2f}s")
    per_round = []
    for _ in range(rounds):
        t0 = time.time()
        if not run.run_one_round():
            break
        per_round.append(time.time() - t0)
        print(f"round {run.round - 1}: {per_round[-1]:.2f}s  timings={json.dumps(getattr(run, 'timings', {}))}")
    n = run.catalog.scheduled.read(spark).count()
    total = t_seed + sum(per_round)
    print(f"TOTAL {total:.2f}s  urls={n}  urls/sec={n / total:.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
