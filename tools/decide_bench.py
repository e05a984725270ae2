"""Decide-stage microbenchmark: rows/sec/core through the fetch→decide
pipeline on a synthetic batch, isolating the engine's per-URL ceiling
(NOTES.md tracks this across rounds; the vectorized common path is
measured against the all-Python baseline here).

Usage: python tools/decide_bench.py [n_docs] [cores]
Prints one JSON line {"rows": N, "wall_sec": s, "rows_per_sec_core": r}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crawler_spark.config import CrawlConfig
    from crawler_spark.genweb_spark import write_benchweb
    from crawler_spark.plans.closure import build_redirect_closure
    from crawler_spark.plans.round import RoundContext, fetch_and_branch
    from crawler_spark.session import build_session

    spark = build_session(
        app_name="decide_bench", master=f"local[{cores}]", shuffle_partitions=cores
    )
    web_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "_data", f"decideweb_{n_docs}")
    if not os.path.exists(os.path.join(web_dir, "documents.parquet")):
        write_benchweb(spark, web_dir, n_docs=n_docs, n_hosts=max(50, n_docs // 500),
                       links_per_doc=5, seed=7)

    documents = spark.read.parquet(os.path.join(web_dir, "documents.parquet"))
    redirects = spark.read.parquet(os.path.join(web_dir, "redirects.parquet"))
    cfg = CrawlConfig(domain_include_patterns=("example.org",), per_host_budget=10**9)
    closure = build_redirect_closure(redirects, cfg.max_redirects).localCheckpoint()
    ctx = RoundContext(
        spark=spark, config=cfg, documents=documents, closure=closure,
        robots=None, directions=[], form_instructions=[],
    )
    admitted = documents.select(
        F.col("doc_id").alias("url"),
        F.row_number().over(Window.orderBy("doc_id")).alias("rank"),
    ).localCheckpoint()
    gate = spark.createDataFrame([], "url string")

    t0 = time.time()
    parts = fetch_and_branch(admitted, gate, ctx, 0)
    n = sum(p.count() for p in parts)
    wall = time.time() - t0
    print(json.dumps({
        "rows": n, "cores": cores, "wall_sec": round(wall, 2),
        "rows_per_sec": round(n / wall, 1),
        "rows_per_sec_core": round(n / wall / cores, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
