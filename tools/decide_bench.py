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
    # "python" forces every row through the Python decide loop; "jvm"
    # (default) uses the plans/extract.py fast-path split
    path = sys.argv[3] if len(sys.argv) > 3 else "jvm"

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
    cfg = CrawlConfig(
        domain_include_patterns=("example.org",),
        per_host_budget=10**9,
        vectorized_extract=(path == "jvm"),
    )
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

    # Decide-phase isolation: rebuild hop 0's fetch-join input once
    # (mirrors plans/round.fetch_and_branch), materialize it, then time
    # ONLY the decision stage over the materialized input for this path.
    from crawler_spark.plans.extract import plain_decisions, route_python_col
    from crawler_spark.plans.parse import DECISION_SCHEMA, make_decide

    state = admitted.select(
        F.col("url").alias("scheduled_url"), "rank",
        F.col("url").alias("current_url"), F.lit(0).alias("hops"),
        F.array().cast("array<string>").alias("chain_cookies"),
    )
    clo = closure.select(
        F.col("src_url").alias("current_url"),
        F.col("final_url").alias("_f"), F.col("visited").alias("_v"),
        F.col("aborted").alias("_a"),
    ).join(F.broadcast(state.select("current_url")), "current_url", "left_semi")
    swf = (
        state.join(clo, "current_url", "left")
        .withColumn("final", F.coalesce(F.col("_f"), F.col("current_url")))
        .withColumn("visited", F.coalesce(F.col("_v"), F.array(F.col("current_url"))))
        .withColumn("aborted", F.coalesce(F.col("_a"), F.lit(False)))
        .drop("_f", "_v", "_a")
    )
    docs = documents.withColumnRenamed("doc_id", "final")
    fetched = (
        swf.join(docs.join(F.broadcast(swf.select("final")), "final", "left_semi"),
                 "final", "left")
        .withColumn("too_big", F.lit(False))
        .localCheckpoint()
    )
    fetched.count()
    decide = make_decide(cfg, [], [], None, frozenset())
    t1 = time.time()
    if path == "jvm":
        route = route_python_col([])
        decisions = (
            fetched.where(route).mapInPandas(decide, DECISION_SCHEMA)
            .unionByName(plain_decisions(fetched.where(~route), cfg))
            .localCheckpoint()
        )
    else:
        decisions = fetched.mapInPandas(decide, DECISION_SCHEMA).localCheckpoint()
    nd = decisions.count()
    decide_wall = time.time() - t1

    print(json.dumps({
        "path": path, "rows": n, "cores": cores, "wall_sec": round(wall, 2),
        "rows_per_sec": round(n / wall, 1),
        "rows_per_sec_core": round(n / wall / cores, 1),
        "decide_rows": nd, "decide_wall_sec": round(decide_wall, 2),
        "decide_rows_per_sec_core": round(nd / decide_wall / cores, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
