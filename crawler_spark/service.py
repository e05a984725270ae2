"""Thin control surface (S13 — reference REST service parity).

The reference runs a warp HTTP server (src/Service.hs:28-83) exposing
status / workerStatus / queueSize / addUrl / addUrlIncludePattern / stop.
Those are control-plane operations, not Spark operators, so here they are
plain functions over the engine state a driver (or an HTTP wrapper of your
choosing) calls between rounds:

  queue_size      ≡ GET /queueSize/UrlQueue   (src/Service.hs:58-63)
  run_status      ≡ GET /status               (src/Service.hs:47-51)
  worker_status   ≡ GET /workerStatus         (src/Service.hs:53-56) —
                    Spark's executor/task view replaces thread states
  add_urls        ≡ POST /addUrl              (src/Service.hs:65-74) —
                    canonicalize + admission into the NEXT round
  add_url_include_pattern
                  ≡ POST /addUrlIncludePattern (src/Service.hs:76-77) —
                    the pattern set grows for every FOLLOWING round (the
                    reference's TVar insert takes effect on the next
                    worker iteration; ours at the next round boundary)
  request_stop /  ≡ POST /stop                (src/Service.hs:79-80) —
  stop_requested    flag-file FSM (RunningStatus → HaltingStatus)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from crawler_spark.plans import expressions as X

from crawler_spark.driver import CrawlRun
from crawler_spark.plans.round import pending_frontier


def queue_size(run: CrawlRun, spark: SparkSession) -> int:
    """Pending frontier rows (the UrlQueue size analog)."""
    return pending_frontier(
        run.catalog.frontier.read(spark), run.catalog.scheduled.read(spark)
    ).count()


def run_status(run: CrawlRun, spark: SparkSession) -> dict:
    rows = (
        run.catalog.runs.read(spark).orderBy(F.desc("round")).limit(1).collect()
    )
    if not rows:
        return {"status": "unstarted", "round": -1, "stored_total": 0}
    r = rows[0]
    return {"status": r["status"], "round": r["round"], "stored_total": r["stored_total"]}


def add_urls(run: CrawlRun, urls: list[str]) -> int:
    """POST /addUrl parity: canonicalize + full admission pipeline; the
    URLs become fetchable next round. Returns rows actually admitted
    (dups/filtered URLs are rejected exactly like discovered links)."""
    from crawler_spark.plans.round import admit_candidates

    spark = run.spark
    raw = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "pos long, raw string"
    )
    from crawler_spark.functions.urls import register_udfs

    canonicalize_urls, _ = register_udfs()
    canon = raw.withColumn("c", canonicalize_urls(X.ws_trim_col(F.col("raw")))).select(
        "pos",
        F.col("c.url").alias("url"),
        F.col("c.host").alias("host"),
        F.col("c.error").alias("error"),
    )
    occ = canon.where(F.col("error").isNull()).select(
        "url", "host", F.lit(0).cast("long").alias("ord_rank"), F.col("pos").alias("ord_sub"),
        F.lit(0).cast("int").alias("prio"),  # service-added URLs rank as seeds
    )
    seen = run.catalog.url_seen.read(spark).select("url")
    pending = pending_frontier(
        run.catalog.frontier.read(spark), run.catalog.scheduled.read(spark)
    ).select("url")
    fa, _errs = admit_candidates(occ, seen, pending, run.ctx, run.round, run.next_seq)
    n = run.catalog.frontier.append(fa, run.round - 1)
    run.next_seq += n
    return n


def add_url_include_pattern(run: CrawlRun, pattern: str) -> None:
    """POST /addUrlIncludePattern parity (src/Service.hs:76-77): insert
    into the URL include-pattern set; rounds run after this call admit
    URLs matching the new pattern (config is round-scoped, not frozen —
    the run-checkpoint keeps the ORIGINAL config, mirroring the reference
    where runtime TVar inserts are likewise not persisted)."""
    import dataclasses

    cfg = run.ctx.config
    if pattern in cfg.url_include_patterns:
        return
    new = dataclasses.replace(
        cfg, url_include_patterns=tuple(cfg.url_include_patterns) + (pattern,)
    )
    run.ctx.config = new
    run.config = new


def worker_status(run: CrawlRun, spark: SparkSession) -> dict:
    """GET /workerStatus parity (src/Service.hs:53-56): the reference
    reports per-thread states; the Spark analog is the executor/task
    view — active jobs/stages from the status tracker plus the last
    round's per-stage timings and counters."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    metrics_rows = [
        (r["round"], r["name"], r["value"])
        for r in run.catalog.metrics.read(spark).orderBy("round", "name").collect()
    ]
    return {
        "parallelism": sc.defaultParallelism,
        "active_jobs": list(tracker.getActiveJobsIds()),
        "active_stages": list(tracker.getActiveStageIds()),
        "rounds_run": run.round,
        "stored_total": run.stored_total,
        "last_round_timings": dict(run.timings),
        "metrics": metrics_rows,
    }


def _stop_flag(run: CrawlRun) -> str:
    return os.path.join(run.catalog.root, "_stop")


def request_stop(run: CrawlRun) -> None:
    with open(_stop_flag(run), "w") as f:
        f.write("halt")


def stop_requested(run: CrawlRun) -> bool:
    return os.path.exists(_stop_flag(run))
