"""Structured Streaming frontier ingestion (S13 `/addUrl` at scale).

The batch engine deliberately runs the crawl itself as deterministic
rounds (SURVEY.md §3.4) — but *candidate arrival* is naturally a stream:
operator-submitted seeds, sitemap pings, out-of-band discoveries. This
module ingests a URL stream into the frontier between rounds with exactly
the round plan's admission semantics (canonicalize → include/robots →
url_seen/pending dedup → FIFO seq), one micro-batch at a time.

Design (idiomatic Structured Streaming, scale posture):
- `readStream.text` file source (swap for Kafka in production — the
  transformations are source-agnostic). Kafka wiring: replace the source
  with `spark.readStream.format("kafka").option("kafka.bootstrap.servers",
  ...).option("subscribe", "crawl-candidates").load()` and project
  `CAST(value AS STRING) AS url`; everything downstream (dedup state,
  foreachBatch admission, checkpointing) is unchanged. The Kafka jar is
  not in this container, so the file source is the tested path.
- Two dedup layers, mirroring D1's two layers:
  1. WITHIN-STREAM first-occurrence dedup via `applyInPandasWithState`
     keyed by `pmod(xxhash64(url), K)` — K-way parallel state, each group
     holding its bucket's seen-hash set (the streaming analog of the
     bloom-bucketed seen filter; GroupState is Spark-checkpointed).
     A fixed K keeps state shards bounded and colocated — the same
     bucketing discipline as the url_seen table.
  2. AGAINST-TABLES dedup inside `foreachBatch`: each micro-batch runs
     the engine's `admit_candidates` (the very same function the round
     plan uses) against committed url_seen + pending frontier, then
     appends a frontier snapshot — so a crawl round can interleave with a
     live stream at any commit boundary.
- `foreachBatch` is the right sink because admission must join against
  the engine's snapshot tables and assign monotone seqs — per-batch
  batch-DataFrame semantics, atomically committed per micro-batch.

Replaces/extends: src/Service.hs:65-74 (POST /addUrl → canonicalise →
processNextUrl) and src/Initialisation.hs:97-119 (seed ingestion).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.plans import expressions as X
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from crawler_spark.driver import CrawlRun
from crawler_spark.plans.round import admit_candidates, pending_frontier

_DEDUP_SCHEMA = "url string, url_hash bigint, arrival long"
_STATE_SCHEMA = "seen array<bigint>"


def _dedup_group(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """First occurrence per url_hash within this bucket's stream history.

    State = the bucket's sorted seen-hash list. Exactness note: unlike
    D1's bloom (whose false positives fall through to an exact check),
    hash equality IS the dedup key here — a distinct URL colliding on
    xxhash64 with an earlier one (~2^-64 per pair) is dropped by this
    stage and never reaches admission. Acceptable for stream ingestion;
    the crawl's own url_seen dedup stays exact.
    """
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        fresh = pdf[~pdf["url_hash"].isin(seen)]
        first = fresh.drop_duplicates(subset=["url_hash"], keep="first")
        if len(first):
            seen.update(first["url_hash"].tolist())
            yield first[["url", "url_hash", "arrival"]]
    state.update((sorted(seen),))


def dedup_stream(candidates: DataFrame, n_buckets: int = 32) -> DataFrame:
    """Stateful streaming dedup: emit each distinct URL once across the
    whole stream lifetime, K-way parallel by hash bucket."""
    hashed = candidates.withColumn("url_hash", F.xxhash64("url")).withColumn(
        "bucket", F.pmod("url_hash", F.lit(n_buckets))
    )
    return (
        hashed.groupBy("bucket")
        .applyInPandasWithState(
            _dedup_group,
            outputStructType=_DEDUP_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


from pyspark.sql.streaming.stateful_processor import StatefulProcessor

# transformWithStateInPandas speaks protobuf to its JVM state server;
# the container ships no google.protobuf, so the variant is gated (the
# applyInPandasWithState path above has no such dependency)
try:
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAVE_TWS = True
except ImportError:
    HAVE_TWS = False


class _DedupProcessor(StatefulProcessor):
    """transformWithStateInPandas variant of `_dedup_group` (Spark 4.x
    arbitrary-state API). Same semantics: per-bucket seen-hash set, first
    occurrence wins; incremental state via ListState.appendList (only the
    batch's NEW hashes are written, vs applyInPandasWithState rewriting
    the whole set each batch — the reason this variant exists: RocksDB
    changelog checkpointing makes per-batch state deltas O(new), not
    O(total), which is what a long-lived ingest needs)."""

    def init(self, handle) -> None:
        self._seen = handle.getListState("seen", "h BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        seen = set(h for (h,) in self._seen.get()) if self._seen.exists() else set()
        new: list[tuple] = []
        for pdf in rows:
            fresh = pdf[~pdf["url_hash"].isin(seen)]
            first = fresh.drop_duplicates(subset=["url_hash"], keep="first")
            if len(first):
                hashes = first["url_hash"].tolist()
                seen.update(hashes)
                new.extend((int(h),) for h in hashes)
                yield first[["url", "url_hash", "arrival"]]
        if new:
            self._seen.appendList(new)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter([])

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def close(self) -> None:
        pass


def dedup_stream_tws(candidates: DataFrame, n_buckets: int = 32) -> DataFrame:
    """`dedup_stream` on the transformWithStateInPandas API. Requires the
    RocksDB state store provider (caller/session config); state writes are
    per-batch deltas instead of full-set rewrites."""
    if not HAVE_TWS:
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf, which is "
            "not installed; use the applyInPandasWithState path (dedup_stream)"
        )
    proc = _DedupProcessor()
    hashed = candidates.withColumn("url_hash", F.xxhash64("url")).withColumn(
        "bucket", F.pmod("url_hash", F.lit(n_buckets))
    )
    return hashed.groupBy("bucket").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=_DEDUP_SCHEMA,
        outputMode="append",
        timeMode="None",
    )


def kafka_candidates(records: DataFrame) -> DataFrame:
    """Kafka records → URL candidates: `CAST(value AS STRING) AS url`
    plus the deterministic arrival hash (a stream has no meaningful
    within-batch order — files/partitions race — so a value hash makes
    the per-batch FIFO seq assignment reproducible across retries).
    Works on any DataFrame with Kafka's (value: binary) column shape,
    batch or streaming."""
    return records.select(F.expr("CAST(value AS STRING)").alias("url")).select(
        "url", F.xxhash64("url").alias("arrival")
    )


def build_candidate_source(spark: SparkSession, source: dict) -> DataFrame:
    """Config-driven streaming source → (url, arrival) candidates.

    {"format": "text",  "path": dir}                      — tested default
    {"format": "kafka", "options": {"kafka.bootstrap.servers": ...,
                                    "subscribe": "crawl-candidates"}}
        — the production path; requires the spark-sql-kafka package on
          the cluster (not in this container)
    {"format": "kafka-fixture", "options": {rate opts},
     "url_prefix": "http://..."} — the rate source shaped into Kafka's
        (value: binary) schema, so the EXACT kafka_candidates projection
        runs jar-free; the tested stand-in for the kafka path.

    Everything downstream (stateful dedup, foreachBatch admission,
    checkpointing) is source-agnostic.
    """
    fmt = source.get("format", "text")
    options = dict(source.get("options", {}))
    if fmt == "text":
        raw = spark.readStream.format("text").options(**options).load(source["path"])
        return raw.select(
            F.col("value").alias("url"), F.xxhash64("value").alias("arrival")
        )
    if fmt == "kafka":
        reader = spark.readStream.format("kafka")
        for k, v in options.items():
            reader = reader.option(k, v)
        return kafka_candidates(reader.load())
    if fmt == "kafka-fixture":
        rate = spark.readStream.format("rate").options(**options).load()
        shaped = rate.select(
            F.encode(
                F.concat(F.lit(source["url_prefix"]), F.col("value").cast("string")),
                "utf-8",
            ).alias("value")
        )
        return kafka_candidates(shaped)
    raise ValueError(f"unknown candidate source format: {fmt}")


class StreamingIngest:
    """Wires a URL candidate stream into a CrawlRun's frontier."""

    def __init__(self, run: CrawlRun, n_buckets: int = 32):
        self.run = run
        self.n_buckets = n_buckets
        self.batches: list[int] = []  # admitted count per micro-batch

    def _admit_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        run = self.run
        spark = run.spark
        from crawler_spark.functions.urls import register_udfs

        canonicalize_urls, _ = register_udfs()
        canon = (
            batch_df.withColumn("c", canonicalize_urls(X.ws_trim_col(F.col("url"))))
            .select(
                F.col("c.url").alias("url"),
                F.col("c.host").alias("host"),
                F.col("c.error").alias("error"),
                "arrival",
            )
            .where(F.col("error").isNull())
        )
        occ = canon.select(
            "url",
            "host",
            F.lit(0).cast("long").alias("ord_rank"),
            F.col("arrival").alias("ord_sub"),  # arrival order within batch
            F.lit(0).cast("int").alias("prio"),
        )
        seen = run.catalog.url_seen.read(spark).select("url")
        pending = pending_frontier(
            run.catalog.frontier.read(spark), run.catalog.scheduled.read(spark)
        ).select("url")
        fa, _errs = admit_candidates(occ, seen, pending, run.ctx, run.round, run.next_seq)
        n = run.catalog.frontier.append(fa, run.round - 1)
        run.next_seq += n
        # durability barrier: the admitted rows carry seq values, so the
        # advanced next_seq must outlive a crash — without this runs-row
        # commit, resume() would restore a stale counter and later
        # admissions would collide with the streamed seqs
        run._commit_run_row(run.round - 1, pending=-1)
        self.batches.append(n)

    def start(
        self,
        input_dir: str | None = None,
        checkpoint_dir: str = "",
        available_now: bool = True,
        use_tws: bool = False,
        source: dict | None = None,
    ):
        """Consume a candidate stream. Default source: `input_dir` text
        files (one URL per line); pass `source` (build_candidate_source
        config) for kafka / kafka-fixture instead. With
        available_now=True the query drains existing files and stops —
        the deterministic test/drive mode; False = continuous.
        use_tws=True selects the transformWithStateInPandas dedup
        (RocksDB state store, per-batch state deltas)."""
        spark = self.run.spark
        if use_tws:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
            )
        if source is None:
            source = {
                "format": "text",
                "path": input_dir,
                "options": {"maxFilesPerTrigger": "4"},
            }
        raw = build_candidate_source(spark, source)
        dedup = dedup_stream_tws if use_tws else dedup_stream
        deduped = dedup(raw, self.n_buckets).drop("url_hash")
        writer = (
            deduped.writeStream.foreachBatch(self._admit_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
