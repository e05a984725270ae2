"""Streaming windowed event aggregation with watermarked late-data
handling (SURVEY.md §2.8 streaming row; the streaming twin of the batch
`event_window` query).

Shape: file-source parquet stream of `events` rows → 10-minute watermark
on `ts` → tumbling 1-hour window × event_type aggregation → append-mode
sink. The watermark bounds state: a window's aggregate is emitted (and its
state dropped) once the watermark passes its end, and events arriving
later than the watermark are discarded — the streaming trade the batch
query never has to make.

Late-data semantics are therefore EXACTLY Spark's: within one availableNow
drain, files are processed in listing order, so events that are >10 min
older than the max ts already seen in a previous micro-batch can be
dropped. The test exploits this to prove the watermark is live (a
straggler file with stale events does not change emitted windows), and
that an in-watermark straggler DOES update its window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Tumbling 1-hour window per event_type. Works on BOTH a batch and a
    streaming DataFrame — the plan is identical modulo the watermark, so
    the batch run doubles as the oracle for the streamed run."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_cents",
        )
    )


def sessionized_event_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-user session windows with a gap timeout (the streaming twin of
    the batch `event_sessions` query). Works on BOTH batch and streaming
    DataFrames: streaming adds the watermark, which is what lets Spark
    CLOSE a session (emit + drop state) once no event can extend it —
    unbounded-session state is the failure mode a 100-TB event stream
    cannot afford. Open sessions merge across micro-batches until the
    watermark passes session_end."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def run_streaming_sessions(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
):
    """availableNow drain of `input_dir` into an in-memory sink of CLOSED
    sessions (append mode: a session row is emitted exactly once, when the
    watermark passes its end)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    agg = sessionized_event_counts(stream, gap, watermark)
    return (
        agg.writeStream.format("memory")
        .queryName("sessionized_events")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_streaming_window(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    max_files_per_trigger: int = 1,
):
    """Drain `input_dir` parquet files as a stream (one file per
    micro-batch so the watermark actually advances between files) into an
    in-memory sink; returns the started query (availableNow)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    agg = windowed_event_counts(stream, watermark)
    return (
        agg.writeStream.format("memory")
        .queryName("windowed_events")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dedup_events(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Exactly-once event admission by event_id — the streaming twin of
    the batch `event_dedup_windowed` discipline. On a stream this is
    dropDuplicatesWithinWatermark: the dedup key's state is EVICTED once
    the watermark passes the event's ts + delay, which is the only way
    per-key dedup state stays bounded on an unbounded stream (the same
    window-bound trade the batch query's (user, type, hour) key encodes).
    On a batch frame it keeps the FIRST row per event_id (min ts, value
    as tiebreak) — deterministic, and the same survivor the streaming
    path admits (first arrival), so the batch oracle cannot diverge from
    the stream when duplicate event_ids carry different payloads."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    w = Window.partitionBy("event_id").orderBy("ts", "value")
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def run_streaming_dedup(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
):
    """availableNow drain of `input_dir` through the watermarked dedup
    into an in-memory sink (one file per micro-batch so the watermark
    advances between files and state eviction is observable)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    deduped = dedup_events(stream, watermark)
    return (
        deduped.writeStream.format("memory")
        .queryName("deduped_events")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
