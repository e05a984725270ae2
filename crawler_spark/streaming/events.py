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

from pyspark.sql import DataFrame, SparkSession
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
