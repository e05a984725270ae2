"""Scale-safe deterministic global ranking.

`row_number().over(Window.orderBy(...))` collapses to a single partition —
fine for a demo, fatal at 10^10 rows. This helper computes the identical
1-based dense global ordering with a range-partitioned sort plus
per-partition offsets (two jobs, no single-partition shuffle), the same
technique as `zipWithIndex` but staying in the DataFrame API.

Used for: the admitted-batch global fetch rank (SURVEY.md §2.6 — the
round analog of the reference's nondeterministic thread interleaving,
re-specified as (priority, seq) order per §3.4), and FIFO `seq`
assignment at discovery (src/PoliteQueue.hs:30 TQueue order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


RANK_BUCKETS = 256


def rank_bucket(minor, minor_max: int, major=None):
    """Monotone bucket id for `global_rank(bucket=...)` from a KNOWN key
    domain: `minor` (unique-ish non-negative long, e.g. seq or fetch rank)
    is width-bucketed into <= RANK_BUCKETS+1 ranges, optionally prefixed
    by a small leading sort column (e.g. priority). Monotone in
    (major, minor) lexicographic order by construction: the minor bucket
    never exceeds RANK_BUCKETS, so `major * (RANK_BUCKETS+1)` strictly
    dominates. Per-bucket row count is bounded by the width (minor is
    unique per row in our callers) — the same bound repartitionByRange's
    sampler gives, without the sampling job."""
    width = max(1, (int(minor_max) + RANK_BUCKETS - 1) // RANK_BUCKETS)
    b = F.least(F.floor(minor.cast("long") / F.lit(width)), F.lit(RANK_BUCKETS)).cast("long")
    if major is not None:
        b = major.cast("long") * F.lit(RANK_BUCKETS + 1) + b
    return b


def global_cumsum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str,
    bucket=None,
) -> DataFrame:
    """Append `out_col` = exclusive global running sum of `val_col` in
    `order_col` order (sum of all STRICTLY-PRECEDING rows' values).

    Contract (same as global_rank's): `order_col` must be UNIQUE per row
    and NON-NULL — ties make the intra-tie exclusive sums framing-order
    dependent, and a NULL key (hence NULL bucket) would be silently
    dropped by the inner offsets join rather than summed.

    Same two-level shape as global_rank's bucket path: `bucket` must be a
    Column MONOTONE in `order_col` ((k1 < k2) ⇒ (b1 <= b2)); intra-bucket
    prefix sums run as hash-partitioned windows, per-bucket totals get one
    tiny O(#buckets) cumulative window, offsets broadcast back. The corpus
    never passes through a single partition — the thing a naive
    Window.orderBy over the whole table would do. (Kept separate from
    global_rank: the rank path is crawl-hot-path-validated and its
    count-based offsets don't share a numeric column with this one.)
    """
    if bucket is None:
        bucket = F.col(order_col)
    d = df.withColumn("_cb", bucket.cast("long"))
    w_in = (
        Window.partitionBy("_cb").orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn("_intra", F.coalesce(F.sum(val_col).over(w_in), F.lit(0)))
    offs = (
        d.groupBy("_cb").agg(F.sum(val_col).alias("_bsum"))
        .withColumn(
            "_boff",
            F.coalesce(
                F.sum("_bsum").over(
                    Window.partitionBy(F.lit(0))
                    .orderBy("_cb")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_cb", "_boff")
    )
    return (
        d.join(F.broadcast(offs), "_cb")
        .withColumn(out_col, (F.col("_intra") + F.col("_boff")).cast("long"))
        .drop("_cb", "_intra", "_boff")
    )


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    out_col: str,
    start: int = 1,
    materialize_input: bool = False,
    bucket=None,
) -> DataFrame:
    """Append `out_col` = 1-based global rank by `order_cols` (+start-1).

    The order key must be unique per row (ours always ends in `seq` or an
    extraction-order tiebreak), so the ranking is total and deterministic.

    materialize_input: repartitionByRange runs a SAMPLING job over its
    child before the shuffle, so an expensive upstream plan (the
    scheduler's anti-join + windows, the admission pipeline) executes
    twice per rank. Passing True checkpoints the input once so both the
    sample and the shuffle read memory. Leave False when the input is
    already materialized or carries wide payload columns (spans) whose
    duplication in block-manager memory would cost more than the
    recompute.

    bucket: optional Column — a deterministic partition id that is
    MONOTONE in the order key ((k1 < k2) ⇒ (b1 <= b2); build it from a
    known key domain, e.g. `priority * (NB+1) + seq div width`). When
    given, it replaces repartitionByRange entirely: no sampling job, no
    second checkpoint (the id is a pure row function, so re-execution is
    stable by construction), one window shuffle hash-keyed on the bucket.
    Bucket sizes are bounded by the caller's width choice instead of by
    the range sampler — at cluster scale this is the same per-partition
    guarantee, minus two job launches and a full block-manager copy per
    rank. Identical output ranks either way.
    """
    if materialize_input:
        df = df.localCheckpoint()
    if bucket is not None:
        part = df.withColumn("_pid", bucket.cast("long")).withColumn(
            "_prank", F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols))
        )
        offsets = (
            df.groupBy(bucket.cast("long").alias("_pid"))
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .withColumn(
                "_offset",
                F.coalesce(
                    F.sum("_cnt").over(
                        Window.partitionBy(F.lit(0))
                        .orderBy("_pid")
                        .rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ),
            )
            .select("_pid", "_offset")
        )
        return (
            part.join(F.broadcast(offsets), "_pid")
            .withColumn(out_col, (F.col("_prank") + F.col("_offset") + F.lit(start - 1)).cast("long"))
            .drop("_pid", "_prank", "_offset")
        )
    # materialize the range partitioning ONCE: the offsets aggregation and
    # the final join both consume `part`, and without this barrier each
    # would re-execute the range shuffle — AQE may then coalesce the two
    # executions differently, making `_pid` inconsistent between branches
    # (row loss through the offsets join + duplicate ranks)
    ranged = df.repartitionByRange(*[F.col(c) for c in order_cols]).localCheckpoint()
    part = ranged.withColumn(
        "_pid", F.spark_partition_id()
    ).withColumn(
        "_prank", F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols))
    )
    # per-partition counts → cumulative offsets; tiny (one row per partition)
    offsets = (
        part.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_offset",
            # one row per range partition (≤ a few hundred) — the constant
            # partition key just tells Spark this single-group window is
            # intentional (it would otherwise warn)
            F.coalesce(
                F.sum("_cnt").over(
                    Window.partitionBy(F.lit(0))
                    .orderBy("_pid")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    # repartitionByRange sorts partitions by key range, so _pid order == key
    # order and offset+prank is the exact global rank
    return (
        part.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_prank") + F.col("_offset") + F.lit(start - 1)).cast("long"))
        .drop("_pid", "_prank", "_offset")
    )
