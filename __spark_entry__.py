"""Driver contract for the spark-graft builder (PySpark target).

- entry(spark): flagship query — the engine's core frontier pipeline
  (candidate dedup anti-join → polite per-host window schedule → global
  fetch rank) over a frontier synthesized from sf0.001 testdata.
- queries()/oracle_sql(): one entry per implemented operator from
  SURVEY.md §2 plus the training-data pipeline ops, each with a DuckDB
  oracle (see crawler_spark/queries/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: schedule one polite crawl round from a synthetic frontier
    (lineitem-derived) against a URL-seen set (orders-derived) — the D1 →
    P2/P6 → global-rank spine of the crawl engine on sf0.001 parquet."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crawler_spark.plans.ranking import global_rank

    sf_dir = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    frontier = li.select(
        F.concat(F.lit("http://h"), (F.col("l_suppkey") % 23).cast("string"),
                 F.lit(".example.org/o"), F.col("l_orderkey").cast("string"),
                 F.lit("-"), F.col("l_linenumber").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("l_suppkey") % 23).cast("string"),
                 F.lit(".example.org")).alias("host"),
        (F.col("l_linenumber") % 3).alias("priority"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("seq"),
    ).distinct()
    seen = orders.select(
        F.concat(F.lit("http://h"), (F.col("o_custkey") % 23).cast("string"),
                 F.lit(".example.org/o"), F.col("o_orderkey").cast("string"),
                 F.lit("-1")).alias("url")
    ).distinct()

    pending = frontier.join(seen, "url", "left_anti")  # D1 url_seen anti-join
    admitted = pending.withColumn(  # P2 polite per-host FIFO, budget 3
        "host_rank",
        F.row_number().over(Window.partitionBy("host").orderBy("priority", "seq")),
    ).where(F.col("host_rank") <= 3)
    return global_rank(admitted, ["priority", "seq", "url"], "rank").select(
        "url", "host", "priority", "seq", "host_rank", "rank"
    ).orderBy("rank")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crawler_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from crawler_spark.queries import all_oracles

    return all_oracles()
