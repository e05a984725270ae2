"""Redirect transitive closure (A1, src/Fetch.hs:46-70).

The reference follows 3xx hops imperatively per fetch, bounded at 20
(src/Settings.hs:17-18). The redirect edge table is static for a run, so
instead of an iterative join every round we precompute the closure ONCE by
pointer doubling on the functional graph (each src has exactly one dst):
ceil(log2(max_redirects))+1 self-joins, then every round's fetch is a
single equi-join against the closure.

Closure row: (src_url, final_url, visited, hops, aborted) where
- visited = the traversal head-first from src (src, hop1, ..., final),
  truncated at max_redirects+1 entries — exactly the simulator's
  `_follow_redirects` visited list on both success and abort;
- aborted ⇔ hops > max_redirects (cycles always abort: their hop count
  keeps doubling past the cap).

Non-redirect URLs are absent: callers treat a join miss as
final=requested, visited=[requested].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_redirect_closure(redirects: DataFrame, max_redirects: int = 20) -> DataFrame:
    """redirects: (src_url, dst_url[, status_code]) with src_url unique."""
    keep = max_redirects + 1  # visited capacity incl. the requested URL
    g = redirects.select(
        F.col("src_url").alias("src"),
        F.col("dst_url").alias("dst"),
        F.array("src_url", "dst_url").alias("visited"),
        F.lit(1).cast("long").alias("hops"),
    )
    # terminal set: dst that are not themselves redirect sources resolve the
    # chain; pointer doubling composes g with itself until 2^k > max.
    steps = 1
    while steps <= max_redirects:
        left = g.alias("l")
        right = g.alias("r")
        composed = (
            left.join(right, F.col("l.dst") == F.col("r.src"), "left")
            .select(
                F.col("l.src").alias("src"),
                F.coalesce(F.col("r.dst"), F.col("l.dst")).alias("dst"),
                F.when(
                    F.col("r.src").isNotNull(),
                    F.slice(
                        F.concat(F.col("l.visited"), F.slice(F.col("r.visited"), 2, keep)),
                        1,
                        keep,
                    ),
                ).otherwise(F.col("l.visited")).alias("visited"),
                F.when(
                    F.col("r.src").isNotNull(), F.col("l.hops") + F.col("r.hops")
                ).otherwise(F.col("l.hops")).alias("hops"),
            )
        )
        g = composed
        steps *= 2
    return g.select(
        F.col("src").alias("src_url"),
        F.col("dst").alias("final_url"),
        "visited",
        "hops",
        (F.col("hops") > F.lit(max_redirects)).alias("aborted"),
    )
