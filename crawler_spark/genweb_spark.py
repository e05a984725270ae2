"""Distributed synthetic-web generator (bench-scale webs, Spark-native).

genweb.py builds feature-rich small webs in pure Python (~1.5k docs/sec) —
fine for tests, hopeless for multi-million-doc bench inputs. This
generator builds the same `documents` shape entirely JVM-side from a
`spark.range`: every value is a pure function of the doc index via
xxhash64, so the web is deterministic at any parallelism. Feature knobs
are intentionally minimal (text + link spans, same-host bias, optional
redirect sources); the interaction-branch fixtures stay in genweb.py
where trace-equivalence tests need them.

Layout: `n_hosts` hosts × `pages_per_host` pages,
url = http://host<h>.example.org/p<i>. Links mix same-host (bias) and
cross-host targets, all resolvable against the generated universe, plus a
configurable share of relative hrefs so the resolve path is exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _h(*cols):
    return F.abs(F.xxhash64(*cols))


def generate_spark(
    spark: SparkSession,
    n_docs: int = 2_000_000,
    n_hosts: int = 4000,
    links_per_doc: int = 5,
    text_words: int = 24,
    relative_rate_pct: int = 30,
    seed: int = 42,
) -> DataFrame:
    """→ documents(doc_id, spans) with `links_per_doc` link spans and one
    text span per doc."""
    pages_per_host = n_docs // n_hosts
    base = spark.range(n_docs).select(
        F.col("id"),
        (F.col("id") % n_hosts).alias("h"),
        (F.col("id") / n_hosts).cast("long").alias("p"),
    )
    host = F.concat(F.lit("host"), F.col("h").cast("string"), F.lit(".example.org"))
    url = F.concat(F.lit("http://"), host, F.lit("/p"), F.col("p").cast("string"))

    # deterministic pseudo-text: `text_words` words drawn by hash
    words = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(text_words - 1)),
            lambda i: F.concat(
                F.lit("w"), (_h(F.col("id"), i, F.lit(seed)) % 5000).cast("string")
            ),
        ),
    )
    text_span = F.struct(
        F.lit("text").alias("kind"),
        words.alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset"),
    )

    def link_span(j: int):
        r = _h(F.col("id"), F.lit(j), F.lit(seed + 1))
        same_host = (r % 100) < 60  # same-host bias
        t_host = F.when(same_host, F.col("h")).otherwise(r % n_hosts)
        t_page = _h(F.col("id"), F.lit(j), F.lit(seed + 2)) % pages_per_host
        absolute = F.concat(
            F.lit("http://host"), t_host.cast("string"), F.lit(".example.org/p"),
            t_page.cast("string"),
        )
        relative = F.concat(F.lit("/p"), t_page.cast("string"))  # same-host only
        href = F.when(
            same_host & ((r % 100) < relative_rate_pct), relative
        ).otherwise(absolute)
        return F.struct(
            F.lit("link").alias("kind"),
            href.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(j + 1).alias("offset"),
        )

    spans = F.array(text_span, *[link_span(j) for j in range(links_per_doc)])
    return base.select(url.alias("doc_id"), spans.alias("spans"))


def write_benchweb(
    spark: SparkSession, out_dir: str, n_docs: int, n_hosts: int, **kw
) -> None:
    """Materialize documents + (empty-ish) redirects/robots + seeds."""
    import os

    docs = generate_spark(spark, n_docs=n_docs, n_hosts=n_hosts, **kw)
    docs.repartition(64).write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    # a small redirect table so the closure join path stays exercised
    redirects = spark.range(200).select(
        F.concat(F.lit("http://host0.example.org/r"), F.col("id").cast("string")).alias("src_url"),
        F.concat(
            F.lit("http://host"), (F.col("id") % n_hosts).cast("string"),
            F.lit(".example.org/p0"),
        ).alias("dst_url"),
        F.lit(301).alias("status_code"),
    )
    redirects.coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, "redirects.parquet"))
    robots = spark.range(0, n_hosts, 3).select(
        F.concat(F.lit("host"), F.col("id").cast("string"), F.lit(".example.org")).alias("host"),
        F.array().cast("array<string>").alias("allow_prefixes"),
        F.array(F.lit("/private")).alias("disallow_prefixes"),
        F.when(F.col("id") % 15 == 0, F.lit(2.0)).alias("crawl_delay"),
    )
    robots.coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, "robots_rules.parquet"))
