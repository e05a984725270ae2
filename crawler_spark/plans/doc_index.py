"""Per-corpus doc index: the span-free crawl-round fast path.

The decide stage's doc-derived inputs — branch/bad-link routing, the
resolved link array, the content size — are pure functions of the
DOCUMENT, not of the crawl state that reaches it. At 10^10 scale that
makes them a derived table you compute once per corpus, not per round:

    doc_index(final, doc_size, route, links)

- doc_size: F3 content cap input (expressions.doc_size_col)
- route:    True when the doc forces the Python decide loop — branch
            spans (meta/form/cookie), any href outside the fast resolve
            language, or a doc_id outside the fast-canonical language
            (covers POST NUL keys) — same predicate as
            extract.route_python_col, doc-side terms only
- links:    extract.plain-path resolved links (base = doc_id, which IS
            the final URL of every row that fetches this doc), null for
            routed docs (the Python loop recomputes them from spans)

Storage-partitioned lookup (the Iceberg bucket-join analog)
-----------------------------------------------------------
The index is written ONCE per corpus as parquet hash-bucketed by
pmod(xxhash64(final), N_BUCKETS). Each round the admitted batch's keys
are repartitioned by the same bucket function and an Arrow mapInPandas
stage reads ONLY the matching bucket files and emits the matched index
rows — a distributed semi-reduction whose cost is O(batch)/cores.

This replaced a batch-keys BROADCAST semi-join: the broadcast
hash-relation build is driver-serial and O(batch), which capped the
fetch stage's measured N→4N scaling at ~1.6× once rounds reached
multi-million-URL size (the reduction pattern only pays when the probe
side is small, and a steady-state crawl round is not). On a real
cluster this stage IS an Iceberg storage-partitioned join: the corpus
side is never shuffled and no per-round driver-serial structure exists.

Links are stored as two '\\x1f'-joined string columns (links_urls /
links_hosts) so the Arrow pass moves plain strings — list<struct>
columns decay to per-element Python objects in pandas, which would put
O(batch × links) object churn back on the hop. They are decoded back to
the array<struct> shape by `decode_links_col` (pure Catalyst). The
separator is safe exactly where links are non-null: a href containing
control bytes is outside the fast-resolve language, so its doc is
routed (links = null) and the Python loop recomputes from spans.

Built at CrawlRun init (seed phase — excluded from round-scaling
measurements, exactly like a real deployment's corpus preprocessing),
written under the state dir. Deterministic, so resume simply rebuilds.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_spark.plans import expressions as X
from crawler_spark.plans.extract import (
    _fast_abs,
    _fast_any,
    _BRANCH_KINDS,
    _resolved_links,
)

N_BUCKETS = 64
LINK_SEP = "\x1f"
LOOKUP_SCHEMA = (
    "final string, doc_size bigint, route boolean, "
    "links_urls string, links_hosts string"
)


def build_doc_index(documents: DataFrame) -> DataFrame:
    """(final, doc_size, route, links_urls, links_hosts, bucket) — the
    encoded index rows (see module docstring)."""

    def bad_link(s):
        raw_is_link = (s["kind"] == F.lit("link")) & s["text"].isNotNull()
        raw_is_media = (s["kind"] == F.lit("media")) & s["media_ref"].isNotNull()
        return F.coalesce(
            (raw_is_link & ~_fast_any(s["text"]))
            | (raw_is_media & ~_fast_any(s["media_ref"])),
            F.lit(False),
        )

    def branch_kind(s):
        return F.coalesce(s["kind"].isin(*_BRANCH_KINDS), F.lit(False))

    route = (
        F.exists("spans", branch_kind)
        | F.exists("spans", bad_link)
        | ~_fast_abs(F.col("doc_id"))
    )
    links = F.when(~route, _resolved_links(F.col("doc_id")))
    return documents.select(
        F.col("doc_id").alias("final"),
        X.doc_size_col(F.col("spans")).cast("long").alias("doc_size"),
        F.coalesce(route, F.lit(True)).alias("route"),
        F.array_join(F.transform(links, lambda l: l["url"]), LINK_SEP).alias("links_urls"),
        F.array_join(F.transform(links, lambda l: l["host"]), LINK_SEP).alias("links_hosts"),
        F.pmod(F.xxhash64("doc_id"), F.lit(N_BUCKETS)).cast("int").alias("bucket"),
    )


def write_bucketed_index(documents: DataFrame, path: str) -> None:
    """Materialize the hash-bucketed index parquet (bucket=N dirs)."""
    build_doc_index(documents).write.mode("overwrite").partitionBy("bucket").parquet(path)


def bucket_col(key: Column) -> Column:
    """The index's bucket function, for partitioning the probe side."""
    return F.pmod(F.xxhash64(key), F.lit(N_BUCKETS)).cast("int")


def make_bucket_lookup(path: str):
    """mapInPandas factory: (_bkt, final) probe keys → matched index rows.

    Input must be repartitioned by `_bkt` so each task touches few bucket
    files. Per-partition state: bucket frames are loaded once per task
    (freed with it — no worker-lifetime cache, bucket frames are ~10s of
    MB at bench scale), and a seen-set dedups probe keys across the
    partition's Arrow batches so the emitted relation stays unique per
    final (the consumer runs a left join against it; duplicate rows
    would fan out the batch)."""

    def lookup(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        tables: dict[int, pd.DataFrame] = {}
        seen: set = set()
        cols = ["final", "doc_size", "route", "links_urls", "links_hosts"]
        for pdf in batches:
            out = []
            for b, grp in pdf.groupby("_bkt"):
                tb = tables.get(int(b))
                if tb is None:
                    bdir = os.path.join(path, f"bucket={int(b)}")
                    if os.path.isdir(bdir):
                        tb = pq.read_table(bdir, columns=cols).to_pandas()
                    else:  # corpus has no doc hashing into this bucket
                        tb = pd.DataFrame(columns=cols)
                    tables[int(b)] = tb
                finals = [f for f in grp["final"].unique() if f not in seen]
                if not finals:
                    continue
                seen.update(finals)
                hit = tb[tb["final"].isin(finals)]
                if len(hit):
                    out.append(hit)
            if out:
                yield pd.concat(out, ignore_index=True)

    return lookup


def decode_links_col(urls: Column, hosts: Column) -> Column:
    """Rebuild the array<struct<url,host,kind,message,ord>> link shape
    from the index's joined-string encoding — pure Catalyst, value-equal
    to extract._resolved_links on every non-routed doc."""
    pair = F.arrays_zip(
        F.split(urls, LINK_SEP).alias("u"), F.split(hosts, LINK_SEP).alias("h")
    )
    decoded = F.transform(
        pair,
        lambda s, i: F.struct(
            s["u"].alias("url"),
            s["h"].alias("host"),
            F.lit("ok").alias("kind"),
            F.lit(None).cast("string").alias("message"),
            i.cast("int").alias("ord"),
        ),
    )
    empty = F.array().cast(
        "array<struct<url:string,host:string,kind:string,message:string,ord:int>>"
    )
    return F.when(urls.isNull(), F.lit(None).cast(
        "array<struct<url:string,host:string,kind:string,message:string,ord:int>>"
    )).when(urls == "", empty).otherwise(decoded)
