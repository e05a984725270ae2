"""Per-corpus doc index: the span-free crawl-round fast path.

The decide stage's doc-derived inputs — branch/bad-link routing, the
resolved link array, the content size — are pure functions of the
DOCUMENT, not of the crawl state that reaches it. At 10^10 scale that
makes them a derived table you compute once per corpus, not per round:

    doc_index(doc_id, doc_size, route, links)

- doc_size: F3 content cap input (expressions.doc_size_col)
- route:    True when the doc forces the Python decide loop — branch
            spans (meta/form/cookie), any href outside the fast resolve
            language, or a doc_id outside the fast-canonical language
            (covers POST NUL keys) — same predicate as
            extract.route_python_col, doc-side terms only
- links:    extract.plain-path resolved links (base = doc_id, which IS
            the final URL of every row that fetches this doc), null for
            routed docs (the Python loop recomputes them from spans)

With it the per-round fetch join moves NARROW columns only: span
payloads cross the cluster exactly once per stored doc — at the
crawled_docs write, re-joined from the documents table by key
(plans/round.py). Profiled motivation: the span checkpoint (f_mat) was
the round's largest non-scaling cost (memory-bandwidth memcpy that no
core count absorbs).

Built once at CrawlRun init (seed phase — excluded from round-scaling
measurements, exactly like a real deployment's corpus preprocessing),
written to the state dir, reread as parquet. Deterministic, so resume
simply rebuilds or rereads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.plans import expressions as X
from crawler_spark.plans.extract import (
    _fast_abs,
    _fast_any,
    _BRANCH_KINDS,
    _resolved_links,
)


def build_doc_index(documents: DataFrame) -> DataFrame:
    """(doc_id, doc_size, route, links) — see module docstring."""

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
    return documents.select(
        "doc_id",
        X.doc_size_col(F.col("spans")).alias("doc_size"),
        F.coalesce(route, F.lit(True)).alias("route"),
        F.when(~route, _resolved_links(F.col("doc_id"))).alias("links"),
    )
