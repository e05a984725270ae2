"""JVM fast path for the decide stage's common case (SURVEY.md H1-H2).

Most fetched rows are "plain": no cookie spans, no meta-refresh, no
forms, no direction rules in the run, and every extracted href falls in
the *fast resolve language* — the sub-language of hrefs over which the
Python kernels (`functions/urls.resolve` / `canonicalize`) are provably
a trivial string rewrite (their own fast paths: `_FAST_CANON_RE`,
`_FAST_REL_RE`). For those rows the whole disposition — store-time
include filter (F1, src/Crawl.hs:157), link extraction in span order
(H2, src/Parse.hs:47-51), link resolution (U5/U6) — is expressible as
Catalyst expressions, so the rows never cross the Arrow boundary into
Python at all (the span payload stays JVM-side until the crawled_docs
write). Only rows that can take an interaction branch, failed, or carry
an href outside the fast language route through the Python decide loop
(`plans/parse.make_decide`).

Parity contract: for a routed-plain row, the emitted decision row is
value-identical to what the Python loop would have produced. This is
locked three ways: `test_extract_parity` compares both paths row-by-row
over generated webs; the trace-equivalence suite runs full crawls with
the fast path on and off; and the fast-language predicates here are
transliterations of the exact regexes the Python kernels branch on
(urls.py:183,271 — same character classes, same '/.' dot-segment
exclusion, no whitespace/'#'/'%' so trim and href-sanitise are identity
by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_spark.plans import expressions as X

# Java-regex twins of urls._FAST_CANON_RE / _FAST_REL_RE (Python \Z =
# Java \z, absolute end — NOT $, which matches before a final newline).
_FAST_ABS_RE = r"^https?://[a-z0-9][a-z0-9.\-]*(/[A-Za-z0-9/_\-~.]*)?\z"
_FAST_REL_RE = r"^/([A-Za-z0-9_\-~.][A-Za-z0-9/_\-~.]*)?\z"

# span kinds whose presence forces the Python decide path (cookie gates,
# cookie setters, meta-refresh and form branches — src/Crawl.hs:117-152)
_BRANCH_KINDS = ("require_cookie", "set_cookie", "meta_refresh", "form")


def _fast_abs(c: Column) -> Column:
    """c is an absolute URL on which canonicalize is the identity
    (urls.py:263-271): no escapes, no query/fragment, no dot segments."""
    return c.rlike(_FAST_ABS_RE) & ~c.contains("/.")


def _fast_rel(c: Column) -> Column:
    """c is a path-absolute href resolve() rewrites to base-prefix + c
    (urls.py:183,215-218)."""
    return c.rlike(_FAST_REL_RE) & ~c.contains("/.")


def _fast_any(c: Column) -> Column:
    return _fast_abs(c) | _fast_rel(c)


def _strip_post(col: Column) -> Column:
    # POST fetch keys: action URL before the NUL body separator
    # (DownloadRequest.hs:27-33; crawl_logic.strip_post_key)
    return F.substring_index(col, "\x00", 1)


def route_python_col(directions) -> Column:
    """True for fetch-join rows the Python decide loop must handle:
    failures (their error strings live in one place), interaction/cookie
    spans, a base URL outside the fast-canonical language, or any href
    outside the fast resolve language. If the run has href-direction
    rules at all, everything routes to Python — A3 regexes evaluate
    under Python `re`, and probing them with Java `rlike` instead would
    wager row placement on two regex dialects agreeing."""
    if directions:
        return F.lit(True)

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

    needs = (
        F.col("aborted")
        | F.col("spans").isNull()
        | F.col("too_big")
        | F.exists("spans", branch_kind)
        | ~_fast_abs(_strip_post(F.col("final")))
        | F.exists("spans", bad_link)
    )
    return F.coalesce(needs, F.lit(True))


def _resolved_links(final: Column) -> Column:
    """links array for a plain row: spans stable-sorted by offset
    (crawl_logic.sorted_spans = Python stable sort ⇒ key (offset,
    original index)), link/media spans kept in order (H2,
    crawl_logic.extract_raw_links), each href resolved by the fast-path
    rewrite resolve() itself would take (urls.py:215-223): path-absolute
    ⇒ base scheme://host + href, absolute ⇒ identity; kind 'ok',
    message null — exactly the struct the Python loop emits."""
    base_prefix = F.regexp_extract(final, "^(https?://[^/]*)", 1)
    base_host = F.regexp_extract(final, "^https?://([^/]*)", 1)

    indexed = F.transform(
        "spans",
        lambda s, i: F.struct(
            s["offset"].alias("o"),
            i.alias("i"),
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
        ),
    )
    # default array_sort on structs = lexicographic by field order (o, i)
    in_order = F.array_sort(indexed)
    link_spans = F.filter(
        in_order,
        lambda s: F.coalesce(
            ((s["kind"] == F.lit("link")) & s["text"].isNotNull())
            | ((s["kind"] == F.lit("media")) & s["media_ref"].isNotNull()),
            F.lit(False),
        ),
    )

    def resolve_struct(s, j):
        raw = F.when(s["kind"] == F.lit("link"), s["text"]).otherwise(s["media_ref"])
        is_rel = raw.startswith("/")
        return F.struct(
            F.when(is_rel, F.concat(base_prefix, raw)).otherwise(raw).alias("url"),
            F.when(is_rel, base_host)
            .otherwise(F.regexp_extract(raw, "^https?://([^/]*)", 1))
            .alias("host"),
            F.lit("ok").alias("kind"),
            F.lit(None).cast("string").alias("message"),
            j.cast("int").alias("ord"),
        )

    return F.transform(link_spans, resolve_struct)


_SPANS_TYPE = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def plain_decisions(fetched: DataFrame, cfg, links_col: str | None = None) -> DataFrame:
    """Decide-stage output (parse.DECISION_SCHEMA) for plain rows, all
    JVM — value-identical to plans/parse.make_decide on the same rows.

    decision = store_pass / store_drop by the store-time include filter
    on the final redirect target (F1 asymmetry, src/Crawl.hs:157);
    spans/links only on store_pass (store_drop stores nothing, marks
    nothing); plain rows never branch, set no cookies (no set_cookie
    span ⇒ share set None, chain set unchanged), and carry no errors.

    links_col: span-free doc-index mode (plans/doc_index.py) — links were
    precomputed per doc (base = doc_id = final), the rows carry NO spans
    column, and the decision's spans stay null: the crawled_docs write
    re-joins them from the documents table (plans/round.py).
    """
    final = _strip_post(F.col("final"))
    # U7 getDomain on a fast-canonical URL = the netloc group (the Python
    # side computes canonicalize(final)[1]; identical on this language)
    host = F.regexp_extract(final, "^https?://([^/]*)", 1)
    included = X.include_match_col(
        final, host, list(cfg.url_include_patterns), list(cfg.domain_include_patterns)
    )
    chain_sz = F.coalesce(F.size("chain_cookies"), F.lit(0))
    spans_out = (
        F.lit(None).cast(_SPANS_TYPE) if links_col else F.when(included, F.col("spans"))
    )
    links_out = F.when(
        included, F.col(links_col) if links_col else _resolved_links(final)
    )
    return fetched.select(
        F.col("rank").cast("bigint").alias("rank"),
        F.col("scheduled_url"),
        final.alias("final_url"),
        F.when(included, F.lit("store_pass")).otherwise(F.lit("store_drop")).alias("decision"),
        F.lit(None).cast("string").alias("next_url"),
        F.col("hops").cast("int").alias("hops"),
        F.transform("visited", _strip_post).alias("visited"),
        spans_out.alias("spans"),
        links_out.alias("links"),
        F.array().cast("array<struct<kind:string,url:string,message:string>>").alias("errors"),
        F.lit(None).cast("array<string>").alias("cookies"),
        F.when(chain_sz > 0, F.col("chain_cookies")).alias("chain_cookies"),
    )
