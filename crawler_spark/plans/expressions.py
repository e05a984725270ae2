"""JVM-side (whole-stage-codegen) column expressions for the hot path.

Everything here compiles to Catalyst expressions — no Python in the hot
path. Each mirrors a pure function in crawl_logic.py (the simulator side);
unit tests assert the two agree on the same inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def include_match_col(url: Column, host: Column, url_patterns: list[str], domain_patterns: list[str]) -> Column:
    """F1 (src/Crawl.hs:214-228): any url-pattern isInfixOf url OR any
    domain-pattern isInfixOf host; empty pattern sets ⇒ reject."""
    cond = F.lit(False)
    for p in url_patterns:
        cond = cond | url.contains(F.lit(p))
    for p in domain_patterns:
        cond = cond | (host.isNotNull() & host.contains(F.lit(p)))
    return cond


def url_path_col(url: Column, host: Column) -> Column:
    """Path(+query) after the first occurrence of host in url — same
    `url.find(host)` semantics as crawl_logic.robots_allowed. '' → '/'."""
    pos = F.instr(url, host)
    path = F.when(pos > 0, F.substring(url, pos + F.length(host), F.lit(2**31 - 1))).otherwise(url)
    return F.when(F.length(path) == 0, F.lit("/")).otherwise(path)


def _best_prefix_len(path: Column, prefixes: Column) -> Column:
    """Length of the longest prefix in `prefixes` that path startswith; -1
    if none. Vectorized over the (small) prefix array."""
    matching = F.filter(
        F.coalesce(prefixes, F.array().cast("array<string>")),
        lambda p: (F.length(p) > 0) & path.startswith(p),
    )
    return F.coalesce(F.array_max(F.transform(matching, F.length)), F.lit(-1))


def robots_allowed_col(path: Column, allow_prefixes: Column, disallow_prefixes: Column) -> Column:
    """Longest-prefix-match wins; tie ⇒ allow; no rule row (null arrays)
    ⇒ allow (north_rule addition; crawl_logic.robots_allowed parity)."""
    return _best_prefix_len(path, allow_prefixes) >= _best_prefix_len(path, disallow_prefixes)


def doc_size_col(spans: Column) -> Column:
    """Simulator _doc_size parity: Σ len(text)+len(media_ref) over spans
    (the engine analog of the 20 MiB body cap, src/HttpUtil.hs:20-25)."""
    return F.aggregate(
        spans,
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.coalesce(F.length(s["text"]), F.lit(0)).cast("long")
        + F.coalesce(F.length(s["media_ref"]), F.lit(0)).cast("long"),
    )


def host_budget_col(per_host_budget: int, crawl_delay: Column) -> Column:
    """crawl_logic.host_budget parity: delay>1 divides the budget,
    floor ≥ 1 (SURVEY.md P7)."""
    base = F.lit(per_host_budget)
    divided = F.greatest(F.lit(1).cast("long"), F.floor(base / crawl_delay))
    return (
        F.when(crawl_delay.isNotNull() & ~F.isnan(crawl_delay) & (crawl_delay > 1.0), divided)
        .otherwise(F.greatest(F.lit(1).cast("long"), base.cast("long")))
        .cast("int")
    )


def host_delay_col(crawl_delay: Column) -> Column:
    """crawl_logic.host_delay_s parity: robots crawl_delay when > 1s,
    else 1.0 (virtual-time politeness, scheduler_mode='timing')."""
    return F.when(
        crawl_delay.isNotNull() & ~F.isnan(crawl_delay) & (crawl_delay > 1.0),
        crawl_delay.cast("double"),
    ).otherwise(F.lit(1.0))


def ws_trim_col(col):
    """Whitespace trim matching Python str.strip() — the reference's trim
    (src/Shared.hs:41-42) removes all whitespace, while Spark's F.trim
    removes only ASCII spaces (a newline-suffixed seed must canonicalize
    like its stripped form, as the simulator does). (?U) switches Java
    regex \\s to UNICODE_CHARACTER_CLASS so NBSP/NEL/other Unicode
    whitespace is stripped exactly like str.strip() does."""
    from pyspark.sql import functions as F

    return F.regexp_replace(col, r"(?U)^\s+|\s+$", "")
