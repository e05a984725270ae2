"""Fixed StructType schemas for every engine table (SURVEY.md §1).

The reference fixes its schemas at compile time as Haskell ADTs
(reference: src/Types.hs:18-60); we fix them here as StructTypes. All
URL/host hashing is `xxhash64` (JVM-side), replacing the reference's
`hashWithSalt` (src/Types.hs:68-75).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# Input payload (BASELINE.json:input_hint): interleaved text/media spans.
# Maps the reference's raw page body (src/Types.hs:20) + tagsoup parse
# (src/Parse.hs:40-51). kind ∈ {text, link, media, form, meta_refresh}.
# ---------------------------------------------------------------------------
SPAN = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), False),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),  # canonical URL of the page
        StructField("spans", ArrayType(SPAN), False),
    ]
)

# 3xx edge table for fetch-simulate (src/Fetch.hs:46-70)
REDIRECTS = StructType(
    [
        StructField("src_url", StringType(), False),
        StructField("dst_url", StringType(), False),
        StructField("status_code", IntegerType(), False),
    ]
)

SEEDS = StructType(
    [
        StructField("seq", IntegerType(), False),  # input position (admission order,
        StructField("url", StringType(), False),  # src/Initialisation.hs:113-119)
    ]
)

# north_rule addition — absent in the reference (no robots module exists)
ROBOTS_RULES = StructType(
    [
        StructField("host", StringType(), False),  # host[:port] (src/Urls.hs:100-103)
        StructField("allow_prefixes", ArrayType(StringType()), False),
        StructField("disallow_prefixes", ArrayType(StringType()), False),
        StructField("crawl_delay", DoubleType(), True),
    ]
)

INCLUDE_PATTERNS = StructType(
    [
        StructField("pattern", StringType(), False),  # substring semantics,
        StructField("scope", StringType(), False),  # scope ∈ {url, domain} (src/Crawl.hs:214-228)
    ]
)

FORM_INSTRUCTIONS = StructType(
    [
        StructField("label", StringType(), False),
        StructField("url_regex", StringType(), False),
        StructField("form_action_regex", StringType(), False),
        StructField(
            "params",
            ArrayType(
                StructType(
                    [
                        StructField("key", StringType(), False),
                        StructField("value", StringType(), True),
                    ]
                )
            ),
            False,
        ),
    ]
)

HREF_DIRECTIONS = StructType(
    [
        StructField("label", StringType(), False),
        StructField("url_regex", StringType(), False),
        StructField("href_regex", StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Engine state tables (replace the STM containers, src/Types.hs:24-38)
# ---------------------------------------------------------------------------

# replaces PoliteQueue (src/Types.hs:48-53); bucket-partitioned by host_hash
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", LongType(), False),  # xxhash64(url)
        StructField("host", StringType(), False),
        StructField("host_hash", LongType(), False),
        StructField("priority", IntegerType(), False),  # 0 = seeds; larger = later
        StructField("seq", LongType(), False),  # FIFO order at discovery
        StructField("discovered_round", IntegerType(), False),
        StructField("status", StringType(), False),  # pending | in_progress
    ]
)

# consumption marker for frontier rows (append-only MERGE-free design):
# a frontier row is pending iff its seq is absent here. Replaces the
# reference's queue-pop (src/PoliteQueue.hs:34-64) without rewriting the
# frontier table — at 10^10 scale every state table is append-only and
# bucket-partitioned, so a round commits only deltas.
SCHEDULED = StructType(
    [
        StructField("seq", LongType(), False),
        StructField("url_hash", LongType(), False),
        StructField("url", StringType(), False),
        StructField("round", IntegerType(), False),
        StructField("rank", LongType(), False),  # global fetch rank within round
        # admission priority rides along so the staged write doubles as the
        # round's admitted-batch materialization (depth_priority needs it)
        StructField("priority", IntegerType(), False),
        # consumption watermarks (plans/round.py): the per-host max consumed
        # seq derives from (host, seq) group-maxes over this table, so the
        # crawl log carries the host it charged the fetch to
        StructField("host", StringType(), True),
        # virtual departure timestamp within the round window (timing
        # scheduler mode only; NULL under budget mode) — persisting it
        # makes the politeness honor-check auditable from the crawl log
        # itself instead of a synthetic fetch log
        StructField("departure_ms", LongType(), True),
    ]
)

# replaces getUrlsCompleted/getUrlsFailed (src/Types.hs:35-37);
# bucket-partitioned by url_hash, with a bloom sidecar per bucket
URL_SEEN = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("state", StringType(), False),  # completed | failed
        StructField("round", IntegerType(), False),
    ]
)

# replaces the WARC sink (src/Output.hs, src/WarcDocument.hs:17-45).
# redirect_chain head = final URL, last = originally requested URL
# (src/Fetch.hs:40-43, src/WarcDocument.hs:27)
CRAWLED_DOCS = StructType(
    [
        StructField("url", StringType(), False),  # requested URL (chain last)
        StructField("final_url", StringType(), False),  # chain head
        StructField("redirect_chain", ArrayType(StringType()), False),
        StructField("spans", ArrayType(SPAN), False),
        StructField("round", IntegerType(), False),
        StructField("rank_in_round", IntegerType(), False),
    ]
)

# replaces Loggable + the log queue (src/Types.hs:80-84, src/Errors.hs)
ERRORS = StructType(
    [
        StructField("kind", StringType(), False),  # CrawlWarning|CrawlError|GeneralError
        StructField("url", StringType(), True),
        StructField("message", StringType(), False),
        StructField("round", IntegerType(), False),
    ]
)

METRICS = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("name", StringType(), False),
        StructField("value", DoubleType(), False),
    ]
)

# replaces the global cookie jar (getCookieList, src/Types.hs:32; shared
# at src/Crawl.hs:164-167). Append-only: a row = a cookie's first setter;
# the jar at round r = all rows with round < r (round-boundary re-spec of
# the reference's mid-flight sharing, SURVEY.md §3.4)
SESSION_STATE = StructType(
    [
        StructField("cookie", StringType(), False),
        StructField("url", StringType(), False),  # first setter (final URL)
        StructField("round", IntegerType(), False),
    ]
)

# run/checkpoint bookkeeping — a committed row here is the round barrier
RUNS = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("round", IntegerType(), False),
        StructField("status", StringType(), False),  # running | halted
        StructField("stored_total", LongType(), False),
        StructField("frontier_pending", LongType(), False),
        StructField("next_seq", LongType(), False),  # seq counter carried across rounds
    ]
)

ALL_TABLES = {
    "frontier": FRONTIER,
    "scheduled": SCHEDULED,
    "url_seen": URL_SEEN,
    "crawled_docs": CRAWLED_DOCS,
    "errors": ERRORS,
    "session_state": SESSION_STATE,
    "metrics": METRICS,
    "runs": RUNS,
}
