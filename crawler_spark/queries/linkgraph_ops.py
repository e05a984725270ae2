"""Link-graph / crawl-quality operators for the driver correctness gate:
anchor-text aggregation, crawl-trap detection, politeness-compliance
audit, and a df-capped inverted index.

These are the analysis jobs a production crawler runs OVER its own
output — the reference stores documents and links (SURVEY.md §2 S10/H2);
these queries are what the stored link graph is *for*. Same rules as the
other query modules: JVM-only expressions, deterministic synthetic
universes derived from the testdata tables, one DuckDB oracle per query,
integer arithmetic wherever a float could round differently across
engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crawler_spark.queries.crawl_ops import _t
from crawler_spark.queries.pipeline_ops import _docs_tokens, _TOKENS_SQL

# ---------------------------------------------------------------------------
# Shared synthetic link table (lineitem-keyed): one hyperlink per lineitem
# row — src page keyed by (orderkey, linenumber) on a supplier host, dst
# page keyed by partkey on a part host, anchor text picked from a fixed
# vocabulary. Deterministic, join-free to build (row-local projection).
# ---------------------------------------------------------------------------

_ANCHORS = ("click here", "read more", "spark", "details", "home",
            "download", "next page", "archive")


def _links(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    vocab = F.array(*[F.lit(a) for a in _ANCHORS])
    return li.select(
        F.concat(
            F.lit("http://h"), (F.col("l_suppkey") % 23).cast("string"),
            F.lit(".example.org/o"), F.col("l_orderkey").cast("string"),
            F.lit("-"), F.col("l_linenumber").cast("string"),
        ).alias("src"),
        F.concat(F.lit("h"), (F.col("l_suppkey") % 23).cast("string"),
                 F.lit(".example.org")).alias("src_host"),
        F.concat(
            F.lit("http://h"), (F.col("l_partkey") % 29).cast("string"),
            F.lit(".example.org/p"), F.col("l_partkey").cast("string"),
        ).alias("dst"),
        vocab.getItem(
            ((F.col("l_orderkey") + F.col("l_linenumber")) % len(_ANCHORS)).cast("int")
        ).alias("anchor"),
    )


_LINKS_SQL = f"""
    SELECT 'http://h' || CAST(l_suppkey % 23 AS VARCHAR) || '.example.org/o'
               || CAST(l_orderkey AS VARCHAR) || '-'
               || CAST(l_linenumber AS VARCHAR) AS src,
           'h' || CAST(l_suppkey % 23 AS VARCHAR) || '.example.org' AS src_host,
           'http://h' || CAST(l_partkey % 29 AS VARCHAR) || '.example.org/p'
               || CAST(l_partkey AS VARCHAR) AS dst,
           list_value({", ".join("'" + a + "'" for a in _ANCHORS)})
               [CAST((l_orderkey + l_linenumber) % {len(_ANCHORS)} AS INT) + 1]
               AS anchor
    FROM lineitem
"""


# ---------------------------------------------------------------------------
# Anchor-text aggregation: for every link target, the inbound-link count,
# the number of distinct referring hosts, and the dominant anchor string
# (max count, lexicographic tie-break) — the classic signal a search
# indexer derives from a crawl's link store.
#
# Scale shape: ONE shuffle on (dst, anchor) builds the anchor histogram
# with map-side partial aggregation (the anchor vocabulary is tiny per
# target, so partial agg collapses almost everything before the wire);
# the per-dst rollup + top-1 window then partition by dst only — no
# global sort, no driver-side state. Distinct src hosts ride the same
# first shuffle as a count(distinct) re-aggregation.
# ---------------------------------------------------------------------------

def q_anchor_text(spark, sf_dir):
    lk = _links(spark, sf_dir)
    hist = lk.groupBy("dst", "anchor").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("dst").orderBy(F.col("cnt").desc(), F.col("anchor"))
    per_dst = hist.withColumn("rk", F.row_number().over(w))
    totals = hist.groupBy("dst").agg(F.sum("cnt").alias("n_links"))
    top = per_dst.where(F.col("rk") == 1).select(
        "dst", F.col("anchor").alias("top_anchor"), F.col("cnt").alias("top_anchor_count")
    )
    n_hosts = lk.groupBy("dst").agg(F.countDistinct("src_host").alias("n_src_hosts"))
    return (
        totals.join(n_hosts, "dst")
        .join(top, "dst")
        .select("dst", "n_links", "n_src_hosts", "top_anchor", "top_anchor_count")
        .orderBy("dst")
    )


ORACLE_ANCHOR_TEXT = f"""
    WITH lk AS ({_LINKS_SQL}),
    hist AS (
      SELECT dst, anchor, count(*) AS cnt FROM lk GROUP BY 1, 2
    ),
    ranked AS (
      SELECT dst, anchor, cnt, row_number() OVER (
        PARTITION BY dst ORDER BY cnt DESC, anchor
      ) AS rk FROM hist
    )
    SELECT t.dst, t.n_links, h.n_src_hosts, r.anchor AS top_anchor,
           r.cnt AS top_anchor_count
    FROM (SELECT dst, count(*) AS n_links FROM lk GROUP BY 1) t
    JOIN (SELECT dst, count(DISTINCT src_host) AS n_src_hosts FROM lk GROUP BY 1) h
      USING (dst)
    JOIN ranked r ON r.dst = t.dst AND r.rk = 1
    ORDER BY t.dst
"""


# ---------------------------------------------------------------------------
# Crawl-trap detection: hosts whose URL count grows geometrically with
# path depth (calendar pages, session-id explosions, infinite facet
# grids). Per (host, depth) counts from the frontier, then per host the
# worst consecutive-depth growth ratio; hosts whose worst ratio clears
# the threshold are flagged with the depth where the explosion starts.
#
# Ratio is integer parts-per-hundred (100*next div cur) so both engines
# agree bit-exactly. Scale shape: one (host, depth) groupBy shuffle, one
# per-host window (host cardinality ≪ URL cardinality, and the windowed
# relation is the *aggregated* counts table — tiny), no self-join.
# ---------------------------------------------------------------------------

TRAP_RATIO_PCT = 200  # flag when some depth has ≥ 2× the URLs of the previous


def _frontier_depth(spark, sf_dir):
    """URL-per-order frontier; depth = o_orderkey % 6, host = o_custkey % 19.
    The modulus mix plants a handful of hosts whose deep levels dominate."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 19).cast("string"),
                 F.lit(".example.org")).alias("host"),
        ((F.col("o_orderkey") % 6) + (F.col("o_custkey") % 3)).cast("int").alias("depth"),
    )


_FRONTIER_DEPTH_SQL = """
    SELECT 'h' || CAST(o_custkey % 19 AS VARCHAR) || '.example.org' AS host,
           CAST(o_orderkey % 6 + o_custkey % 3 AS INT) AS depth
    FROM orders
"""


def q_crawl_traps(spark, sf_dir):
    fd = _frontier_depth(spark, sf_dir)
    counts = fd.groupBy("host", "depth").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("host").orderBy("depth")
    grown = counts.select(
        "host", "depth", "n",
        F.lag("n").over(w).alias("prev_n"),
        F.lag("depth").over(w).alias("prev_depth"),
    ).where(
        F.col("prev_n").isNotNull()
        & (F.col("prev_depth") == F.col("depth") - 1)  # only adjacent depths
    ).withColumn("ratio_pct", F.expr("(100 * n) div prev_n"))
    worst = grown.groupBy("host").agg(
        F.max("ratio_pct").alias("worst_ratio_pct"),
        F.min(
            F.when(F.col("ratio_pct") >= TRAP_RATIO_PCT, F.col("depth"))
        ).alias("first_trap_depth"),
    )
    return (
        worst.where(F.col("worst_ratio_pct") >= TRAP_RATIO_PCT)
        .select("host", "worst_ratio_pct", "first_trap_depth")
        .orderBy("host")
    )


ORACLE_CRAWL_TRAPS = f"""
    WITH fd AS ({_FRONTIER_DEPTH_SQL}),
    counts AS (SELECT host, depth, count(*) AS n FROM fd GROUP BY 1, 2),
    grown AS (
      SELECT host, depth, n,
             lag(n) OVER (PARTITION BY host ORDER BY depth) AS prev_n,
             lag(depth) OVER (PARTITION BY host ORDER BY depth) AS prev_depth
      FROM counts
    ),
    ratios AS (
      SELECT host, depth, (100 * n) // prev_n AS ratio_pct
      FROM grown
      WHERE prev_n IS NOT NULL AND prev_depth = depth - 1
    ),
    worst AS (
      SELECT host, max(ratio_pct) AS worst_ratio_pct,
             min(CASE WHEN ratio_pct >= {TRAP_RATIO_PCT} THEN depth END)
               AS first_trap_depth
      FROM ratios GROUP BY 1
    )
    SELECT host, worst_ratio_pct, CAST(first_trap_depth AS INT) AS first_trap_depth
    FROM worst WHERE worst_ratio_pct >= {TRAP_RATIO_PCT} ORDER BY host
"""


# ---------------------------------------------------------------------------
# Politeness-compliance audit: given a fetch log (host, departure ms) and
# a per-host crawl delay, count the gaps that violate the delay and the
# tightest observed gap — the post-hoc check that a scheduler actually
# honored robots crawl_delay (F6/P7; the timing scheduler's output is
# exactly such a log). Simultaneous fetches to one host (gap 0) count as
# violations whenever the delay is positive.
#
# Scale shape: one per-host window (lag over departure time) — the same
# single shuffle the scheduler itself pays — then a per-host groupBy that
# reuses the partitioning. No joins; the delay is a row-local function of
# the host key here, and would come from the robots table (broadcast) in
# the engine.
# ---------------------------------------------------------------------------

def _fetch_log(spark, sf_dir):
    """Deterministic fetch log: host = o_custkey % 13; departure_ms spreads
    orders over a virtual minute with per-host jitter; delay 100-300 ms."""
    o = _t(spark, sf_dir, "orders")
    host_id = (F.col("o_custkey") % 13).cast("long")
    return o.select(
        F.concat(F.lit("h"), host_id.cast("string"), F.lit(".example.org")).alias("host"),
        ((F.col("o_orderkey") * 37) % 60000 + host_id * 7).cast("long").alias("departure_ms"),
        (F.lit(100) + (host_id % 5) * 50).cast("long").alias("crawl_delay_ms"),
    )


_FETCH_LOG_SQL = """
    SELECT 'h' || CAST(o_custkey % 13 AS VARCHAR) || '.example.org' AS host,
           CAST((o_orderkey * 37) % 60000 + (o_custkey % 13) * 7 AS BIGINT)
             AS departure_ms,
           CAST(100 + ((o_custkey % 13) % 5) * 50 AS BIGINT) AS crawl_delay_ms
    FROM orders
"""


def audit_politeness_log(log):
    """Per-host crawl-delay honor check over a fetch log of
    (host, departure_ms, crawl_delay_ms) rows: inter-fetch gaps via one
    window, violations = gaps shorter than the host's crawl delay.

    Shared by the driver query (synthetic log below) and the
    closed-loop test that audits a REAL `scheduler_mode='timing'`
    crawl's scheduled table (tests/test_plans_units.py) — the scheduler
    that PRODUCES departure times and the auditor that CHECKS them are
    independent code paths, so a green audit is evidence, not tautology.
    Scale shape: one hash-partitioned window + one groupBy on the same
    key — a single shuffle, no driver collection."""
    w = Window.partitionBy("host").orderBy("departure_ms")
    gaps = log.withColumn("gap_ms", F.col("departure_ms") - F.lag("departure_ms").over(w))
    return (
        gaps.groupBy("host", "crawl_delay_ms")
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.sum(
                F.when(F.col("gap_ms") < F.col("crawl_delay_ms"), 1).otherwise(0)
            ).alias("n_violations"),
            F.min("gap_ms").alias("min_gap_ms"),
        )
        .select("host", "crawl_delay_ms", "n_fetches", "n_violations", "min_gap_ms")
        .orderBy("host")
    )


def q_politeness_audit(spark, sf_dir):
    return audit_politeness_log(_fetch_log(spark, sf_dir))


ORACLE_POLITENESS_AUDIT = f"""
    WITH log AS ({_FETCH_LOG_SQL}),
    gaps AS (
      SELECT host, crawl_delay_ms,
             departure_ms - lag(departure_ms) OVER (
               PARTITION BY host ORDER BY departure_ms
             ) AS gap_ms
      FROM log
    )
    SELECT host, crawl_delay_ms, count(*) AS n_fetches,
           CAST(sum(CASE WHEN gap_ms < crawl_delay_ms THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations,
           min(gap_ms) AS min_gap_ms
    FROM gaps GROUP BY 1, 2 ORDER BY host
"""


# ---------------------------------------------------------------------------
# Inverted index with a document-frequency cap: token-bigram term →
# sorted posting list over the documents table, SKIPPING terms whose df
# exceeds INDEX_MAX_DF (stop terms produce postings proportional to the
# corpus — the cap is what keeps the widest row bounded at 100 TB, the
# same df-discipline as the ngram dedup's NGRAM_MAX_DF). Bigrams rather
# than unigrams so the synthetic vocabulary actually exercises BOTH
# sides of the cap (at sf0.001: ~886 terms kept, ~30 dropped).
#
# Scale shape: one (term, doc_id) distinct shuffle, one term groupBy that
# computes df and the posting array together; the df filter happens in
# the SAME aggregation (no second pass over the exploded table). Posting
# arrays are ≤ INDEX_MAX_DF elements by construction; the bigram build
# is a row-local JVM higher-order function (no Python).
# ---------------------------------------------------------------------------

INDEX_MAX_DF = 40

_BIGRAMS_SPARK = (
    "transform(sequence(0, size(tokens) - 2), "
    "i -> lower(concat(tokens[i], ' ', tokens[i + 1])))"
)


def q_inverted_index(spark, sf_dir):
    toks = (
        _docs_tokens(spark, sf_dir)
        .where(F.size("tokens") >= 2)  # cheap guard BEFORE the HOF chain
        .select("doc_id", F.explode(F.expr(_BIGRAMS_SPARK)).alias("term"))
        .distinct()
    )
    idx = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sort_array(F.collect_list("doc_id")).alias("postings_arr"),
    )
    # postings is emitted as a comma-joined string, not array<bigint>:
    # the driver's value hasher canonicalizes via pandas sort_values,
    # which cannot hash list cells — all contract outputs must be scalar.
    return (
        idx.where(F.col("df") <= INDEX_MAX_DF)
        .select(
            "term",
            "df",
            F.array_join(
                F.transform("postings_arr", lambda x: x.cast("string")), ","
            ).alias("postings"),
        )
        .orderBy("term")
    )


ORACLE_INVERTED_INDEX = f"""
    WITH big AS (
      SELECT doc_id,
             list_transform(range(1, len(tokens)),
                            i -> lower(tokens[i] || ' ' || tokens[i + 1])) AS terms
      FROM ({_TOKENS_SQL}) WHERE len(tokens) >= 2
    ),
    toks AS (
      SELECT DISTINCT doc_id, unnest(terms) AS term FROM big
    ),
    idx AS (
      SELECT term, count(*) AS df,
             array_to_string(list_sort(list(doc_id)), ',') AS postings
      FROM toks GROUP BY 1
    )
    SELECT term, df, postings FROM idx WHERE df <= {INDEX_MAX_DF} ORDER BY term
"""


# ---------------------------------------------------------------------------
# BM25 top-k retrieval over the documents table — the query-side twin of
# the inverted index above (index = build time, this = serve/analytics
# time; together they are the IR loop a crawler's stored corpus feeds).
#
# All arithmetic is INTEGER fixed-point so the DuckDB oracle is bit-exact:
# k1=1.2 and b=0.75 carried in milli units, the tf saturation ratio in
# micro units, every division a floor `div` applied in the same order on
# both engines (all operands positive => floor == truncate on both). The
# idf is the rational variant idf_milli = 1000*(N-df+1) div (df+1) — an
# ln-free rarity weight, because Java's and C's log() need not agree in
# the last bit and one ulp would flip the value hash.
#
# Scale shape: tf for the (constant) query terms is computed ROW-LOCALLY
# with array HOFs — no explode, no (doc, term) shuffle; corpus stats
# (N, total length, per-term df) collapse in ONE aggregate whose single
# row broadcasts back; the only other movement is the global top-k
# (TakeOrdered — never a full sort at 10^10 docs).
# ---------------------------------------------------------------------------

BM25_QUERY_TERMS = ("spark", "merge", "window")
BM25_K1_MILLI = 1200  # k1 = 1.2
BM25_B_MILLI = 750    # b = 0.75
BM25_TOP_K = 20


def q_bm25_topk(spark, sf_dir):
    def tf_of(term):
        # a dedicated closure, NOT a default-arg lambda: pyspark decides a
        # HOF lambda's meaning by its ARITY, so `lambda t, term=term:`
        # would be treated as the (element, index) form and bind the array
        # index to `term`
        return F.size(F.filter("tokens", lambda t: F.lower(t) == F.lit(term)))

    toks = _docs_tokens(spark, sf_dir).select(
        "doc_id", F.size("tokens").alias("dl"),
        *[tf_of(term).alias(f"tf{i}") for i, term in enumerate(BM25_QUERY_TERMS)],
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(BM25_QUERY_TERMS))
        ],
    )
    scored = toks.join(F.broadcast(stats))
    # avgdl in milli; len_factor_milli = 1000*(1 - b + b*dl/avgdl)
    scored = scored.withColumn(
        "avgdl_milli", F.expr("(1000 * total_dl) div n_docs")
    ).withColumn(
        # cast(dl) first: dl/tf are INT (F.size) and Spark int literals are
        # int32 — an uncast product overflows under ANSI mode
        "lf_milli",
        F.expr(
            f"1000 - {BM25_B_MILLI} + "
            f"({BM25_B_MILLI} * cast(dl as bigint) * 1000) div avgdl_milli"
        ),
    )
    score = None
    for i in range(len(BM25_QUERY_TERMS)):
        term_score = F.expr(
            f"((1000 * (n_docs - df{i} + 1)) div (df{i} + 1))"      # idf_milli
            f" * ((1000000 * cast(tf{i} as bigint) * ({BM25_K1_MILLI} + 1000)) div "
            f"(cast(tf{i} as bigint) * 1000 + ({BM25_K1_MILLI} * lf_milli) div 1000))"
            f" div 1000"  # tf part (micro)
        )
        score = term_score if score is None else score + term_score
    return (
        scored.select("doc_id", "dl", score.alias("score_micro"))
        .orderBy(F.desc("score_micro"), "doc_id")
        .limit(BM25_TOP_K)
    )


def _bm25_oracle() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(tokens, t -> lower(t) = '{term}')) AS tf{i}"
        for i, term in enumerate(BM25_QUERY_TERMS)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(BM25_QUERY_TERMS))
    )
    score = " + ".join(
        f"((1000 * (n_docs - df{i} + 1)) // (df{i} + 1))"
        f" * ((1000000 * tf{i} * ({BM25_K1_MILLI} + 1000)) // "
        f"(tf{i} * 1000 + ({BM25_K1_MILLI} * lf_milli) // 1000)) // 1000"
        for i in range(len(BM25_QUERY_TERMS))
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, len(tokens) AS dl, {tf_cols}
      FROM ({_TOKENS_SQL})
    ),
    stats AS (
      SELECT count(*) AS n_docs, sum(dl) AS total_dl, {df_cols} FROM toks
    ),
    scored AS (
      SELECT t.*, s.*,
             (1000 * s.total_dl) // s.n_docs AS avgdl_milli,
             1000 - {BM25_B_MILLI}
               + ({BM25_B_MILLI} * t.dl * 1000)
                 // ((1000 * s.total_dl) // s.n_docs) AS lf_milli
      FROM toks t CROSS JOIN stats s
    )
    SELECT doc_id, dl, CAST({score} AS BIGINT) AS score_micro
    FROM scored
    ORDER BY score_micro DESC, doc_id
    LIMIT {BM25_TOP_K}
"""


ORACLE_BM25_TOPK = _bm25_oracle()


QUERIES = {
    "bm25_topk": q_bm25_topk,
    "anchor_text": q_anchor_text,
    "crawl_traps": q_crawl_traps,
    "politeness_audit": q_politeness_audit,
    "inverted_index": q_inverted_index,
}

ORACLES = {
    "anchor_text": ORACLE_ANCHOR_TEXT,
    "crawl_traps": ORACLE_CRAWL_TRAPS,
    "politeness_audit": ORACLE_POLITENESS_AUDIT,
    "inverted_index": ORACLE_INVERTED_INDEX,
    "bm25_topk": ORACLE_BM25_TOPK,
}


# ---------------------------------------------------------------------------
# distinct_sketch: per-host distinct-URL cardinality via a KMV (k minimum
# values) sketch — the frontier-size / per-host-inventory estimator a
# crawler scheduler consults without counting exactly (Bar-Yossef et al.,
# "Counting distinct elements in a data stream", RANDOM'02 — public
# method). KMV over the md5-hex->bigint 60-bit hash is fully
# DETERMINISTIC, so unlike HLL both engines reproduce the sketch and the
# estimate bit-exactly; that's why KMV gates here while production would
# as happily use Spark's native approx_count_distinct.
#
# estimate = (K-1) / kth_min_normalized. To stay inside int64 the
# division runs first: est = (2^60 div kth) * (K-1) — same integer ops
# both engines, deterministic parity preserved (slightly coarser than
# the real-valued estimator; the oracle computes the identical value).
# Hosts with fewer than K distinct hashes report their exact count.
# (K=32, host%4 chosen so the estimator branch fires at every test sf.)
#
# Scale shape: dedup + ONE host-keyed exchange; the row_number window
# keeps only K rows per host before the final agg. (At 100 TB the sketch
# is mergeable: per-partition partial min-K then merge — the window
# formulation here is the small-cluster equivalent with the same
# output.) n_exact rides along to make estimator error visible.
# ---------------------------------------------------------------------------

_KMV_K = 32
_KMV_DOMAIN = 1 << 60


def q_distinct_sketch(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # part-keyed dst pages: many lineitems share a part -> real duplicates
    urls = li.select(
        (F.col("l_partkey") % 4).cast("long").alias("host"),
        F.concat(F.lit("/p"), F.col("l_partkey").cast("string")).alias("path"),
    )
    hashed = urls.select(
        "host",
        F.conv(F.substring(F.md5(F.col("path")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    ).dropDuplicates(["host", "h"])
    w = Window.partitionBy("host").orderBy("h")
    mink = (
        hashed.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= _KMV_K)
        .groupBy("host")
        .agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("k_eff"))
    )
    exact = hashed.groupBy("host").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        mink.join(exact, "host")
        .select(
            "host",
            "n_exact",
            "k_eff",
            "kth",
            F.when(F.col("k_eff") < _KMV_K, F.col("k_eff"))
            .otherwise(
                F.expr(f"({_KMV_DOMAIN}L div kth) * {_KMV_K - 1}")
            )
            .cast("long")
            .alias("est"),
        )
        .orderBy("host")
    )


ORACLE_DISTINCT_SKETCH = f"""
    WITH urls AS (
      SELECT CAST(l_partkey % 4 AS BIGINT) AS host,
             concat('/p', CAST(l_partkey AS VARCHAR)) AS path
      FROM lineitem
    ),
    hashed AS (
      SELECT DISTINCT host,
             ('0x' || substr(md5(path), 1, 15))::BIGINT AS h
      FROM urls
    ),
    ranked AS (
      SELECT host, h,
             row_number() OVER (PARTITION BY host ORDER BY h) AS r
      FROM hashed
    ),
    mink AS (
      SELECT host, max(h) AS kth, count(*) AS k_eff
      FROM ranked WHERE r <= {_KMV_K} GROUP BY host
    ),
    exact AS (
      SELECT host, count(*) AS n_exact FROM hashed GROUP BY host
    )
    SELECT m.host,
           CAST(e.n_exact AS BIGINT) AS n_exact,
           CAST(m.k_eff AS BIGINT) AS k_eff,
           m.kth,
           CAST(CASE WHEN m.k_eff < {_KMV_K} THEN m.k_eff
                ELSE ({_KMV_DOMAIN} // m.kth) * {_KMV_K - 1} END AS BIGINT)
             AS est
    FROM mink m JOIN exact e ON e.host = m.host
    ORDER BY m.host
"""

QUERIES["distinct_sketch"] = q_distinct_sketch
ORACLES["distinct_sketch"] = ORACLE_DISTINCT_SKETCH
