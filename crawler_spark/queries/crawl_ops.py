"""Crawl-operator queries for the driver correctness gate.

Each query synthesizes a deterministic URL universe from the TPC-H-ish
testdata tables and runs a REAL engine operator over it (the same code
paths the crawl round uses: canonicalize/resolve UDFs, redirect closure,
salted scheduler window, global rank, robots filter). The paired DuckDB
SQL states the expected result independently.

Reference parity notes cite /root/reference/src (see SURVEY.md §2 for the
full mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_spark.plans import expressions as X
from crawler_spark.plans.closure import build_redirect_closure
from crawler_spark.plans.ranking import global_rank


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Shared synthetic URL universe (customer-keyed)
# ---------------------------------------------------------------------------

def _customer_urls(spark, sf_dir):
    """One URL per customer: http://h<k>.example.org/p<id>, k = id % 53."""
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.concat(
            F.lit("http://h"),
            (F.col("c_custkey") % 53).cast("string"),
            F.lit(".example.org/p"),
            F.col("c_custkey").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("h"), (F.col("c_custkey") % 53).cast("string"), F.lit(".example.org")
        ).alias("host"),
    )


_URLS_SQL = """
    SELECT c_custkey AS id,
           'http://h' || CAST(c_custkey % 53 AS VARCHAR) || '.example.org/p'
               || CAST(c_custkey AS VARCHAR) AS url,
           'h' || CAST(c_custkey % 53 AS VARCHAR) || '.example.org' AS host
    FROM customer
"""


# ---------------------------------------------------------------------------
# U1-U4: canonicalization (src/Urls.hs:25-47) — messy variants by id % 5
# ---------------------------------------------------------------------------

def q_canonicalize(spark, sf_dir):
    from crawler_spark.functions.urls import register_udfs

    canonicalize_urls, _ = register_udfs()
    base = _customer_urls(spark, sf_dir)
    messy = base.select(
        "id",
        F.when(  # case normalization: scheme+host lowered, path untouched
            F.col("id") % 5 == 0,
            F.concat(F.lit("HTTP://"), F.upper(F.col("host")), F.lit("/p"), F.col("id").cast("string")),
        )
        .when(
            F.col("id") % 5 == 1,  # default :80 stripped
            F.concat(F.lit("http://"), F.col("host"), F.lit(":80/p"), F.col("id").cast("string")),
        )
        .when(F.col("id") % 5 == 2, F.concat(F.col("url"), F.lit("#frag"), F.col("id").cast("string")))
        .when(
            F.col("id") % 5 == 3,  # dot segments collapsed
            F.concat(F.lit("http://"), F.col("host"), F.lit("/a/../p"), F.col("id").cast("string")),
        )
        .otherwise(F.concat(F.col("url"), F.lit("%41")))  # %41 = unreserved 'A', decoded
        .alias("raw"),
    )
    out = messy.withColumn("c", canonicalize_urls(F.col("raw")))
    return out.select(
        "id", F.col("c.url").alias("url"), F.col("c.host").alias("host")
    ).orderBy("id")


ORACLE_CANONICALIZE = f"""
    WITH urls AS ({_URLS_SQL})
    SELECT id,
           CASE WHEN id % 5 = 4 THEN url || 'A' ELSE url END AS url,
           host
    FROM urls ORDER BY id
"""


# ---------------------------------------------------------------------------
# U5/U6: link resolution (src/Urls.hs:55-98) — href variants by id % 6
# ---------------------------------------------------------------------------

def q_resolve_links(spark, sf_dir):
    from crawler_spark.functions.urls import register_udfs

    _, resolve_links = register_udfs()
    base = _customer_urls(spark, sf_dir)
    hrefs = base.select(
        "id",
        F.col("url").alias("base"),
        F.when(F.col("id") % 6 == 0, F.concat(F.lit("http://hx.example.org/abs"), F.col("id").cast("string")))
        .when(F.col("id") % 6 == 1, F.concat(F.lit("rel"), F.col("id").cast("string")))
        .when(F.col("id") % 6 == 2, F.concat(F.lit("/root"), F.col("id").cast("string")))
        .when(F.col("id") % 6 == 3, F.concat(F.lit("../up"), F.col("id").cast("string")))
        .when(F.col("id") % 6 == 4, F.concat(F.lit("mailto:u"), F.col("id").cast("string"), F.lit("@x.org")))
        .otherwise(F.lit("#frag"))
        .alias("href"),
    )
    out = hrefs.withColumn("r", resolve_links(F.col("base"), F.col("href")))
    return out.select(
        "id", "base", "href", F.col("r.url").alias("url"), F.col("r.kind").alias("kind")
    ).orderBy("id")


ORACLE_RESOLVE_LINKS = f"""
    WITH urls AS ({_URLS_SQL})
    SELECT id, url AS base,
           CASE id % 6
             WHEN 0 THEN 'http://hx.example.org/abs' || CAST(id AS VARCHAR)
             WHEN 1 THEN 'rel' || CAST(id AS VARCHAR)
             WHEN 2 THEN '/root' || CAST(id AS VARCHAR)
             WHEN 3 THEN '../up' || CAST(id AS VARCHAR)
             WHEN 4 THEN 'mailto:u' || CAST(id AS VARCHAR) || '@x.org'
             ELSE '#frag' END AS href,
           CASE id % 6
             WHEN 0 THEN 'http://hx.example.org/abs' || CAST(id AS VARCHAR)
             WHEN 1 THEN 'http://' || host || '/rel' || CAST(id AS VARCHAR)
             WHEN 2 THEN 'http://' || host || '/root' || CAST(id AS VARCHAR)
             WHEN 3 THEN 'http://' || host || '/up' || CAST(id AS VARCHAR)
             WHEN 4 THEN NULL
             ELSE url END AS url,
           CASE WHEN id % 6 = 4 THEN 'warning' ELSE 'ok' END AS kind
    FROM urls ORDER BY id
"""


# ---------------------------------------------------------------------------
# U7: domain extraction incl. userinfo/port (src/Urls.hs:100-103)
# ---------------------------------------------------------------------------

def q_host_extract(spark, sf_dir):
    from crawler_spark.functions.urls import register_udfs

    canonicalize_urls, _ = register_udfs()
    base = _customer_urls(spark, sf_dir)
    raw = base.select(
        "id",
        F.when(
            F.col("id") % 3 == 0,
            F.concat(F.lit("http://u"), F.col("id").cast("string"), F.lit("@"), F.col("host"), F.lit("/p")),
        )
        .when(F.col("id") % 3 == 1, F.concat(F.lit("http://"), F.col("host"), F.lit(":8080/p")))
        .otherwise(F.concat(F.lit("http://"), F.col("host"), F.lit("/p")))
        .alias("raw"),
    )
    out = raw.withColumn("c", canonicalize_urls(F.col("raw")))
    return out.select("id", F.col("c.host").alias("host")).orderBy("id")


ORACLE_HOST_EXTRACT = f"""
    WITH urls AS ({_URLS_SQL})
    SELECT id,
           CASE id % 3
             WHEN 0 THEN 'u' || CAST(id AS VARCHAR) || '@' || host
             WHEN 1 THEN host || ':8080'
             ELSE host END AS host
    FROM urls ORDER BY id
"""


# ---------------------------------------------------------------------------
# D1: URL-seen anti-join (src/Crawl.hs:203-212) — candidates minus seen
# ---------------------------------------------------------------------------

def q_urlseen_antijoin(spark, sf_dir):
    candidates = _customer_urls(spark, sf_dir)
    # seen = a quarter of the order-derived URLs, so the anti-join output
    # is non-trivially non-empty at every sf
    seen = _t(spark, sf_dir, "orders").where("o_orderkey % 4 = 0").select(
        F.concat(
            F.lit("http://h"),
            (F.col("o_custkey") % 53).cast("string"),
            F.lit(".example.org/p"),
            F.col("o_custkey").cast("string"),
        ).alias("url")
    ).distinct()
    return candidates.join(seen, "url", "left_anti").select("id", "url").orderBy("id")


ORACLE_URLSEEN_ANTIJOIN = f"""
    WITH urls AS ({_URLS_SQL}),
    seen AS (
      SELECT DISTINCT 'http://h' || CAST(o_custkey % 53 AS VARCHAR) || '.example.org/p'
             || CAST(o_custkey AS VARCHAR) AS url
      FROM orders WHERE o_orderkey % 4 = 0
    )
    SELECT id, url FROM urls
    WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.url = urls.url)
    ORDER BY id
"""


# ---------------------------------------------------------------------------
# P1-P6: polite scheduler window (src/PoliteQueue.hs:34-64) over a
# lineitem-derived frontier; budget 2 per host per round
# ---------------------------------------------------------------------------

def _frontier_df(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.concat(F.lit("h"), (F.col("l_suppkey") % 23).cast("string")).alias("host"),
        (F.col("l_linenumber") % 3).alias("priority"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("seq"),
    ).distinct()


_FRONTIER_SQL = """
    SELECT DISTINCT 'h' || CAST(l_suppkey % 23 AS VARCHAR) AS host,
           l_linenumber % 3 AS priority,
           l_orderkey * 10 + l_linenumber AS seq
    FROM lineitem
"""

_SCHEDULE_ORACLE = f"""
    WITH frontier AS ({_FRONTIER_SQL}),
    ranked AS (
      SELECT host, priority, seq,
             row_number() OVER (PARTITION BY host ORDER BY priority, seq) AS host_rank
      FROM frontier
    ),
    admitted AS (SELECT * FROM ranked WHERE host_rank <= 2)
    SELECT host, priority, seq, host_rank,
           row_number() OVER (ORDER BY priority, seq, host) AS rank
    FROM admitted ORDER BY rank
"""


def q_schedule_window(spark, sf_dir):
    """Plain per-host window rank (P2/P3) + two-phase global fetch rank."""
    fr = _frontier_df(spark, sf_dir)
    ranked = fr.withColumn(
        "host_rank", F.row_number().over(Window.partitionBy("host").orderBy("priority", "seq"))
    ).where(F.col("host_rank") <= 2)
    return global_rank(ranked, ["priority", "seq", "host"], "rank").orderBy("rank").select(
        "host", "priority", "seq", "host_rank", "rank"
    )


def q_schedule_salted(spark, sf_dir):
    """Same admitted set via the skew-safe two-phase salted window (P6):
    phase 1 ranks within (host, salt) keeping a superset, phase 2 exact.
    Must equal the plain window's result — same oracle."""
    fr = _frontier_df(spark, sf_dir).withColumn(
        "salt", F.pmod(F.xxhash64("seq"), F.lit(8))
    )
    phase1 = fr.withColumn(
        "_r1", F.row_number().over(Window.partitionBy("host", "salt").orderBy("priority", "seq"))
    ).where(F.col("_r1") <= 2)
    phase2 = phase1.withColumn(
        "host_rank", F.row_number().over(Window.partitionBy("host").orderBy("priority", "seq"))
    ).where(F.col("host_rank") <= 2)
    return global_rank(phase2, ["priority", "seq", "host"], "rank").orderBy("rank").select(
        "host", "priority", "seq", "host_rank", "rank"
    )


ROUND_WINDOW_MS = 6000  # virtual round duration for the timing scheduler


def q_schedule_timing(spark, sf_dir):
    """P7 as virtual-TIME politeness (beyond budget division): host h<k>
    has crawl_delay 1+(k%4) seconds; the r-th fetch on a host departs at
    eta_ms = (r-1)*delay*1000 of virtual round time, and only departures
    inside the ROUND_WINDOW_MS window are admitted this round. Global
    fetch order is by departure time, then priority/seq — the order a
    wall-clock scheduler would actually issue requests. Admitted COUNTS
    equal budget = ceil(window/delay) (the division the round plan uses,
    simulator._budget parity), but this yields a per-fetch politeness
    timestamp for auditing/lineage. Same window shapes as the scheduler:
    one per-host rank, no all-pairs, skew-safe under the salted variant."""
    fr = _frontier_df(spark, sf_dir)
    delay_s = F.lit(1) + F.substring("host", 2, 10).cast("int") % 4
    ranked = fr.withColumn(
        "host_rank", F.row_number().over(Window.partitionBy("host").orderBy("priority", "seq"))
    )
    timed = ranked.withColumn(
        "eta_ms", ((F.col("host_rank") - 1) * delay_s * 1000).cast("bigint")
    )
    admitted = timed.where(F.col("eta_ms") < ROUND_WINDOW_MS)
    return (
        global_rank(admitted, ["eta_ms", "priority", "seq", "host"], "rank")
        .orderBy("rank")
        .select("host", "seq", "host_rank", "eta_ms", "rank")
    )


ORACLE_SCHEDULE_TIMING = f"""
    WITH frontier AS ({_FRONTIER_SQL}),
    ranked AS (
      SELECT host, priority, seq,
             row_number() OVER (PARTITION BY host ORDER BY priority, seq) AS host_rank,
             1 + (CAST(SUBSTR(host, 2) AS INT) % 4) AS delay_s
      FROM frontier
    ),
    timed AS (
      SELECT host, priority, seq, host_rank,
             CAST((host_rank - 1) * delay_s * 1000 AS BIGINT) AS eta_ms
      FROM ranked
    ),
    admitted AS (SELECT * FROM timed WHERE eta_ms < {ROUND_WINDOW_MS})
    SELECT host, seq, host_rank, eta_ms,
           row_number() OVER (ORDER BY eta_ms, priority, seq, host) AS rank
    FROM admitted ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Depth-priority assignment: the engine's depth_priority mode gives every
# discovered link (parent depth + 1) as its scheduling priority — i.e. the
# frontier's priority column IS the min BFS depth from the seed set. This
# query computes that assignment as a level-synchronous BFS: a driver loop
# of ≤ DEPTH_CAP equi-join + distinct steps (each level one shuffle on the
# edge key; no all-pairs, no recursion in a single plan), exactly the shape
# a 10^10-edge frontier wants — level k touches only level-k nodes and the
# edges they own. Oracle: DuckDB recursive CTE with the same depth cap;
# both sides dedup (node, depth) pairs per level, so min(depth) matches
# row-for-row.
# ---------------------------------------------------------------------------

DEPTH_CAP = 5  # levels beyond the seeds; bounds both loop and recursion
_BFS_NODES = 16384  # node-id space: sparse at sf0.001, dense by sf0.1
_BFS_SEED_STEP = 257  # seeds = every 257th node id


def _bfs_edges(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") % _BFS_NODES).cast("bigint").alias("src_k"),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber") * 131) % _BFS_NODES)
        .cast("bigint").alias("dst_k"),
    ).distinct()


def q_depth_priority(spark, sf_dir):
    # edges materialized once; every BFS level checkpointed so level d's
    # lineage is O(1), not O(d) — without the barriers each level's plan
    # re-derives all prior levels (O(L²) total work, quadratic at scale)
    edges = _bfs_edges(spark, sf_dir).localCheckpoint()
    level = spark.range(0, _BFS_NODES, _BFS_SEED_STEP).select(
        F.col("id").alias("k"), F.lit(0).alias("depth")
    )
    levels = [level]
    for d in range(1, DEPTH_CAP + 1):
        level = (
            level.join(edges, level["k"] == edges["src_k"])
            .select(F.col("dst_k").alias("k"))
            .distinct()
            .withColumn("depth", F.lit(d))
            .localCheckpoint()
        )
        levels.append(level)
    reached = levels[0]
    for lv in levels[1:]:
        reached = reached.unionByName(lv)
    out = reached.groupBy("k").agg(F.min("depth").alias("depth"))
    return out.select(
        F.concat(
            F.lit("http://h"), (F.col("k") % 23).cast("string"),
            F.lit(".example.org/n"), F.col("k").cast("string"),
        ).alias("url"),
        "depth",
    ).orderBy("url")


ORACLE_DEPTH_PRIORITY = f"""
    WITH RECURSIVE edges AS (
      SELECT DISTINCT CAST(l_orderkey % {_BFS_NODES} AS BIGINT) AS src_k,
             CAST((l_orderkey * 7 + l_linenumber * 131) % {_BFS_NODES} AS BIGINT) AS dst_k
      FROM lineitem
    ),
    r AS (
      SELECT CAST(k AS BIGINT) AS k, 0 AS depth
      FROM range(0, {_BFS_NODES}, {_BFS_SEED_STEP}) t(k)
      UNION
      SELECT e.dst_k AS k, r.depth + 1 AS depth
      FROM r JOIN edges e ON e.src_k = r.k
      WHERE r.depth < {DEPTH_CAP}
    )
    SELECT 'http://h' || CAST(k % 23 AS VARCHAR) || '.example.org/n'
           || CAST(k AS VARCHAR) AS url,
           CAST(MIN(depth) AS INT) AS depth
    FROM r GROUP BY k ORDER BY url
"""


# ---------------------------------------------------------------------------
# F1: include-pattern filter (src/Crawl.hs:214-228)
# ---------------------------------------------------------------------------

def q_include_filter(spark, sf_dir):
    urls = _customer_urls(spark, sf_dir)
    out = urls.where(
        X.include_match_col(F.col("url"), F.col("host"), ["/p1"], ["h7.example", "h13.example"])
    )
    return out.select("id", "url").orderBy("id")


ORACLE_INCLUDE_FILTER = f"""
    WITH urls AS ({_URLS_SQL})
    SELECT id, url FROM urls
    WHERE url LIKE '%/p1%' OR host LIKE '%h7.example%' OR host LIKE '%h13.example%'
    ORDER BY id
"""


# ---------------------------------------------------------------------------
# F6: robots longest-prefix-match (north_rule addition)
# ---------------------------------------------------------------------------

def q_robots_filter(spark, sf_dir):
    urls = _customer_urls(spark, sf_dir).select(
        "id",
        "host",
        F.when(F.col("id") % 4 == 0, F.concat(F.lit("http://"), F.col("host"), F.lit("/private/p1x")))
        .when(F.col("id") % 4 == 1, F.concat(F.lit("http://"), F.col("host"), F.lit("/private/z")))
        .when(F.col("id") % 4 == 2, F.concat(F.lit("http://"), F.col("host"), F.lit("/public/a")))
        .otherwise(F.concat(F.lit("http://"), F.col("host"), F.lit("/p")))
        .alias("url"),
    )
    # rules exist only for hosts with even index: k % 2 = 0
    robots = (
        urls.select("host")
        .distinct()
        .withColumn("_k", F.regexp_extract("host", r"^h(\d+)\.", 1).cast("int"))
        .where(F.col("_k") % 2 == 0)
        .select(
            "host",
            F.array(F.lit("/private/p1")).alias("allow_prefixes"),
            F.array(F.lit("/private")).alias("disallow_prefixes"),
        )
    )
    joined = urls.join(F.broadcast(robots), "host", "left")
    out = joined.withColumn(
        "allowed",
        F.when(F.col("allow_prefixes").isNull(), F.lit(True)).otherwise(
            X.robots_allowed_col(
                X.url_path_col(F.col("url"), F.col("host")),
                F.col("allow_prefixes"),
                F.col("disallow_prefixes"),
            )
        ),
    )
    return out.select("id", "url", "allowed").orderBy("id")


ORACLE_ROBOTS_FILTER = f"""
    WITH urls AS ({_URLS_SQL})
    SELECT id,
           'http://' || host || CASE id % 4
              WHEN 0 THEN '/private/p1x' WHEN 1 THEN '/private/z'
              WHEN 2 THEN '/public/a' ELSE '/p' END AS url,
           CASE WHEN (id % 53) % 2 <> 0 THEN TRUE        -- no rule for host
                WHEN id % 4 = 0 THEN TRUE                -- allow /private/p1 wins (longer)
                WHEN id % 4 = 1 THEN FALSE               -- disallow /private
                ELSE TRUE END AS allowed
    FROM urls ORDER BY id
"""


# ---------------------------------------------------------------------------
# A1: redirect closure (src/Fetch.hs:46-70) — nation-keyed chain n<k> → n0,
# length k; k > 20 aborts (src/Settings.hs:17-18)
# ---------------------------------------------------------------------------

def q_redirect_closure(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    edges = n.where(F.col("n_nationkey") >= 1).select(
        F.concat(F.lit("http://r.example.org/n"), F.col("n_nationkey").cast("string")).alias("src_url"),
        F.concat(F.lit("http://r.example.org/n"), (F.col("n_nationkey") - 1).cast("string")).alias("dst_url"),
        F.lit(301).alias("status_code"),
    )
    closure = build_redirect_closure(edges, max_redirects=20)
    return closure.select(
        "src_url",
        F.when(F.col("aborted"), F.lit(None)).otherwise(F.col("final_url")).alias("final_url"),
        "aborted",
    ).orderBy("src_url")


ORACLE_REDIRECT_CLOSURE = """
    WITH RECURSIVE edges AS (
      SELECT 'http://r.example.org/n' || CAST(n_nationkey AS VARCHAR) AS src_url,
             'http://r.example.org/n' || CAST(n_nationkey - 1 AS VARCHAR) AS dst_url
      FROM nation WHERE n_nationkey >= 1
    ),
    walk(src, cur, hops) AS (
      SELECT src_url, dst_url, 1 FROM edges
      UNION ALL
      SELECT w.src, e.dst_url, w.hops + 1
      FROM walk w JOIN edges e ON e.src_url = w.cur
      WHERE w.hops <= 20
    ),
    finals AS (
      SELECT src, max(hops) AS max_hops,
             arg_max(cur, hops) AS last_cur
      FROM walk GROUP BY src
    )
    SELECT src AS src_url,
           CASE WHEN max_hops >= 21 THEN NULL ELSE last_cur END AS final_url,
           max_hops >= 21 AS aborted
    FROM finals ORDER BY src_url
"""


# ---------------------------------------------------------------------------
# D4: mark-completed — explode redirect chains, distinct (src/Crawl.hs:169-174)
# ---------------------------------------------------------------------------

def q_mark_completed(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    chains = o.select(
        F.array(
            F.concat(F.lit("u"), F.col("o_orderkey").cast("string")),
            F.concat(F.lit("u"), F.col("o_custkey").cast("string")),
            F.concat(F.lit("u"), (F.col("o_orderkey") % 7).cast("string")),
        ).alias("redirect_chain")
    )
    return (
        chains.select(F.explode(F.array_distinct("redirect_chain")).alias("url"))
        .distinct()
        .orderBy("url")
    )


ORACLE_MARK_COMPLETED = """
    SELECT DISTINCT unnest([
        'u' || CAST(o_orderkey AS VARCHAR),
        'u' || CAST(o_custkey AS VARCHAR),
        'u' || CAST(o_orderkey % 7 AS VARCHAR)
    ]) AS url
    FROM orders ORDER BY url
"""


# ---------------------------------------------------------------------------
# F4: deterministic quota cutoff (src/Crawl.hs:171-183) via scalable rank
# ---------------------------------------------------------------------------

def q_quota_cutoff(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    ranked = global_rank(o, ["o_orderdate", "o_orderkey"], "rk")
    return ranked.where(F.col("rk") <= 1000).select("o_orderkey", "rk").orderBy("rk")


ORACLE_QUOTA_CUTOFF = """
    SELECT o_orderkey, row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rk
    FROM orders QUALIFY rk <= 1000 ORDER BY rk
"""


# ---------------------------------------------------------------------------
# D2/D3: frontier merge — first-discovery-wins dedup + FIFO seq
# (src/Crawl.hs:194-201, src/PoliteQueue.hs:30)
# ---------------------------------------------------------------------------

def q_frontier_merge(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    occ = li.select(
        F.concat(F.lit("http://m.example.org/x"), (F.col("l_partkey") % 1000).cast("string")).alias("url"),
        F.col("l_orderkey").alias("ord_rank"),
        F.col("l_linenumber").cast("long").alias("ord_sub"),
    )
    deduped = (
        occ.groupBy("url")
        .agg(F.min(F.struct("ord_rank", "ord_sub")).alias("k"))
        .select("url", F.col("k.ord_rank").alias("ord_rank"), F.col("k.ord_sub").alias("ord_sub"))
    )
    return global_rank(deduped, ["ord_rank", "ord_sub", "url"], "seq").orderBy("seq").select(
        "url", "ord_rank", "ord_sub", "seq"
    )


ORACLE_FRONTIER_MERGE = """
    WITH occ AS (
      SELECT 'http://m.example.org/x' || CAST(l_partkey % 1000 AS VARCHAR) AS url,
             l_orderkey AS ord_rank, CAST(l_linenumber AS BIGINT) AS ord_sub
      FROM lineitem
    ),
    firsts AS (
      SELECT url, ord_rank, ord_sub,
             row_number() OVER (PARTITION BY url ORDER BY ord_rank, ord_sub) AS rn
      FROM occ QUALIFY rn = 1
    )
    SELECT url, ord_rank, ord_sub,
           row_number() OVER (ORDER BY ord_rank, ord_sub, url) AS seq
    FROM firsts ORDER BY seq
"""


# ---------------------------------------------------------------------------
# A4: per-round metrics counts (src/Crawl.hs:171-183, Shared.hs:12-16)
# ---------------------------------------------------------------------------

def q_metrics_counts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("round"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("round")
    )


ORACLE_METRICS_COUNTS = """
    SELECT CAST(year(o_orderdate) AS INT) AS round,
           count(*) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders GROUP BY 1 ORDER BY round
"""


# ---------------------------------------------------------------------------
# A4 extension: metrics ROLLUP — per-(round, status) counts plus the
# subtotal and grand-total rows a metrics dashboard reads, in ONE pass.
# The reference has no grouping sets (its counters are flat TVars); this
# is the Spark-native generalization: rollup() computes all three grains
# in a single shuffle with partial aggregation, instead of three jobs.
# ---------------------------------------------------------------------------

def q_metrics_rollup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        F.year("o_orderdate").alias("round"),
        F.col("o_orderstatus").alias("status"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
    )
    return (
        base.rollup("round", "status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price_floor").alias("sum_price_floor"),
            F.grouping_id().cast("long").alias("g_id"),
        )
        .orderBy("g_id", "round", "status")
    )


ORACLE_METRICS_ROLLUP = """
    SELECT CAST(year(o_orderdate) AS INT) AS round,
           o_orderstatus AS status,
           count(*) AS n,
           CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_price_floor,
           CAST(GROUPING_ID(year(o_orderdate), o_orderstatus) AS BIGINT) AS g_id
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
    ORDER BY g_id, round, status
"""


QUERIES = {
    "canonicalize": q_canonicalize,
    "resolve_links": q_resolve_links,
    "host_extract": q_host_extract,
    "urlseen_antijoin": q_urlseen_antijoin,
    "schedule_window": q_schedule_window,
    "schedule_salted": q_schedule_salted,
    "schedule_timing": q_schedule_timing,
    "depth_priority": q_depth_priority,
    "include_filter": q_include_filter,
    "robots_filter": q_robots_filter,
    "redirect_closure": q_redirect_closure,
    "mark_completed": q_mark_completed,
    "quota_cutoff": q_quota_cutoff,
    "frontier_merge": q_frontier_merge,
    "metrics_counts": q_metrics_counts,
    "metrics_rollup": q_metrics_rollup,
}

ORACLES = {
    "canonicalize": ORACLE_CANONICALIZE,
    "resolve_links": ORACLE_RESOLVE_LINKS,
    "host_extract": ORACLE_HOST_EXTRACT,
    "urlseen_antijoin": ORACLE_URLSEEN_ANTIJOIN,
    "schedule_window": _SCHEDULE_ORACLE,
    "schedule_salted": _SCHEDULE_ORACLE,
    "schedule_timing": ORACLE_SCHEDULE_TIMING,
    "depth_priority": ORACLE_DEPTH_PRIORITY,
    "include_filter": ORACLE_INCLUDE_FILTER,
    "robots_filter": ORACLE_ROBOTS_FILTER,
    "redirect_closure": ORACLE_REDIRECT_CLOSURE,
    "mark_completed": ORACLE_MARK_COMPLETED,
    "quota_cutoff": ORACLE_QUOTA_CUTOFF,
    "frontier_merge": ORACLE_FRONTIER_MERGE,
    "metrics_counts": ORACLE_METRICS_COUNTS,
    "metrics_rollup": ORACLE_METRICS_ROLLUP,
}


# ---------------------------------------------------------------------------
# D5: redirect-chain dedup — nub(chain) (src/Fetch.hs:42); D6: cookie diff —
# responseCookies \\ cookiesSent (src/Crawl.hs:159). Array set ops on
# synthesized chains/jars; outputs sorted for order-insensitive compare.
# ---------------------------------------------------------------------------

def q_chain_dedup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    chain = F.array(
        F.concat(F.lit("u"), (F.col("o_orderkey") % 11).cast("string")),
        F.concat(F.lit("u"), (F.col("o_custkey") % 11).cast("string")),
        F.concat(F.lit("u"), (F.col("o_orderkey") % 11).cast("string")),  # dup
        F.concat(F.lit("u"), ((F.col("o_orderkey") + 1) % 11).cast("string")),
    )
    # engine semantics are order-preserving nub (trace tests cover that);
    # the oracle compare sorts because DuckDB's list_distinct is unordered.
    # array_join: the driver harness canonicalizer can't sort list-typed
    # cells (pandas TypeError), so both sides emit a '|'-joined string.
    return o.select(
        "o_orderkey",
        F.array_join(F.array_sort(F.array_distinct(chain)), "|").alias("chain"),
    ).orderBy("o_orderkey")


ORACLE_CHAIN_DEDUP = """
    SELECT o_orderkey,
           array_to_string(list_sort(list_distinct([
             'u' || CAST(o_orderkey % 11 AS VARCHAR),
             'u' || CAST(o_custkey % 11 AS VARCHAR),
             'u' || CAST(o_orderkey % 11 AS VARCHAR),
             'u' || CAST((o_orderkey + 1) % 11 AS VARCHAR)
           ])), '|') AS chain
    FROM orders ORDER BY o_orderkey
"""


def q_cookie_diff(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    response = F.array(
        F.concat(F.lit("c"), (F.col("o_orderkey") % 7).cast("string")),
        F.concat(F.lit("c"), (F.col("o_custkey") % 7).cast("string")),
        F.concat(F.lit("c"), ((F.col("o_orderkey") + 3) % 7).cast("string")),
    )
    sent = F.array(
        F.concat(F.lit("c"), (F.col("o_custkey") % 7).cast("string")),
    )
    return o.select(
        "o_orderkey",
        F.array_join(F.array_sort(F.array_except(response, sent)), "|").alias("new_cookies"),
    ).orderBy("o_orderkey")


ORACLE_COOKIE_DIFF = """
    SELECT o_orderkey,
           array_to_string(list_sort(list_distinct(list_filter(
             ['c' || CAST(o_orderkey % 7 AS VARCHAR),
              'c' || CAST(o_custkey % 7 AS VARCHAR),
              'c' || CAST((o_orderkey + 3) % 7 AS VARCHAR)],
             x -> x != 'c' || CAST(o_custkey % 7 AS VARCHAR)
           ))), '|') AS new_cookies
    FROM orders ORDER BY o_orderkey
"""


QUERIES["chain_dedup"] = q_chain_dedup
QUERIES["cookie_diff"] = q_cookie_diff
ORACLES["chain_dedup"] = ORACLE_CHAIN_DEDUP
ORACLES["cookie_diff"] = ORACLE_COOKIE_DIFF

# ---------------------------------------------------------------------------
# A5: session-cookie collection (src/Crawl.hs:159,164-167) — the round
# plan's session_append shape (plans/round.py): explode observed cookies,
# drop ones already in the round-start jar (responseCookies \\ jar), and
# attribute each new cookie to its first setter by (rank, hop) order.
# ---------------------------------------------------------------------------

def q_session_collect(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    ev = o.select(
        F.col("o_orderkey").alias("rnk"),
        (F.col("o_orderkey") % 3).cast("int").alias("hops"),
        F.concat(
            F.lit("http://h"), (F.col("o_custkey") % 53).cast("string"),
            F.lit(".example.org/p"), F.col("o_orderkey").cast("string"),
        ).alias("final_url"),
        F.array(
            F.concat(F.lit("session-"), (F.col("o_custkey") % 101).cast("string"))
        ).alias("cookies"),
    )
    jar = [f"session-{i}" for i in range(0, 101, 5)]  # round-start jar
    return (
        ev.select("rnk", "hops", "final_url", F.explode("cookies").alias("cookie"))
        .where(~F.col("cookie").isin(*jar))
        .groupBy("cookie")
        .agg(F.min(F.struct("rnk", "hops", "final_url")).alias("k"))
        .select("cookie", F.col("k.final_url").alias("url"))
        .orderBy("cookie")
    )


ORACLE_SESSION_COLLECT = """
    WITH ev AS (
      SELECT o_orderkey AS rnk,
             CAST(o_orderkey % 3 AS INT) AS hops,
             'http://h' || CAST(o_custkey % 53 AS VARCHAR) || '.example.org/p'
                 || CAST(o_orderkey AS VARCHAR) AS final_url,
             'session-' || CAST(o_custkey % 101 AS VARCHAR) AS cookie,
             o_custkey
      FROM orders
    )
    SELECT cookie, final_url AS url FROM (
      SELECT cookie, final_url,
             ROW_NUMBER() OVER (PARTITION BY cookie ORDER BY rnk, hops, final_url) AS rn
      FROM ev WHERE (o_custkey % 101) % 5 <> 0
    ) WHERE rn = 1 ORDER BY cookie
"""

QUERIES["session_collect"] = q_session_collect
ORACLES["session_collect"] = ORACLE_SESSION_COLLECT


# ---------------------------------------------------------------------------
# S11: WARC serialization as a driver gate (src/WarcDocument.hs:17-45) —
# synthesizes deterministic crawled-doc rows from `documents` (every 4th
# doc reached through a redirect, so chain-last != final URL for those),
# runs the REAL to_warc_records plan, and emits the full serialized
# record for byte-exact comparison against a DuckDB string assembly.
# ---------------------------------------------------------------------------

def q_warc_records(spark, sf_dir):
    from crawler_spark.warc import to_warc_records

    d = _t(spark, sf_dir, "documents")
    host = F.concat(F.lit("http://h"), (F.col("doc_id") % 53).cast("string"),
                    F.lit(".example.org"))
    url = F.concat(host, F.lit("/d"), F.col("doc_id").cast("string"))
    requested = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(host, F.lit("/r"), F.col("doc_id").cast("string")),
    ).otherwise(url)
    spans = F.array(
        F.struct(
            F.lit("text").alias("kind"), F.col("text").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        ),
        F.struct(
            F.lit("media").alias("kind"), F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("/img"), F.col("doc_id").cast("string"),
                     F.lit(".png")).alias("media_ref"),
            F.lit(1).cast("int").alias("offset"),
        ),
    )
    crawled = d.select(
        requested.alias("url"),
        url.alias("final_url"),
        F.when(F.col("doc_id") % 4 == 0, F.array(url, requested))
        .otherwise(F.array(url)).alias("redirect_chain"),
        spans.alias("spans"),
        F.lit(0).cast("int").alias("round"),
        F.col("doc_id").alias("rank_in_round"),
    )
    return (
        to_warc_records(crawled)
        .select(F.col("rank_in_round").alias("doc_id"), "warc_record")
        .orderBy("doc_id")
    )


ORACLE_WARC_RECORDS = r"""
    WITH d AS (
      SELECT doc_id,
             'http://h' || CAST(doc_id % 53 AS VARCHAR) || '.example.org/d'
                 || CAST(doc_id AS VARCHAR) AS url,
             CASE WHEN doc_id % 4 = 0
                  THEN 'http://h' || CAST(doc_id % 53 AS VARCHAR)
                       || '.example.org/r' || CAST(doc_id AS VARCHAR)
                  ELSE 'http://h' || CAST(doc_id % 53 AS VARCHAR)
                       || '.example.org/d' || CAST(doc_id AS VARCHAR)
             END AS requested,
             text || e'\n' || '/img' || CAST(doc_id AS VARCHAR) || '.png' AS body
      FROM documents
    )
    SELECT doc_id,
           'WARC/1.0' || e'\r\n'
           || 'Compression-Mode: uncompressed' || e'\r\n'
           || 'Content-Length: ' || CAST(strlen(body) AS VARCHAR) || e'\r\n'
           || 'Original-Content-Length: ' || CAST(strlen(body) AS VARCHAR) || e'\r\n'
           || 'Uncompressed-Content-Length: ' || CAST(strlen(body) AS VARCHAR) || e'\r\n'
           || 'WARC-Record-ID: <urn:uuid:' || md5(requested) || '>' || e'\r\n'
           || 'WARC-Target-URI: ' || requested || e'\r\n'
           || 'WARC-Type: response' || e'\r\n'
           || 'WARC-Date: 1970-01-01T00:00:00Z' || e'\r\n'
           || 'Content-Type: application/http; msgtype=response' || e'\r\n'
           || e'\r\n' || body || e'\r\n' || e'\r\n' AS warc_record
    FROM d ORDER BY doc_id
"""

QUERIES["warc_records"] = q_warc_records
ORACLES["warc_records"] = ORACLE_WARC_RECORDS


# ---------------------------------------------------------------------------
# Interleaved-span analytics — the input_hint's table shape (doc_id,
# spans:array<struct<kind,text,media_ref,offset>>) exercised as a gated
# DataFrame op, not just inside the crawl loop: per-document span-kind
# counts, text mass, first media offset and the reassembled-text hash,
# ALL computed by row-local JVM higher-order functions over the struct
# array (filter / transform / aggregate / array_min) — zero shuffle,
# one WholeStageCodegen span, the way span-document analytics should run
# at 100 TB. Spans are synthesized deterministically from `documents`
# (doc_id % 5 + 1 spans, even offsets text chunks, odd offsets media
# refs) so the DuckDB oracle reproduces them exactly.
# ---------------------------------------------------------------------------

_SPAN_SYNTH = (
    "transform(sequence(0, CAST(doc_id % 5 AS INT)), i -> "
    "CASE WHEN i % 2 = 0 THEN named_struct("
    "'kind', 'text', 'text', substring(text, i * 7 + 1, 7), "
    "'media_ref', CAST(NULL AS STRING), 'offset', i) "
    "ELSE named_struct("
    "'kind', 'media', 'text', CAST(NULL AS STRING), "
    "'media_ref', concat('/m', CAST(doc_id AS STRING), '_', CAST(i AS STRING)), "
    "'offset', i) END)"
)


def q_span_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    doc = d.select("doc_id", F.expr(_SPAN_SYNTH).alias("spans"))
    return doc.select(
        "doc_id",
        F.expr("size(spans)").alias("n_spans"),
        F.expr("size(filter(spans, s -> s.kind = 'media'))").alias("n_media"),
        F.expr(
            "aggregate(filter(spans, s -> s.kind = 'text'), 0L, "
            "(acc, s) -> acc + length(s.text))"
        ).alias("text_chars"),
        F.expr(
            "coalesce(array_min(transform(filter(spans, s -> s.kind = 'media'), "
            "s -> s.offset)), -1)"
        ).alias("first_media_offset"),
        F.md5(
            F.expr("array_join(transform(filter(spans, s -> s.kind = 'text'), s -> s.text), '')")
        ).alias("text_hash"),
    ).orderBy("doc_id")


ORACLE_SPAN_STATS = """
    WITH s AS (
      SELECT d.doc_id, g.i,
             CASE WHEN g.i % 2 = 0 THEN substr(d.text, CAST(g.i * 7 + 1 AS INT), 7)
             END AS tpart
      FROM documents d,
           LATERAL unnest(generate_series(0, d.doc_id % 5)) AS g(i)
    )
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_spans,
           CAST(sum(CASE WHEN i % 2 = 1 THEN 1 ELSE 0 END) AS INT) AS n_media,
           CAST(coalesce(sum(length(tpart)), 0) AS BIGINT) AS text_chars,
           CAST(coalesce(min(CASE WHEN i % 2 = 1 THEN i END), -1) AS INT)
             AS first_media_offset,
           md5(coalesce(string_agg(tpart, '' ORDER BY i), '')) AS text_hash
    FROM s GROUP BY doc_id ORDER BY doc_id
"""

QUERIES["span_stats"] = q_span_stats
ORACLES["span_stats"] = ORACLE_SPAN_STATS


# ---------------------------------------------------------------------------
# caption_pairs: caption assignment over interleaved text/media spans —
# the input_hint's array<struct<kind,text,media_ref,offset>> shape. Each
# media span is paired with the NEAREST text span by offset (tie -> the
# preceding one); media with no text span in the document gets a NULL
# caption. This is the multimodal-training join that turns an interleaved
# crawl document into (image, caption) rows.
#
# Scale shape: one explode + two frame-bounded window passes partitioned
# by doc_id — no self-join of the span table, no shuffle beyond the
# per-document window exchange; spans of one document never cross
# partitions twice. The span synth here flips kind parity with doc_id so
# odd docs START with media, exercising the no-preceding-text branch.
# ---------------------------------------------------------------------------

_SPAN_SYNTH_PARITY = (
    "transform(sequence(0, CAST(doc_id % 5 AS INT)), i -> "
    "CASE WHEN (i + doc_id) % 2 = 0 THEN named_struct("
    "'kind', 'text', 'text', substring(text, i * 7 + 1, 7), "
    "'media_ref', CAST(NULL AS STRING), 'offset', i) "
    "ELSE named_struct("
    "'kind', 'media', 'text', CAST(NULL AS STRING), "
    "'media_ref', concat('/m', CAST(doc_id AS STRING), '_', CAST(i AS STRING)), "
    "'offset', i) END)"
)


def q_caption_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    rows = (
        d.select("doc_id", F.explode(F.expr(_SPAN_SYNTH_PARITY)).alias("s"))
        .select(
            "doc_id",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").alias("offset"),
        )
    )
    txt = F.when(F.col("kind") == "text", F.col("text"))
    toff = F.when(F.col("kind") == "text", F.col("offset"))
    w_prev = (
        Window.partitionBy("doc_id").orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("doc_id").orderBy("offset")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    cand = rows.select(
        "doc_id", "kind", "media_ref", "offset",
        F.last(txt, ignorenulls=True).over(w_prev).alias("prev_text"),
        F.last(toff, ignorenulls=True).over(w_prev).alias("prev_off"),
        F.first(txt, ignorenulls=True).over(w_next).alias("next_text"),
        F.first(toff, ignorenulls=True).over(w_next).alias("next_off"),
    ).where(F.col("kind") == "media")
    take_prev = F.col("prev_off").isNotNull() & (
        F.col("next_off").isNull()
        | ((F.col("offset") - F.col("prev_off")) <= (F.col("next_off") - F.col("offset")))
    )
    return cand.select(
        "doc_id",
        "media_ref",
        F.col("offset").cast("int").alias("media_offset"),
        F.when(take_prev, F.col("prev_text")).otherwise(F.col("next_text")).alias("caption"),
        F.when(take_prev, F.col("prev_off"))
        .otherwise(F.coalesce(F.col("next_off"), F.lit(-1)))
        .cast("int")
        .alias("caption_offset"),
    ).orderBy("doc_id", "media_offset")


ORACLE_CAPTION_PAIRS = """
    WITH s AS (
      SELECT d.doc_id, g.i,
             CASE WHEN (g.i + d.doc_id) % 2 = 0 THEN 'text' ELSE 'media' END AS kind,
             CASE WHEN (g.i + d.doc_id) % 2 = 0
                  THEN substr(d.text, CAST(g.i * 7 + 1 AS INT), 7) END AS tpart,
             CASE WHEN (g.i + d.doc_id) % 2 = 1
                  THEN concat('/m', CAST(d.doc_id AS VARCHAR), '_', CAST(g.i AS VARCHAR))
             END AS media_ref
      FROM documents d,
           LATERAL unnest(generate_series(0, d.doc_id % 5)) AS g(i)
    ),
    w AS (
      SELECT doc_id, i, kind, media_ref,
        last_value(tpart IGNORE NULLS) OVER (
          PARTITION BY doc_id ORDER BY i
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_text,
        last_value(CASE WHEN kind = 'text' THEN i END IGNORE NULLS) OVER (
          PARTITION BY doc_id ORDER BY i
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_off,
        first_value(tpart IGNORE NULLS) OVER (
          PARTITION BY doc_id ORDER BY i
          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_text,
        first_value(CASE WHEN kind = 'text' THEN i END IGNORE NULLS) OVER (
          PARTITION BY doc_id ORDER BY i
          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_off
      FROM s
    )
    SELECT doc_id, media_ref, CAST(i AS INT) AS media_offset,
           CASE WHEN prev_off IS NOT NULL
                     AND (next_off IS NULL OR (i - prev_off) <= (next_off - i))
                THEN prev_text ELSE next_text END AS caption,
           CAST(CASE WHEN prev_off IS NOT NULL
                          AND (next_off IS NULL OR (i - prev_off) <= (next_off - i))
                     THEN prev_off ELSE coalesce(next_off, -1) END AS INT)
             AS caption_offset
    FROM w WHERE kind = 'media' ORDER BY doc_id, media_offset
"""

QUERIES["caption_pairs"] = q_caption_pairs
ORACLES["caption_pairs"] = ORACLE_CAPTION_PAIRS


# ---------------------------------------------------------------------------
# span_packing: sequence packing for INTERLEAVED text+media documents —
# the multimodal twin of token_packing. Each doc's training cost is the
# sum of its spans: text spans at (chars+3) div 4 tokens (integer BPE
# proxy, float-free on both engines), media spans at a fixed 64-token
# budget (the patch-embedding slot an interleaved MM model reserves per
# image). Docs are concatenated in doc_id order and chunked into
# 1024-token packs; each doc reports its pack, offset, and span count.
#
# Scale shape: per-doc cost is row-local HOFs over the span array; the
# global exclusive running sum is plans/ranking.global_cumsum (intra-
# bucket prefix windows + O(#buckets) offset cumsum + broadcast join) —
# the corpus never crosses a single partition, same as token_packing.
# ---------------------------------------------------------------------------

_SPAN_PACK_LEN = 1024
_SPAN_MEDIA_COST = 64


def q_span_packing(spark, sf_dir):
    from crawler_spark.plans.ranking import global_cumsum

    d = _t(spark, sf_dir, "documents")
    costs = d.select(
        "doc_id",
        F.expr(
            f"aggregate({_SPAN_SYNTH}, 0L, (acc, s) -> acc + "
            f"CASE WHEN s.kind = 'text' THEN (length(s.text) + 3) div 4 "
            f"ELSE {_SPAN_MEDIA_COST}L END)"
        ).alias("doc_cost"),
        F.expr(f"size(filter({_SPAN_SYNTH}, s -> s.kind = 'media'))").alias("n_media"),
    )
    return (
        global_cumsum(
            costs, "doc_id", "doc_cost", "cum_before",
            bucket=F.expr("doc_id div 4096"),
        )
        .select(
            "doc_id",
            F.col("doc_cost").cast("bigint").alias("doc_cost"),
            F.col("n_media").cast("int").alias("n_media"),
            F.expr(f"cum_before div {_SPAN_PACK_LEN}").alias("pack_id"),
            (F.col("cum_before") % _SPAN_PACK_LEN).alias("pack_offset"),
            F.when(F.col("doc_cost") == 0, F.lit(0).cast("bigint"))
            .otherwise(
                F.expr(f"(cum_before + doc_cost - 1) div {_SPAN_PACK_LEN}")
                - F.expr(f"cum_before div {_SPAN_PACK_LEN}")
                + 1
            )
            .alias("n_spanned_packs"),
        )
        .orderBy("doc_id")
    )


ORACLE_SPAN_PACKING = f"""
    WITH s AS (
      SELECT d.doc_id, g.i,
             CASE WHEN g.i % 2 = 0
                  THEN (length(substr(d.text, CAST(g.i * 7 + 1 AS INT), 7)) + 3) // 4
                  ELSE {_SPAN_MEDIA_COST} END AS cost,
             CASE WHEN g.i % 2 = 1 THEN 1 ELSE 0 END AS is_media
      FROM documents d,
           LATERAL unnest(generate_series(0, d.doc_id % 5)) AS g(i)
    ),
    costs AS (
      SELECT doc_id, CAST(sum(cost) AS BIGINT) AS doc_cost,
             CAST(sum(is_media) AS INT) AS n_media
      FROM s GROUP BY doc_id
    ),
    cum AS (
      SELECT doc_id, doc_cost, n_media,
             CAST(coalesce(sum(doc_cost) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cum_before
      FROM costs
    )
    SELECT doc_id, doc_cost, n_media,
           cum_before // {_SPAN_PACK_LEN} AS pack_id,
           cum_before % {_SPAN_PACK_LEN} AS pack_offset,
           CAST(CASE WHEN doc_cost = 0 THEN 0
                ELSE (cum_before + doc_cost - 1) // {_SPAN_PACK_LEN}
                     - cum_before // {_SPAN_PACK_LEN} + 1 END AS BIGINT)
             AS n_spanned_packs
    FROM cum ORDER BY doc_id
"""

QUERIES["span_packing"] = q_span_packing
ORACLES["span_packing"] = ORACLE_SPAN_PACKING
