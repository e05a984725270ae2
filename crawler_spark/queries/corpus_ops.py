"""Corpus-analytics operators layered on the crawl store: TF-IDF term
scoring, benchmark decontamination, link-graph PageRank, and incremental
snapshot diffing. These extend the training-data pipeline layer
(pipeline_ops.py) with the remaining jobs a production corpus refresh
runs between "crawl finished" and "dataset shipped".

Same design rules as pipeline_ops.py:
- hot-path logic JVM-side; hashing is md5-based so DuckDB reproduces it
- float outputs floored to ints at row level (sums stay exact bigints)
- iterative plans checkpoint per step so lineage stays O(1)
- every scalar the plan needs (corpus size, id-domain modulus) is joined
  in as a broadcast 1-row aggregate, never a driver-side action
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crawler_spark.queries.pipeline_ops import (
    _DOC_SHINGLES_SQL,
    _TOKENS_SQL,
    _docs_tokens,
    _t,
)

# ---------------------------------------------------------------------------
# TF-IDF top terms per document.
#
# Scale shape: ONE shuffle on (doc_id, term) builds tf (map-side partial
# agg collapses repeated tokens early), ONE on term builds df, and the
# corpus size N rides in as a broadcast 1-row aggregate (a
# BroadcastNestedLoopJoin of a single row — never a CartesianProduct).
# The per-doc top-k window partitions by doc_id, so no global sort.
#
# Determinism note: idf = ln((N+1)/(df+1)) is an irrational double; both
# engines compute it to <= 1 ulp but not necessarily the SAME ulp, so a
# score that lands exactly on an integer could floor differently. The
# +1e-6 nudge before floor() moves the only NATURAL integer attractor
# (df+1 == N+1 -> ln 1 = 0) safely off the boundary on both engines;
# everything else sits O(1) away from a boundary relative to ulp noise.
# ---------------------------------------------------------------------------

TFIDF_TOPK = 3


def q_tfidf_topterms(spark, sf_dir):
    toks = _docs_tokens(spark, sf_dir).select(
        "doc_id", F.explode("tokens").alias("term")
    ).withColumn("term", F.lower("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = tf.select("doc_id").distinct().agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score_ppm",
            F.floor(
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                * F.lit(1000000.0)
                + F.lit(1e-6)
            ).cast("long"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score_ppm").desc(), F.col("term"))
    top = scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= TFIDF_TOPK)
    return top.select("doc_id", "rk", "term", "tf", "df", "score_ppm").orderBy(
        "doc_id", "rk"
    )


ORACLE_TFIDF_TOPTERMS = f"""
    WITH toks AS (
      SELECT doc_id, lower(unnest(tokens)) AS term FROM ({_TOKENS_SQL})
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(floor(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) * 1000000.0
                        + 0.000001) AS BIGINT) AS score_ppm
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score_ppm DESC, term
      ) AS rk FROM scored
    )
    SELECT doc_id, CAST(rk AS INT) AS rk, term, CAST(tf AS BIGINT) AS tf,
           CAST(df AS BIGINT) AS df, score_ppm
    FROM ranked WHERE rk <= {TFIDF_TOPK} ORDER BY doc_id, rk
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination: flag TRAIN documents sharing any 3-token
# shingle with a TEST-split document (the overlap check every training
# pipeline runs before shipping — leaked eval shingles poison the split).
# The split is the same deterministic md5-nibble assignment as
# corpus_split, so the benchmark set is derived in-query, no side data.
#
# Scale shape: the test split is a small fixed fraction (2/16) of the
# corpus, its distinct-shingle set smaller still — at cluster scale that
# side broadcasts and the train side streams through a broadcast hash
# join (here Catalyst/AQE picks it from stats). One groupBy(doc_id)
# shuffle aggregates hit counts.
# ---------------------------------------------------------------------------

_TEST_NIBBLES = list("ef")  # corpus_split: everything not in 0-9ab / cd


def _split_nibble():
    return F.substring(F.md5(F.col("doc_id").cast("string")), 32, 1)


def q_decontaminate(spark, sf_dir):
    # reuse the session-memoized exploded (doc_id, sh) table the minhash
    # family materializes — decontamination filters two slices of the
    # SAME exploded relation, so rebuilding the tokenize→shingle→explode
    # subtree here paid the corpus scan twice for nothing (12.5 s → the
    # shared stage at sf0.1). Cluster analogue: both consumers read one
    # persisted stage.
    from crawler_spark.queries.pipeline_ops import _minhash_exploded

    ex = _minhash_exploded(spark, sf_dir)
    nib = _split_nibble()
    bench = ex.where(nib.isin(_TEST_NIBBLES)).select("sh").distinct()
    train_ex = ex.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 32, 1).isin(
            list("0123456789ab")
        )
    ).select("doc_id", "sh")
    hits = (
        train_ex.join(bench, "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )
    return hits.select("doc_id", "n_shared_shingles").orderBy("doc_id")


ORACLE_DECONTAMINATE = f"""
    WITH sh AS (
      SELECT doc_id, shingles FROM ({_DOC_SHINGLES_SQL})
    ),
    bench AS (
      SELECT DISTINCT unnest(shingles) AS s FROM sh
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 32, 1) IN ('e', 'f')
    ),
    train_ex AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
      WHERE strpos('0123456789ab', substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) > 0
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_shingles
    FROM train_ex JOIN bench USING (s)
    GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# PageRank over a deterministic synthetic link graph (the host/page
# authority score a crawler feeds back into frontier priority).
#
# Graph: node v links to (v*31 + j) mod M for j = 1 .. 1 + (v mod 3),
# with M = max(doc_id)+1; targets that don't exist in the corpus are
# dropped by a join against the node set (id gaps are tolerated, not
# assumed away). Nodes whose links all vanish become dangling and simply
# leak their mass — the standard simplification, identical on both sides.
#
# Arithmetic is ALL integer (parts-per-trillion of total mass): per-edge
# contribution r*85 div (100*outdeg), teleport (15 * 10^12) div (100*n).
# Long sums are exact and order-independent, so the result is
# bit-identical across engines and across shuffle orders — no float
# accumulation anywhere in an iterative plan.
#
# Scale shape: each of the 3 unrolled iterations is one join (edges x
# ranks, equi on src) + one groupBy(dst) shuffle; the rank table is
# checkpointed per step so lineage is O(1) per iteration (same pattern
# as dedup_components / the BFS levels). Edges materialize once.
# ---------------------------------------------------------------------------

PAGERANK_ITERS = 3
_PR_TOTAL = 10**12  # total mass, parts-per-trillion units


def _synth_link_graph(spark, sf_dir):
    """(nodes, scalars, edges) of the deterministic synthetic doc graph:
    v -> (v*31 + j) mod M for j = 1 .. 1 + (v mod 3), M = max(doc_id)+1,
    targets filtered to existing docs. Shared by pagerank and hits so
    both authority scores rank the SAME graph."""
    nodes = _t(spark, sf_dir, "documents").select("doc_id")
    scalars = F.broadcast(
        nodes.agg(
            (F.max("doc_id") + F.lit(1)).alias("m"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    raw_edges = (
        nodes.crossJoin(scalars)
        .select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.sequence(F.lit(1), F.lit(1) + (F.col("doc_id") % 3).cast("int"))
            ).alias("j"),
            "m",
        )
        .select("src", ((F.col("src") * 31 + F.col("j")) % F.col("m")).alias("dst"))
    )
    edges = raw_edges.join(nodes.select(F.col("doc_id").alias("dst")), "dst")
    return nodes, scalars, edges


def q_pagerank(spark, sf_dir):
    nodes, scalars, kept = _synth_link_graph(spark, sf_dir)
    edges = (
        kept.withColumn("outdeg", F.count(F.lit(1)).over(Window.partitionBy("src")))
        .localCheckpoint()
    )
    ranks = (
        nodes.crossJoin(scalars)
        .select(
            "doc_id",
            F.expr(f"{_PR_TOTAL} div n").alias("r"),
            F.expr(f"(15 * {_PR_TOTAL}) div (100 * n)").alias("t"),
        )
        .localCheckpoint()
    )
    for _ in range(PAGERANK_ITERS):
        contrib = (
            edges.join(ranks.select(F.col("doc_id").alias("src"), "r"), "src")
            .select("dst", F.expr("(r * 85) div (100 * outdeg)").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            ranks.select("doc_id", "t")
            .join(contrib.withColumnRenamed("dst", "doc_id"), "doc_id", "left")
            .select(
                "doc_id",
                (F.col("t") + F.coalesce(F.col("inflow"), F.lit(0))).alias("r"),
                "t",
            )
            .localCheckpoint()
        )
    return ranks.select("doc_id", F.col("r").alias("rank_ppt")).orderBy("doc_id")


def _pr_iter_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT n.doc_id,
             s.t + coalesce(sum((p.r * 85) // (100 * e.outdeg)), 0) AS r,
             s.t
      FROM nodes n
      CROSS JOIN scal s
      LEFT JOIN edges e ON e.dst = n.doc_id
      LEFT JOIN {prev} p ON p.doc_id = e.src
      GROUP BY n.doc_id, s.t
    )"""


ORACLE_PAGERANK = f"""
    WITH nodes AS (SELECT doc_id FROM documents),
    scal AS (
      SELECT max(doc_id) + 1 AS m, count(*) AS n,
             (15 * {_PR_TOTAL}) // (100 * count(*)) AS t
      FROM nodes
    ),
    raw_edges AS (
      SELECT n.doc_id AS src,
             (n.doc_id * 31 + j.j) % s.m AS dst
      FROM nodes n
      CROSS JOIN scal s
      CROSS JOIN LATERAL (
        SELECT unnest(range(1, 2 + CAST(n.doc_id % 3 AS INT))) AS j
      ) j
    ),
    kept AS (
      SELECT e.src, e.dst FROM raw_edges e JOIN nodes t ON t.doc_id = e.dst
    ),
    edges AS (
      SELECT src, dst, count(*) OVER (PARTITION BY src) AS outdeg FROM kept
    ),
    it0 AS (
      SELECT n.doc_id, {_PR_TOTAL} // s.n AS r, s.t
      FROM nodes n CROSS JOIN scal s
    ),
    {_pr_iter_sql("it0", "it1")},
    {_pr_iter_sql("it1", "it2")},
    {_pr_iter_sql("it2", "it3")}
    SELECT doc_id, CAST(r AS BIGINT) AS rank_ppt FROM it3 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Incremental snapshot delta: the re-crawl diff. The "previous" snapshot
# is derived deterministically from the current corpus — every 7th doc is
# new since then (added), every 5th changed content (content hash
# differs), and a shadow set of ids (doc_id+10^6 for every 11th doc) was
# dropped from the current crawl (removed). A full-outer join on doc_id
# comparing content hashes classifies every row.
#
# Scale shape: at 100 TB both snapshots are bucket-partitioned by doc_id
# in the store, so this is a storage-partitioned (shuffle-free) join;
# here it is one equi-join shuffle. md5 is computed per row before the
# join so only (doc_id, 32-byte hash) crosses the wire, never the text.
# ---------------------------------------------------------------------------

def q_snapshot_delta(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    cur = d.select("doc_id", F.md5("text").alias("h_cur"))
    prev_kept = d.where("doc_id % 7 != 0").select(
        "doc_id",
        F.md5(
            F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [stale]")))
            .otherwise(F.col("text"))
        ).alias("h_prev"),
    )
    prev_gone = d.where("doc_id % 11 = 0").select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.md5(F.concat(F.col("text"), F.lit(" [gone]"))).alias("h_prev"),
    )
    prev = prev_kept.unionByName(prev_gone)
    joined = cur.join(prev, "doc_id", "full_outer")
    return (
        joined.select(
            "doc_id",
            F.when(F.col("h_prev").isNull(), "added")
            .when(F.col("h_cur").isNull(), "removed")
            .when(F.col("h_cur") != F.col("h_prev"), "changed")
            .otherwise("unchanged")
            .alias("status"),
        )
        .orderBy("doc_id")
    )


ORACLE_SNAPSHOT_DELTA = """
    WITH cur AS (SELECT doc_id, md5(text) AS h_cur FROM documents),
    prev AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [stale]' ELSE text END)
               AS h_prev
      FROM documents WHERE doc_id % 7 != 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, md5(text || ' [gone]') AS h_prev
      FROM documents WHERE doc_id % 11 = 0
    )
    SELECT coalesce(cur.doc_id, prev.doc_id) AS doc_id,
           CASE WHEN h_prev IS NULL THEN 'added'
                WHEN h_cur IS NULL THEN 'removed'
                WHEN h_cur != h_prev THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM cur FULL OUTER JOIN prev ON cur.doc_id = prev.doc_id
    ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# HITS hub/authority over the same synthetic link graph as pagerank —
# the second classic crawl-feedback score (a page can be a good HUB
# without being a good AUTHORITY; pagerank conflates the two).
#
# Arithmetic is ALL integer: scores live in parts-per-million of the
# per-iteration max (normalize-by-max instead of the textbook L2 norm —
# same fixed point direction, but exactly representable, so long sums
# stay order-independent and the result is bit-identical across engines
# and shuffle orders). Each half-step is one equi-join (edges x scores)
# + one groupBy shuffle; the max rides back in as a broadcast 1-row
# aggregate; score tables are localCheckpoint-ed per half-step so
# lineage stays O(1) per iteration (the pagerank/BFS pattern).
# ---------------------------------------------------------------------------

HITS_ITERS = 2
_HITS_SCALE = 10**6


def _hits_norm(scores, c):
    """score / max(score) in ppm, exact integers; one broadcast."""
    scores = scores.localCheckpoint()
    mx = F.broadcast(scores.agg(F.max(c).alias("mx")))
    return scores.crossJoin(mx).select(
        "doc_id", F.expr(f"({c} * {_HITS_SCALE}) div mx").alias(c)
    )


def q_hits(spark, sf_dir):
    nodes, _, edges = _synth_link_graph(spark, sf_dir)
    edges = edges.localCheckpoint()
    hub = nodes.select("doc_id", F.lit(_HITS_SCALE).cast("long").alias("h"))
    auth = None
    for _ in range(HITS_ITERS):
        auth = _hits_norm(
            edges.join(hub.select(F.col("doc_id").alias("src"), "h"), "src")
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
            .withColumnRenamed("dst", "doc_id"),
            "a",
        )
        hub = _hits_norm(
            edges.join(auth.select(F.col("doc_id").alias("dst"), "a"), "dst")
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
            .withColumnRenamed("src", "doc_id"),
            "h",
        )
    return (
        nodes.join(hub, "doc_id", "left")
        .join(auth, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("h", F.lit(0)).alias("hub_ppm"),
            F.coalesce("a", F.lit(0)).alias("auth_ppm"),
        )
        .orderBy("doc_id")
    )


ORACLE_HITS = f"""
    WITH nodes AS (SELECT doc_id FROM documents),
    scal AS (SELECT max(doc_id) + 1 AS m FROM nodes),
    raw_edges AS (
      SELECT n.doc_id AS src,
             (n.doc_id * 31 + j.j) % s.m AS dst
      FROM nodes n
      CROSS JOIN scal s
      CROSS JOIN LATERAL (
        SELECT unnest(range(1, 2 + CAST(n.doc_id % 3 AS INT))) AS j
      ) j
    ),
    edges AS (
      SELECT e.src, e.dst FROM raw_edges e JOIN nodes t ON t.doc_id = e.dst
    ),
    a1r AS (SELECT dst AS doc_id, sum({_HITS_SCALE}) AS a FROM edges GROUP BY 1),
    a1 AS (SELECT doc_id, (a * {_HITS_SCALE}) // (SELECT max(a) FROM a1r) AS a FROM a1r),
    h1r AS (SELECT src AS doc_id, sum(a1.a) AS h
            FROM edges JOIN a1 ON a1.doc_id = edges.dst GROUP BY 1),
    h1 AS (SELECT doc_id, (h * {_HITS_SCALE}) // (SELECT max(h) FROM h1r) AS h FROM h1r),
    a2r AS (SELECT dst AS doc_id, sum(h1.h) AS a
            FROM edges JOIN h1 ON h1.doc_id = edges.src GROUP BY 1),
    a2 AS (SELECT doc_id, (a * {_HITS_SCALE}) // (SELECT max(a) FROM a2r) AS a FROM a2r),
    h2r AS (SELECT src AS doc_id, sum(a2.a) AS h
            FROM edges JOIN a2 ON a2.doc_id = edges.dst GROUP BY 1),
    h2 AS (SELECT doc_id, (h * {_HITS_SCALE}) // (SELECT max(h) FROM h2r) AS h FROM h2r)
    SELECT n.doc_id,
           CAST(coalesce(h2.h, 0) AS BIGINT) AS hub_ppm,
           CAST(coalesce(a2.a, 0) AS BIGINT) AS auth_ppm
    FROM nodes n LEFT JOIN h2 USING (doc_id) LEFT JOIN a2 USING (doc_id)
    ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Passage-level dedup (the CCNet/RefinedWeb "duplicated line removal"
# stage, adapted to a corpus without newlines): each document is cut
# into fixed-width token passages ROW-LOCALLY (a JVM higher-order
# function — no shuffle to build passages), passages are counted across
# the corpus, and any passage appearing in more than PASSAGE_MAX_DF
# distinct documents is dropped from every document that carries it.
# Output per doc: passage count, dropped count, md5 of the rebuilt
# (kept-passages-in-order) text, so the oracle proves the surviving
# TEXT byte-for-byte, not just the counts.
#
# Scale shape: one groupBy(passage) shuffle for the df table, one
# equi-join back (at 100 TB the df table is dominated by unique
# passages — it broadcasts only after the same df > K filter used here
# would prune it; the general shape is the shuffle join), one
# groupBy(doc_id) rebuild. Per-doc passage lists are bounded by doc
# length, never by corpus size — no hot-key quadratic anywhere.
# ---------------------------------------------------------------------------

PASSAGE_W = 3
PASSAGE_MAX_DF = 2

_PASSAGES_SPARK = (
    f"transform(sequence(0, (size(tokens) - 1) div {PASSAGE_W}), "
    f"i -> struct(i AS chunk, "
    f"array_join(slice(tokens, i * {PASSAGE_W} + 1, {PASSAGE_W}), ' ') AS passage))"
)


def q_passage_dedup(spark, sf_dir):
    p = (
        _docs_tokens(spark, sf_dir)
        .where(F.size("tokens") > 0)
        .select("doc_id", F.explode(F.expr(_PASSAGES_SPARK)).alias("s"))
        .select("doc_id", F.col("s.chunk").alias("chunk"), F.col("s.passage").alias("passage"))
    )
    dfs = p.groupBy("passage").agg(F.countDistinct("doc_id").alias("df"))
    flagged = p.join(dfs, "passage").withColumn(
        "dropped", F.col("df") > F.lit(PASSAGE_MAX_DF)
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(F.when(F.col("dropped"), 1).otherwise(0)).alias("n_dropped"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(~F.col("dropped"), F.struct("chunk", "passage"))
                            )
                        ),
                        lambda s: s["passage"],
                    ),
                    " ",
                )
            ).alias("kept_hash"),
        )
        .orderBy("doc_id")
    )


ORACLE_PASSAGE_DEDUP = f"""
    WITH toks AS (
      SELECT doc_id, tokens FROM ({_TOKENS_SQL}) WHERE len(tokens) > 0
    ),
    p AS (
      SELECT doc_id, g.i AS chunk,
             array_to_string(
               tokens[g.i * {PASSAGE_W} + 1 : g.i * {PASSAGE_W} + {PASSAGE_W}], ' '
             ) AS passage
      FROM toks,
           LATERAL unnest(generate_series(0, (len(tokens) - 1) // {PASSAGE_W})) AS g(i)
    ),
    dfs AS (SELECT passage, count(DISTINCT doc_id) AS df FROM p GROUP BY 1)
    SELECT p.doc_id,
           CAST(count(*) AS BIGINT) AS n_passages,
           CAST(sum(CASE WHEN df > {PASSAGE_MAX_DF} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           md5(coalesce(
             string_agg(CASE WHEN df <= {PASSAGE_MAX_DF} THEN passage END,
                        ' ' ORDER BY chunk), '')) AS kept_hash
    FROM p JOIN dfs USING (passage)
    GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Corpus-wide n-gram heavy hitters: the top-K bigrams by occurrence —
# the frequency table a tokenizer-training / boilerplate-detection pass
# reads first. ONE groupBy(bigram) shuffle with map-side partial agg,
# then TakeOrderedAndProject (per-partition top-K reduced on the driver
# — never a global sort of the full frequency table). Ties broken by
# bigram text, so the result set is a total order and deterministic.
# ---------------------------------------------------------------------------

TOP_NGRAMS_K = 50

_BIGRAMS_SPARK_EXPR = (
    "transform(sequence(0, size(tokens) - 2), "
    "i -> lower(concat(tokens[i], ' ', tokens[i + 1])))"
)


def q_top_ngrams(spark, sf_dir):
    grams = (
        _docs_tokens(spark, sf_dir)
        .where(F.size("tokens") >= 2)
        .select(F.explode(F.expr(_BIGRAMS_SPARK_EXPR)).alias("bigram"))
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "bigram")
        .limit(TOP_NGRAMS_K)
    )


ORACLE_TOP_NGRAMS = f"""
    WITH big AS (
      SELECT list_transform(range(1, len(tokens)),
                            i -> lower(tokens[i] || ' ' || tokens[i + 1])) AS terms
      FROM ({_TOKENS_SQL}) WHERE len(tokens) >= 2
    )
    SELECT term AS bigram, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM (SELECT unnest(terms) AS term FROM big)
    GROUP BY 1
    ORDER BY n_occurrences DESC, bigram
    LIMIT {TOP_NGRAMS_K}
"""


QUERIES = {
    "tfidf_topterms": q_tfidf_topterms,
    "decontaminate": q_decontaminate,
    "pagerank": q_pagerank,
    "hits": q_hits,
    "snapshot_delta": q_snapshot_delta,
    "passage_dedup": q_passage_dedup,
    "top_ngrams": q_top_ngrams,
}

ORACLES = {
    "tfidf_topterms": ORACLE_TFIDF_TOPTERMS,
    "decontaminate": ORACLE_DECONTAMINATE,
    "pagerank": ORACLE_PAGERANK,
    "hits": ORACLE_HITS,
    "snapshot_delta": ORACLE_SNAPSHOT_DELTA,
    "passage_dedup": ORACLE_PASSAGE_DEDUP,
    "top_ngrams": ORACLE_TOP_NGRAMS,
}


# ---------------------------------------------------------------------------
# Re-crawl scheduling (the freshness policy a production crawler runs on
# top of snapshot deltas): three epochs of content hashes are diffed
# pairwise per document, the change count drives an exponential backoff —
# frequently-changing docs re-fetch every round, static docs back off to
# 2^3 rounds. Epoch hashes are synthesized deterministically from the
# corpus (epoch e changes every doc with doc_id % (e + 2) == 0, expressed
# through the HASH comparison, not the rule) so the oracle runs on the
# same input. Entirely row-local (zero shuffle): the per-doc policy is a
# projection, exactly what it must be at 10^10 URLs.
# ---------------------------------------------------------------------------

RECRAWL_EPOCHS = 3


def _epoch_hash(e: int):
    # epoch 0 = the base text; epoch e >= 1 appends a change marker for
    # the docs that changed in that epoch
    if e == 0:
        return F.md5(F.col("text"))
    return F.md5(
        F.when(
            F.col("doc_id") % (e + 2) == 0,
            F.concat(F.col("text"), F.lit(f" [epoch{e}]")),
        ).otherwise(F.col("text"))
    )


def q_recrawl_schedule(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id", *[_epoch_hash(e).alias(f"h{e}") for e in range(RECRAWL_EPOCHS + 1)]
    )
    changes = sum(
        F.when(F.col(f"h{e}") != F.col(f"h{e + 1}"), 1).otherwise(0)
        for e in range(RECRAWL_EPOCHS)
    )
    out = hashed.select(
        "doc_id", changes.cast("int").alias("n_changes")
    ).withColumn(
        "interval_rounds",
        F.expr(f"CAST(shiftleft(1, {RECRAWL_EPOCHS} - n_changes) AS INT)"),
    )
    return out.orderBy("doc_id")


def _epoch_hash_sql(e: int) -> str:
    if e == 0:
        return "md5(text)"
    return (
        f"md5(CASE WHEN doc_id % {e + 2} = 0 "
        f"THEN text || ' [epoch{e}]' ELSE text END)"
    )


ORACLE_RECRAWL_SCHEDULE = f"""
    WITH h AS (
      SELECT doc_id,
             {", ".join(f"{_epoch_hash_sql(e)} AS h{e}" for e in range(RECRAWL_EPOCHS + 1))}
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             ({" + ".join(f"CASE WHEN h{e} != h{e + 1} THEN 1 ELSE 0 END" for e in range(RECRAWL_EPOCHS))})
               AS n_changes
      FROM h
    )
    SELECT doc_id, CAST(n_changes AS INT) AS n_changes,
           CAST(1 << ({RECRAWL_EPOCHS} - n_changes) AS INT) AS interval_rounds
    FROM c ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Reciprocal-link detection over the synthetic graph — mutual links are
# the classic link-spam / link-exchange signal. ONE equi-join of the
# edge table against its own reversal on the composite key (src, dst),
# canonicalized src < dst so each mutual pair reports once.
# ---------------------------------------------------------------------------


def q_reciprocal_links(spark, sf_dir):
    _, _, edges = _synth_link_graph(spark, sf_dir)
    # the multiplicative graph is near-mutual-free, so every 9th source's
    # links gain a deterministic back-link — planted link exchanges the
    # detector must find (plus any natural mutuals)
    planted = edges.where(F.col("src") % 9 == 0).select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    e = edges.select("src", "dst").unionByName(planted).distinct().localCheckpoint()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        e.join(rev, ["src", "dst"])
        .where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .orderBy("a", "b")
    )


ORACLE_RECIPROCAL_LINKS = """
    WITH nodes AS (SELECT doc_id FROM documents),
    scal AS (SELECT max(doc_id) + 1 AS m FROM nodes),
    raw_edges AS (
      SELECT n.doc_id AS src,
             (n.doc_id * 31 + j.j) % s.m AS dst
      FROM nodes n
      CROSS JOIN scal s
      CROSS JOIN LATERAL (
        SELECT unnest(range(1, 2 + CAST(n.doc_id % 3 AS INT))) AS j
      ) j
    ),
    kept AS (
      SELECT e.src, e.dst
      FROM raw_edges e JOIN nodes t ON t.doc_id = e.dst
    ),
    edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM kept
        UNION ALL
        SELECT dst AS src, src AS dst FROM kept WHERE src % 9 = 0
      )
    )
    SELECT e.src AS a, e.dst AS b
    FROM edges e JOIN edges r ON r.src = e.dst AND r.dst = e.src
    WHERE e.src < e.dst ORDER BY a, b
"""

QUERIES["recrawl_schedule"] = q_recrawl_schedule
ORACLES["recrawl_schedule"] = ORACLE_RECRAWL_SCHEDULE
QUERIES["reciprocal_links"] = q_reciprocal_links
ORACLES["reciprocal_links"] = ORACLE_RECIPROCAL_LINKS


# ---------------------------------------------------------------------------
# substring_dup_spans: cross-document EXACT repeated-substring detection —
# the filter-stage signal behind suffix-array substring dedup of training
# corpora (Lee et al., "Deduplicating Training Data Makes Language Models
# Better", ACL'22 — public paper; method re-expressed, no code). Instead
# of a distributed suffix array, documents are fingerprinted by WINNOWING
# (Schleimer/Wilkerson/Aiken, SIGMOD'03): over all width-24 character
# grams, each window of 8 consecutive gram positions selects its
# minimum-hash gram (tie -> leftmost). Selection depends only on CONTENT,
# never on position parity, so two copies of a duplicated run always
# select the same grams — the winnowing guarantee: any shared run of
# >= W + S - 1 = 31 chars yields at least one shared fingerprint.
# (A positional stride-8 lattice would be cheaper but has NO such
# guarantee: the two copies can sit in different alignment classes and
# share zero sampled grams.)
#
# Scale shape: fingerprint selection is ROW-LOCAL (HOFs over the gram
# array — no shuffle, no window exchange; O(len*S) slice mins per doc,
# the price of expressing a sliding min without a deque). Only selected
# fingerprints (~2/(S+1) of positions) reach the single gram-keyed
# shuffle, which partial-aggregates map-side. Docs shorter than 31 chars
# have no full window and are out of contract (as in winnowing itself).
# Gram hash is the md5-hex->bigint idiom so DuckDB reproduces selection
# bit-exactly.
# ---------------------------------------------------------------------------

_SUB_W = 24  # gram width (chars)
_SUB_S = 8   # winnow window (gram positions)


def q_substring_dup_spans(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").where(F.length("text") >= _SUB_W + _SUB_S - 1)
    # key = fixed-width hash-hex || '-' || fixed-width position: string min
    # == (hash, position) lexicographic min, both engines
    keyed = d.select(
        "doc_id",
        "text",
        F.expr(
            f"transform(sequence(0, CAST(length(text) - {_SUB_W} AS INT)), k -> "
            f"concat(substring(md5(substring(text, k + 1, {_SUB_W})), 1, 15), '-', "
            f"lpad(CAST(k AS STRING), 10, '0')))"
        ).alias("keys"),
    )
    # sliding window-min via a sparse table (S = 8 = 4 + 4): three O(len)
    # zip_with levels replace the O(len*S) per-position slice+array_min —
    # m2[k] = min(keys[k..k+1]), m4[k] = min(keys[k..k+3]), window min at
    # w = least(m4[w], m4[w+4]) (overlap-free since 8 = 4+4). Same value
    # as min over [w, w+7], so the oracle is untouched. Measured 15.9 s -> 4.8 s at sf0.1.
    sel = (
        keyed.withColumn(
            "m2", F.expr("zip_with(keys, slice(keys, 2, size(keys) - 1), (x, y) -> least(x, y))")
        )
        .withColumn(
            "m4", F.expr("zip_with(m2, slice(m2, 3, size(m2) - 2), (x, y) -> least(x, y))")
        )
        .select(
            "doc_id",
            "text",
            # zip_with pads the shorter side with nulls (least skips
            # them), so each level's tail holds truncated-window mins —
            # slice to the exact full-window count n - S + 1 before
            # dedup, or trailing sub-8 windows would leak extra keys
            F.explode(
                F.expr(
                    "array_distinct(slice("
                    "  zip_with(m4, slice(m4, 5, size(m4) - 4), (x, y) -> least(x, y)),"
                    f"  1, size(keys) - {_SUB_S - 1}))"
                )
            ).alias("wkey"),
        )
    )
    grams = sel.select(
        "doc_id",
        F.expr(
            f"substring(text, CAST(substring(wkey, 17) AS INT) + 1, {_SUB_W})"
        ).alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy("gram")
    )


ORACLE_SUBSTRING_DUP_SPANS = f"""
    WITH d AS (
      SELECT doc_id, text FROM documents
      WHERE length(text) >= {_SUB_W} + {_SUB_S} - 1
    ),
    keyed AS (
      SELECT d.doc_id, d.text, k.k AS k, length(d.text) AS len,
             substr(md5(substr(d.text, CAST(k.k + 1 AS INT), {_SUB_W})), 1, 15)
               || '-' || lpad(CAST(k.k AS VARCHAR), 10, '0') AS key
      FROM d, LATERAL unnest(generate_series(0, length(d.text) - {_SUB_W})) AS k(k)
    ),
    wins AS (
      SELECT doc_id, text, k AS w, len,
             min(key) OVER (PARTITION BY doc_id ORDER BY k
               ROWS BETWEEN CURRENT ROW AND {_SUB_S - 1} FOLLOWING) AS wkey
      FROM keyed
    ),
    sel AS (
      SELECT DISTINCT doc_id, text, wkey FROM wins
      WHERE w <= len - {_SUB_W} - {_SUB_S} + 1
    ),
    grams AS (
      SELECT doc_id,
             substr(text, CAST(substr(wkey, 17) AS BIGINT) + 1, {_SUB_W}) AS gram
      FROM sel
    )
    SELECT gram,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occ
    FROM grams GROUP BY gram
    HAVING count(DISTINCT doc_id) >= 2
    ORDER BY gram
"""

QUERIES["substring_dup_spans"] = q_substring_dup_spans
ORACLES["substring_dup_spans"] = ORACLE_SUBSTRING_DUP_SPANS


# ---------------------------------------------------------------------------
# Intra-document repetition audit — the WITHIN-doc counterpart of the
# cross-doc dedup family (Lee et al. ACL'22 treat repeated substrings
# inside one document as its own dedup axis; boilerplate and templated
# pages repeat the same n-gram dozens of times). Per document: how many
# token trigrams are repeats of an EARLIER occurrence in the same doc,
# as integer parts-per-million of the doc's trigram count.
#
# Scale shape: one explode to (doc_id, gram, pos), one (doc_id, gram)
# groupBy computing per-gram occurrence counts (every occurrence after
# the first is a repeat — no per-position window, no self-join), one
# (doc_id) rollup that reuses the same hash-partitioning. Repeat counts
# are order-free aggregates, so the whole audit is two map-side-combining
# shuffles regardless of document length — at 10^10 docs nothing is
# quadratic and no row exceeds the doc's own gram count.
# ---------------------------------------------------------------------------

_REP_W = 3  # trigrams


def q_intradoc_repetition(spark, sf_dir):
    grams = (
        _docs_tokens(spark, sf_dir)
        .where(F.size("tokens") >= _REP_W)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(tokens) - {_REP_W}), "
                    f"i -> lower(concat_ws(' ', slice(tokens, i + 1, {_REP_W}))))"
                )
            ).alias("gram"),
        )
    )
    per_gram = grams.groupBy("doc_id", "gram").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.sum("n_occ").alias("n_grams"),
            F.sum(F.col("n_occ") - 1).alias("n_repeats"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_repeats",
            F.expr("(1000000 * n_repeats) div n_grams").alias("repeat_ppm"),
        )
        .orderBy("doc_id")
    )


ORACLE_INTRADOC_REPETITION = f"""
    WITH grams AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, len(tokens) - {_REP_W} + 2),
               i -> lower(array_to_string(list_slice(tokens, i, i + {_REP_W} - 1), ' '))
             )) AS gram
      FROM ({_TOKENS_SQL}) WHERE len(tokens) >= {_REP_W}
    ),
    per_gram AS (
      SELECT doc_id, gram, count(*) AS n_occ FROM grams GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(n_occ) AS BIGINT) AS n_grams,
           CAST(sum(n_occ - 1) AS BIGINT) AS n_repeats,
           CAST((1000000 * sum(n_occ - 1)) // sum(n_occ) AS BIGINT) AS repeat_ppm
    FROM per_gram GROUP BY doc_id ORDER BY doc_id
"""

QUERIES["intradoc_repetition"] = q_intradoc_repetition
ORACLES["intradoc_repetition"] = ORACLE_INTRADOC_REPETITION
