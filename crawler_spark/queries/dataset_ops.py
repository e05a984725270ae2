"""Dataset-shaping operators: the jobs that turn a deduplicated corpus
into a shippable training set — as-of joins against slowly-changing
state, repetition-quality gates (Gopher-style), PII scrubbing, balanced
per-domain sampling, calibration quantiles, and normalize-then-dedup.

Same design rules as pipeline_ops.py / corpus_ops.py:
- hot-path logic JVM-side (built-in functions only; no Python rows)
- every ratio is exact integer arithmetic (ppm numerators multiplied
  before the integer divide), so value hashes match DuckDB bit-exactly
- hashing is md5-based so DuckDB reproduces it
- scalars the plan needs ride as broadcast 1-row aggregates or window
  counts, never driver-side actions
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crawler_spark.queries.pipeline_ops import (
    _TOKENS_SQL,
    _docs_tokens,
    _t,
)

# ---------------------------------------------------------------------------
# As-of join (point-in-time lookup): for every observation event, the
# latest state snapshot at-or-before its timestamp, per key. The classic
# operator Spark's join zoo lacks (DuckDB/kdb ship it natively); the
# Spark-first expression is union-tag + one per-key ordered window with a
# forward-carried last(ignorenulls) — ONE shuffle on the key, no range
# explosion, no per-probe subquery.
#
# Here the "state" stream is derived from the events table itself
# (event_type = 'error' rows act as per-user state snapshots) so the
# DuckDB ASOF JOIN oracle runs on the same input with no side data.
#
# Scale shape: one hash-partition on user_id + per-partition sort —
# identical cost to any windowed dedup; skewed keys fall to AQE. The
# snapshot side is typically << the probe side; it rides the SAME
# shuffle (union) instead of a broadcast so the plan is size-agnostic.
# Ties: snapshots at the same (user, ts) are pre-collapsed to max
# snap_id; at probe_ts == snap_ts the snapshot wins (inclusive >=),
# encoded by sorting markers before probes at equal ts.
# ---------------------------------------------------------------------------


def q_asof_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    snaps = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("snap_id"))
    )
    probes = ev.where(F.col("event_type") != "error").select(
        "event_id", "user_id", "ts"
    )
    tagged = snaps.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_probe"),
        "snap_id",
        F.col("ts").alias("snap_ts"),
        F.lit(None).cast("long").alias("event_id"),
    ).unionByName(
        probes.select(
            "user_id",
            "ts",
            F.lit(1).alias("is_probe"),
            F.lit(None).cast("long").alias("snap_id"),
            F.lit(None).cast("timestamp_ntz").alias("snap_ts"),
            "event_id",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "is_probe",
        F.last("snap_id", ignorenulls=True).over(w).alias("asof_snap_id"),
        F.last("snap_ts", ignorenulls=True).over(w).alias("asof_snap_ts"),
    )
    return (
        carried.where(F.col("is_probe") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("asof_snap_id").alias("snap_id"),
            F.expr(
                "timestampdiff(MICROSECOND, asof_snap_ts, ts) div 1000"
            ).alias("staleness_ms"),
        )
        .orderBy("event_id")
    )


ORACLE_ASOF_JOIN = """
    WITH snaps AS (
      SELECT user_id, ts, max(event_id) AS snap_id
      FROM events WHERE event_type = 'error' GROUP BY 1, 2
    ),
    probes AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type != 'error'
    )
    SELECT p.event_id, p.user_id, s.snap_id,
           (epoch_us(p.ts) - epoch_us(s.ts)) // 1000 AS staleness_ms
    FROM probes p ASOF LEFT JOIN snaps s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    ORDER BY p.event_id
"""


# ---------------------------------------------------------------------------
# Repetition-quality metrics (the Gopher-rule family): per document, the
# duplicate-bigram mass and the single-most-frequent-token share — the
# two cheapest high-signal gates for boilerplate / generated spam.
#
# dup_bigram_ppm = (total_bigrams - distinct_bigrams) * 1e6 // total
# top_token_ppm  = max_token_count * 1e6 // n_tokens
#
# Scale shape: bigram stats are row-local array expressions (zero
# shuffle); the top-token count explodes to (doc_id, token) and
# aggregates twice — both aggs hash-based with map-side partial combine,
# keyed by doc_id so the reduce is per-document, never corpus-wide.
# ---------------------------------------------------------------------------

_BIGRAMS_SPARK = (
    "transform(sequence(1, size(tokens) - 1), "
    "i -> concat(element_at(tokens, i), ' ', element_at(tokens, i + 1)))"
)

_BIGRAMS_SQL = (
    "list_transform(range(1, len(tokens)), "
    "i -> tokens[i] || ' ' || tokens[i + 1])"
)


def q_gopher_quality(spark, sf_dir):
    toks = _docs_tokens(spark, sf_dir).where(F.size("tokens") >= 2)
    bg = toks.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.expr(_BIGRAMS_SPARK).alias("bigrams"),
    ).select(
        "doc_id",
        "n_tokens",
        F.size("bigrams").alias("total_bg"),
        F.size(F.array_distinct("bigrams")).alias("distinct_bg"),
    )
    top = (
        toks.select("doc_id", F.explode("tokens").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_tok"))
    )
    return (
        bg.join(top, "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.expr(
                "(cast(total_bg - distinct_bg as bigint) * 1000000) div total_bg"
            ).alias("dup_bigram_ppm"),
            F.expr("(cast(max_tok as bigint) * 1000000) div n_tokens").alias(
                "top_token_ppm"
            ),
        )
        .orderBy("doc_id")
    )


ORACLE_GOPHER_QUALITY = f"""
    WITH toks AS (
      SELECT doc_id, tokens FROM ({_TOKENS_SQL}) WHERE len(tokens) >= 2
    ),
    bg AS (
      SELECT doc_id, len(tokens) AS n_tokens,
             len({_BIGRAMS_SQL}) AS total_bg,
             len(list_distinct({_BIGRAMS_SQL})) AS distinct_bg
      FROM toks
    ),
    tokc AS (
      SELECT doc_id, unnest(tokens) AS tok FROM toks
    ),
    per_tok AS (
      SELECT doc_id, tok, count(*) AS c FROM tokc GROUP BY 1, 2
    ),
    top AS (
      SELECT doc_id, max(c) AS max_tok FROM per_tok GROUP BY 1
    )
    SELECT bg.doc_id,
           CAST(bg.n_tokens AS BIGINT) AS n_tokens,
           (CAST(bg.total_bg - bg.distinct_bg AS BIGINT) * 1000000)
             // bg.total_bg AS dup_bigram_ppm,
           (CAST(top.max_tok AS BIGINT) * 1000000) // bg.n_tokens
             AS top_token_ppm
    FROM bg JOIN top USING (doc_id)
    ORDER BY bg.doc_id
"""


# ---------------------------------------------------------------------------
# PII scrub: redact email addresses and count redactions. Contact lines
# are synthesized deterministically in-query (the corpus generator emits
# none), so the oracle reproduces the input exactly. Both engines run
# the same character-class regex (valid Java regex AND RE2). The
# scrubbed text is returned as an md5 so the gate proves byte-equality
# of the redacted output without shipping the text.
#
# Scale shape: pure row-local JVM expressions — zero shuffle, inside one
# WholeStageCodegen span; this is the shape every scrub/normalize pass
# should have at 100 TB (the scan's partitioning is the plan).
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def q_pii_scrub(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    with_pii = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.org or u"),
                F.col("doc_id").cast("string"),
                F.lit("@test.net"),
            ),
        )
        .when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" mail admin@example.org")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return with_pii.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.md5(F.regexp_replace("text", _EMAIL_RE, "<EMAIL>")).alias("scrubbed_md5"),
    ).orderBy("doc_id")


ORACLE_PII_SCRUB = f"""
    WITH with_pii AS (
      SELECT doc_id,
             CASE
               WHEN doc_id % 4 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.org or u' || CAST(doc_id AS VARCHAR) || '@test.net'
               WHEN doc_id % 7 = 0 THEN text || ' mail admin@example.org'
               ELSE text
             END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           md5(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g')) AS scrubbed_md5
    FROM with_pii ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Balanced per-domain sampling: cap every source at ~DOMAIN_SAMPLE_CAP
# docs via a deterministic hash-threshold — the corpus-balancing pass
# that stops one mega-site from dominating a training mix. keep iff
# u * n_source < cap * 1e6, with u = md5-uniform in [0, 1e6): exact
# integers, no floats, append-stable (a doc's keep bit never changes as
# OTHER sources grow; it only tightens as its own source grows — the
# property that makes the sample re-derivable per partition).
#
# Scale shape: n_source is a window count over source (one shuffle);
# at the store layer source is the partition key so the count is
# partition-local. The filter itself is row-local.
# ---------------------------------------------------------------------------

DOMAIN_SAMPLE_CAP = 40


def q_domain_sample(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 1000000
    )
    n = F.count(F.lit(1)).over(Window.partitionBy("source"))
    return (
        d.select("doc_id", "source", u.alias("u"), n.alias("n_source"))
        .where(F.col("u") * F.col("n_source") < DOMAIN_SAMPLE_CAP * 1000000)
        .select("doc_id", "source", "u", "n_source")
        .orderBy("doc_id")
    )


ORACLE_DOMAIN_SAMPLE = f"""
    WITH base AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 AS u,
             count(*) OVER (PARTITION BY source) AS n_source
      FROM documents
    )
    SELECT doc_id, source, u, CAST(n_source AS BIGINT) AS n_source
    FROM base
    WHERE u * n_source < {DOMAIN_SAMPLE_CAP} * 1000000
    ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Calibration quantiles: nearest-rank p50/p90/p99 of per-doc token
# counts, per language — the thresholds a quality gate is tuned against.
# Nearest-rank (rank = (n-1)*p // 1 + 1 over the sorted counts) instead
# of interpolated percentile: the result is an ELEMENT of the data,
# integer-exact on both engines — no float interpolation to diverge by
# a ulp.
#
# Scale shape: one shuffle partitions by lang; the per-lang sort is the
# window. A 100-TB variant would pre-aggregate to (lang, n_tok, count)
# first — noted, not needed at gate scale.
# ---------------------------------------------------------------------------


def q_length_quantiles(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        "lang",
        "doc_id",
        F.size(F.filter(F.split("text", r"\s+"), lambda t: F.length(t) > 0)).alias(
            "n_tok"
        ),
    )
    w = Window.partitionBy("lang").orderBy("n_tok", "doc_id")
    ranked = d.select(
        "lang",
        "n_tok",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
    )
    return (
        ranked.groupBy("lang")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            F.max(
                F.when(F.col("rk") == F.expr("(n - 1) div 2 + 1"), F.col("n_tok"))
            ).cast("long").alias("p50_tokens"),
            F.max(
                F.when(
                    F.col("rk") == F.expr("((n - 1) * 9) div 10 + 1"), F.col("n_tok")
                )
            ).cast("long").alias("p90_tokens"),
            F.max(
                F.when(
                    F.col("rk") == F.expr("((n - 1) * 99) div 100 + 1"), F.col("n_tok")
                )
            ).cast("long").alias("p99_tokens"),
        )
        .orderBy("lang")
    )


ORACLE_LENGTH_QUANTILES = """
    WITH counts AS (
      SELECT lang, doc_id,
             len(list_filter(regexp_split_to_array(text, '\\s+'),
                             t -> length(t) > 0)) AS n_tok
      FROM documents
    ),
    ranked AS (
      SELECT lang, n_tok,
             row_number() OVER (PARTITION BY lang ORDER BY n_tok, doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
      FROM counts
    )
    SELECT lang,
           CAST(max(n) AS BIGINT) AS n_docs,
           CAST(max(CASE WHEN rk = (n - 1) // 2 + 1 THEN n_tok END) AS BIGINT)
             AS p50_tokens,
           CAST(max(CASE WHEN rk = ((n - 1) * 9) // 10 + 1 THEN n_tok END) AS BIGINT)
             AS p90_tokens,
           CAST(max(CASE WHEN rk = ((n - 1) * 99) // 100 + 1 THEN n_tok END) AS BIGINT)
             AS p99_tokens
    FROM ranked GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Normalize-then-dedup: casefold + strip non-alphanumerics + collapse
# whitespace, THEN exact-hash dedup — catches the re-encoded / shouted /
# punctuation-sprayed duplicates exact dedup misses. Variant copies are
# synthesized in-query (every 6th doc reappears uppercased with
# punctuation noise) so the oracle sees the same corpus.
#
# Scale shape: normalization is row-local JVM regex (one codegen span);
# the dedup is the same hash-groupBy as dedup_exact.
# ---------------------------------------------------------------------------


def q_normalize_dedup(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    noisy = d.where("doc_id % 6 = 0").select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.lit("** "), F.upper("text"), F.lit(" !!")).alias("text"),
    )
    corpus = d.unionByName(noisy)
    norm = F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "))
    return (
        corpus.groupBy(F.md5(norm).alias("content_key"))
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .where(F.col("n_copies") > 1)
        .orderBy("content_key")
    )


ORACLE_NORMALIZE_DEDUP = """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 2000000, '** ' || upper(text) || ' !!'
      FROM documents WHERE doc_id % 6 = 0
    )
    SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS content_key,
           min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM corpus
    GROUP BY 1 HAVING count(*) > 1 ORDER BY content_key
"""


QUERIES = {
    "asof_join": q_asof_join,
    "gopher_quality": q_gopher_quality,
    "pii_scrub": q_pii_scrub,
    "domain_sample": q_domain_sample,
    "length_quantiles": q_length_quantiles,
    "normalize_dedup": q_normalize_dedup,
}

ORACLES = {
    "asof_join": ORACLE_ASOF_JOIN,
    "gopher_quality": ORACLE_GOPHER_QUALITY,
    "pii_scrub": ORACLE_PII_SCRUB,
    "domain_sample": ORACLE_DOMAIN_SAMPLE,
    "length_quantiles": ORACLE_LENGTH_QUANTILES,
    "normalize_dedup": ORACLE_NORMALIZE_DEDUP,
}


# ---------------------------------------------------------------------------
# Temperature-based source resampling — the training-mix rebalancer:
# big sources are DOWN-weighted toward sqrt scale (alpha = 1/2 mixing,
# the multilingual-LM standard for flattening a skewed source mix), by
# keeping per source only the SAMPLE_MULT * floor(sqrt(n_source))
# lowest-md5-rank documents. Deterministic: the kept set is a pure
# function of (doc_id, source) — re-runs and engines agree bit-for-bit.
# sqrt of an exact integer is correctly rounded in IEEE on both engines
# (exact for perfect squares), so the floor can't straddle engines.
#
# Scale shape: two functions over ONE window shuffle on source (count +
# md5 rank share the partitioning); at the store the source is a
# partition key, so the shuffle is partition-local. Never a sampling
# job, never a driver-side count.
# ---------------------------------------------------------------------------

SAMPLE_MULT = 4


def q_source_temperature_sample(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source")
    r = d.select(
        "doc_id",
        "source",
        F.count(F.lit(1)).over(w).alias("n_source"),
        F.row_number().over(
            w.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        ).alias("rk"),
    ).withColumn(
        "target_n",
        (F.lit(SAMPLE_MULT) * F.floor(F.sqrt(F.col("n_source")))).cast("long"),
    )
    return (
        r.where(F.col("rk") <= F.col("target_n"))
        .select("doc_id", "source", "n_source", "target_n")
        .orderBy("doc_id")
    )


ORACLE_SOURCE_TEMPERATURE_SAMPLE = f"""
    WITH r AS (
      SELECT doc_id, source,
             count(*) OVER (PARTITION BY source) AS n_source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM documents
    )
    SELECT doc_id, source, CAST(n_source AS BIGINT) AS n_source,
           CAST({SAMPLE_MULT} * floor(sqrt(n_source)) AS BIGINT) AS target_n
    FROM r
    WHERE rk <= {SAMPLE_MULT} * floor(sqrt(n_source))
    ORDER BY doc_id
"""

QUERIES["source_temperature_sample"] = q_source_temperature_sample
ORACLES["source_temperature_sample"] = ORACLE_SOURCE_TEMPERATURE_SAMPLE
