"""One crawl round as one DataFrame job (SURVEY.md §3.2).

Pipeline (every stage JVM-side except the two parse UDFs):

  pending   = frontier ⟕anti scheduled          (queue state, append-only)
  admitted  = per-host salted window rank ≤ budget   (P1-P7 + F6 robots delay)
  fetched   = admitted ⋈ redirect_closure ⋈ documents (A1 + S9)
  branched  = decide_branches UDF → direction/meta/form refetch loop (A2/A3)
  passed    = store-include filter on final URL  (F1 at store time)
  completed = explode(redirect chains)           (D4)
  stored    = quota cutoff by global rank        (F4)
  links     = extract_links UDF → resolve        (H2, U5-U6)
  admitted' = dedup (bloom + anti-join url_seen, D1) → filters → seq (D2/D3)

Scale posture: all state tables are append-only and hash-bucketable
(frontier/scheduled by host_hash, url_seen by url_hash); the only global
orderings (fetch rank, seq assignment) use the two-phase range rank in
ranking.py, never a single-partition window. The per-round admitted batch
is the unit of work — its size is governed by per_host_budget × active
hosts, the round analog of the reference's 20-worker concurrency cap.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_spark.bloom import BloomSidecar
from crawler_spark.config import CrawlConfig
from crawler_spark.plans import expressions as X
from crawler_spark.plans.parse import DECISION_SCHEMA, make_decide
from crawler_spark.plans.ranking import global_rank, rank_bucket


@dataclass
class RoundContext:
    """Static per-run inputs (the synthetic web + rules + config)."""

    spark: SparkSession
    config: CrawlConfig
    documents: DataFrame  # (doc_id, spans) — the web
    closure: DataFrame  # build_redirect_closure output, cached
    robots: DataFrame | None  # (host, allow_prefixes, disallow_prefixes, crawl_delay)
    directions: list
    form_instructions: list
    bloom: BloomSidecar | None = None
    # A5 session jar as of the current round's start (driver-maintained,
    # captured into the decide closure — the broadcast of a config-scale
    # set, like the reference's TVar [Cookie], src/Types.hs:32)
    cookie_jar: frozenset = frozenset()
    # S9 real path: fetch over real sockets (plans/fetch_http.py) instead
    # of the fetch-simulate joins; documents/closure go unused
    http_fetch: bool = False
    # span-free fast path (plans/doc_index.py): hash-bucketed per-corpus
    # index parquet (final, doc_size, route, encoded links) — hop-0 fetch
    # joins move narrow columns via a storage-partitioned bucket lookup,
    # spans re-joined once at the crawled_docs write
    doc_index_path: str | None = None
    # closure row count, measured once at init: when the redirect closure
    # is broadcast-sized, the fetch join broadcasts IT instead of building
    # a batch-keys broadcast to semi-reduce it (a 10^6-key driver-serial
    # relation build probing a 10^2-row table is fixed cost for nothing)
    closure_count: int | None = None


def _err(df: DataFrame, kind: str, url_col, message_col, round_: int) -> DataFrame:
    return df.select(
        F.lit(kind).alias("kind"),
        url_col.alias("url"),
        message_col.alias("message"),
        F.lit(round_).alias("round"),
    )


def pending_frontier(
    frontier: DataFrame, scheduled: DataFrame, watermarks: DataFrame | None = None
) -> DataFrame:
    """Queue state: frontier rows whose seq was never consumed.

    watermarks (host, wm_seq): the COMPACT EXACT representation of the
    consumed set under uniform priority. Per host the scheduler admits
    the first `budget` pending rows by (priority, seq); with priority
    constant that is a seq-prefix of the host's pending list, so by
    induction the consumed seqs per host are exactly {seq <= wm_seq} and
    queue state is one broadcast join + filter — O(hosts) state instead
    of an anti-join whose right side grows with everything ever crawled
    (at 10^10 that anti-join is the frontier's scaling bottleneck; the
    watermark table stays tiny forever). The driver enables this
    whenever config.depth_priority is off (the only non-zero-priority
    source); otherwise the exact anti-join below is used. Measured
    (local[2]+local[8] pinned pair): a shuffle_hash hint on the
    consumed-seq side re-shuffles the whole frontier per consumer and
    lost to the implicit broadcast at BOTH parallelism levels — so the
    fallback keeps the broadcast probe shape."""
    if watermarks is not None:
        return (
            frontier.join(F.broadcast(watermarks), "host", "left")
            .where(F.col("wm_seq").isNull() | (F.col("seq") > F.col("wm_seq")))
            .drop("wm_seq")
        )
    return frontier.join(scheduled.select("seq"), "seq", "left_anti")


def schedule(pending: DataFrame, ctx: RoundContext, max_seq: int | None = None) -> DataFrame:
    """P1-P7: per-host FIFO truncated to budget, then global fetch rank.

    Two-phase salted window (SURVEY.md P6): phase 1 ranks within
    (host, salt) — `scheduler_salts`-way parallel even for one hot host —
    keeping a superset (≤ budget per salt); phase 2 ranks the survivors
    within host exactly. Identical result to a single per-host window, but
    the heavy sort never sees more than (budget × salts) rows per host."""
    cfg = ctx.config
    timing = cfg.scheduler_mode == "timing"
    # politeness crawl_delay divides the budget whenever a robots table is
    # present — independent of respect_robots, which gates only
    # allow/disallow (politeness ≠ access rules; simulator._budget parity)
    if ctx.robots is not None:
        delays = ctx.robots.select("host", "crawl_delay")
        pending = pending.join(F.broadcast(delays), "host", "left")
    else:
        pending = pending.withColumn("crawl_delay", F.lit(None).cast("double"))
    if timing:
        # P7+ virtual-time mode: admit by departure time inside the round
        # window (crawl_logic.timing_eta_ms semantics — the green
        # schedule_timing query wired into the round). The two-phase cap
        # is a safe OVER-estimate; the exact gate is the eta filter below.
        window_ms = cfg.round_window_ms or cfg.per_host_budget * 1000
        pending = pending.withColumn("_delay_s", X.host_delay_col(F.col("crawl_delay")))
        cap = (F.ceil(F.lit(float(window_ms)) / (F.col("_delay_s") * 1000.0)) + 1).cast("int")
        pending = pending.withColumn("budget", cap)
    else:
        pending = pending.withColumn(
            "budget", X.host_budget_col(cfg.per_host_budget, F.col("crawl_delay"))
        )

    salt = F.pmod(F.col("url_hash"), F.lit(cfg.scheduler_salts))
    phase1 = pending.withColumn(
        "_r1",
        F.row_number().over(
            Window.partitionBy("host_hash", salt).orderBy("priority", "seq")
        ),
    ).where(F.col("_r1") <= F.col("budget"))
    admitted = phase1.withColumn(
        "_r2",
        F.row_number().over(Window.partitionBy("host_hash").orderBy("priority", "seq")),
    )
    if timing:
        # same double arithmetic order as crawl_logic.timing_eta_ms
        admitted = admitted.withColumn(
            "eta_ms",
            ((F.col("_r2") - 1) * F.col("_delay_s") * 1000).cast("bigint"),
        ).where(F.col("eta_ms") < window_ms)
    else:
        admitted = admitted.where(F.col("_r2") <= F.col("budget"))
    admitted = admitted.drop(
        "_r1", "_r2", "_delay_s", "budget", "crawl_delay", "status", "discovered_round"
    )
    # materialize_input: the anti-join + double window above would
    # otherwise run twice (range-partitioner sampling pass + shuffle).
    # max_seq (every frontier seq is < the driver's next_seq counter)
    # switches global_rank to deterministic (priority, seq-range)
    # bucketing — no range-sampling job, no second checkpoint
    if timing:
        # fetch order = departure order; eta domain is data-dependent, so
        # timing mode keeps the range-sampling ranker. eta_ms rides along
        # into the scheduled table (departure_ms) so politeness honoring
        # is auditable from the crawl log itself.
        return global_rank(
            admitted, ["eta_ms", "priority", "seq"], "rank", materialize_input=True
        )
    bucket = (
        rank_bucket(F.col("seq"), max_seq, major=F.col("priority"))
        if max_seq else None
    )
    return global_rank(
        admitted, ["priority", "seq"], "rank", materialize_input=True, bucket=bucket
    )


def fetch_and_branch(
    admitted: DataFrame, gate_urls: DataFrame, ctx: RoundContext, round_: int,
    timings: dict | None = None,
):
    """A1 + A2 + H1-H5: redirect-resolved fetch plus the direction →
    meta-refresh → form interaction loop, driver-unrolled with early exit.

    Each hop is ONE materialization: fetch joins (closure + documents,
    both JVM-side) feed the single decide mapInPandas stage, whose output
    carries the complete per-row disposition including failures, store
    include-filtering, and resolved link candidates. Whether any row
    branched (needs another hop) comes back through an accumulator the
    decide stage bumps — the hop's checkpoint job already ran the UDF, so
    the loop-exit test costs zero extra jobs. (Task retries may overcount;
    the test is only `> 0`, and zero can't be overcounted.)

    gate_urls: one-column (url) round-start gate set for the meta-refresh
    checkNotDone (src/Crawl.hs:134-140) = url_seen ∪ pending ∪ admitted.

    Returns the list of per-hop decision DataFrames (all localCheckpointed).
    """
    cfg = ctx.config
    branch_acc = ctx.spark.sparkContext.accumulator(0)
    decide = make_decide(cfg, ctx.directions, ctx.form_instructions, branch_acc, ctx.cookie_jar)
    state = admitted.select(
        F.col("url").alias("scheduled_url"),
        "rank",
        F.col("url").alias("current_url"),
        F.lit(0).alias("hops"),
        F.array().cast("array<string>").alias("chain_cookies"),
    )
    closure = ctx.closure.select(
        F.col("src_url").alias("current_url"),
        F.col("final_url").alias("_closure_final"),
        F.col("visited").alias("_closure_visited"),
        F.col("aborted").alias("_closure_aborted"),
    )
    decision_parts = []

    # Broadcast semi-join reduction: the web-scale sides (closure,
    # documents-with-spans) are first cut down to the rows this batch can
    # touch by probing them with the BROADCAST batch keys — one streamed
    # scan each, zero shuffle and zero broadcast of the big tables. The
    # outer joins that must preserve unmatched batch rows (fetch failure =
    # no document) then run between batch-sized inputs only. A plain
    # state⟕documents left join cannot get this shape: the preserved side
    # is the small one, and a broadcast hash join can never preserve its
    # build side — so Catalyst either shuffles the full span payload per
    # hop (sort-merge) or, with post-checkpoint unknown stats, broadcasts
    # the whole web.
    state_size: int | None = None  # exact from the accumulator for hops > 0
    for _hop in range(cfg.max_interaction_hops + 1):
        if ctx.http_fetch:
            # real-socket path: one mapInPandas stage replaces both web-table
            # joins; schema-identical output feeds the same decide stage
            from crawler_spark.plans.fetch_http import HTTP_FETCH_SCHEMA, make_http_fetch

            fetched = state.mapInPandas(
                make_http_fetch(cfg, ctx.cookie_jar), HTTP_FETCH_SCHEMA
            )
            acc_before = branch_acc.value
            decisions = fetched.mapInPandas(decide, DECISION_SCHEMA).localCheckpoint()
            decision_parts.append(decisions)
            if branch_acc.value == acc_before:
                break
            state_size = branch_acc.value - acc_before
            meta_ok = (
                decisions.where("decision = 'meta'")
                .join(gate_urls.withColumnRenamed("url", "next_url"), "next_url", "left_anti")
                .select(*decisions.columns)
            )
            hopped = decisions.where("decision in ('direction', 'form')").unionByName(meta_ok)
            state = hopped.select(
                "scheduled_url",
                "rank",
                F.col("next_url").alias("current_url"),
                (F.col("hops") + 1).alias("hops"),
                "chain_cookies",
            )
            continue
        point_lookup = (
            state_size is not None
            and cfg.point_lookup_threshold > 0
            and state_size <= cfg.point_lookup_threshold
        )
        closure_small = ctx.closure_count is not None and ctx.closure_count <= 250_000
        if closure_small:
            # tiny closure: Catalyst broadcasts the closure side of the
            # left join directly — no batch-keys relation build at all
            closure_rel = closure
        elif point_lookup:
            # Point-lookup path for the (tiny) branch hops: collect the
            # hop's keys and push IN filters into the parquet scans —
            # row-group min/max skipping instead of streaming the whole
            # web for a handful of direction/meta/form refetches. Two
            # driver collects over ≤ threshold rows buy skipping two
            # full-table scans.
            cur_urls = [r["current_url"] for r in state.select("current_url").distinct().collect()]
            closure_rel = closure.where(F.col("current_url").isin(cur_urls)) if cur_urls else closure.where(F.lit(False))
        else:
            # broadcast the batch KEYS AS 64-BIT HASHES, not URL strings:
            # the broadcast build (collect + hash-relation) is driver-
            # serial, and 1.5M longs build ~8x faster than 1.5M strings.
            # A hash collision only admits an extra row into the reduced
            # relation — the exact equi-join on current_url below filters
            # it, so the semi-reduction stays a correct superset.
            closure_rel = closure.withColumn(
                "_ck", F.xxhash64("current_url")
            ).join(
                F.broadcast(state.select(F.xxhash64("current_url").alias("_ck"))),
                "_ck",
                "left_semi",
            ).drop("_ck")
        swf = (
            state.join(closure_rel, "current_url", "left")
            .withColumn("final", F.coalesce(F.col("_closure_final"), F.col("current_url")))
            .withColumn(
                "visited", F.coalesce(F.col("_closure_visited"), F.array(F.col("current_url")))
            )
            .withColumn("aborted", F.coalesce(F.col("_closure_aborted"), F.lit(False)))
            .drop("_closure_final", "_closure_visited", "_closure_aborted")
        )
        import time as _t

        if _hop == 0 and ctx.doc_index_path is not None:
            # Span-free hop (plans/doc_index.py): join the NARROW derived
            # index instead of the span-carrying documents — the round's
            # biggest non-scaling cost was the span memcpy through the
            # fetch checkpoint (f_mat), which no core count absorbs. Spans
            # re-enter exactly twice: the (small) routed subset for the
            # Python decide, and the stored rows at the crawled_docs write
            # (run_round's re-join) — the output movement that must happen.
            #
            # The index side arrives via the storage-partitioned bucket
            # lookup (doc_index.make_bucket_lookup): the batch's keys are
            # repartitioned by the index's hash-bucket function and an
            # Arrow stage reads only the matching bucket files — a
            # DISTRIBUTED semi-reduction. Its predecessor, a batch-keys
            # broadcast semi-join, had a driver-serial O(batch) relation
            # build that capped f_mat's measured N→4N scaling at ~1.6×
            # once rounds reached multi-million-URL size. The final left
            # join keys on xxhash64 first so the sort compares longs, not
            # long-common-prefix URL strings (exactness kept by the
            # string column in the join key).
            acc_before = branch_acc.value
            _t0 = _t.time()
            ctx.spark.sparkContext.setJobDescription("phase:f_mat")
            from crawler_spark.plans.doc_index import (
                N_BUCKETS,
                LOOKUP_SCHEMA,
                bucket_col,
                decode_links_col,
                make_bucket_lookup,
            )

            keys = swf.select(bucket_col(F.col("final")).alias("_bkt"), "final")
            idx_rel = keys.repartition(N_BUCKETS, "_bkt").mapInPandas(
                make_bucket_lookup(ctx.doc_index_path), LOOKUP_SCHEMA
            )
            fn = (
                swf.withColumn("_jk", F.xxhash64("final"))
                .join(
                    idx_rel.withColumn("_jk", F.xxhash64("final")),
                    ["_jk", "final"],
                    "left",
                )
                .drop("_jk")
                .withColumn(
                    "too_big",
                    F.coalesce(F.col("doc_size") > F.lit(cfg.max_content_bytes), F.lit(False)),
                )
                .withColumn(
                    "_route",
                    F.col("aborted")
                    | F.col("doc_size").isNull()  # no doc ⇒ spans would be null
                    | F.col("too_big")
                    | F.coalesce(F.col("route"), F.lit(True)),
                )
                .localCheckpoint()
            )
            if timings is not None:
                timings["f_mat"] = round(_t.time() - _t0, 2)
                _t0 = _t.time()
            ctx.spark.sparkContext.setJobDescription("phase:f_decide")
            from crawler_spark.plans.extract import plain_decisions

            plain = plain_decisions(
                fn.where(~F.col("_route"))
                .withColumn(
                    "links", decode_links_col(F.col("links_urls"), F.col("links_hosts"))
                )
                .drop("_route", "doc_size", "route", "links_urls", "links_hosts"),
                cfg,
                links_col="links",
            )
            routed = fn.where(F.col("_route")).drop(
                "_route", "doc_size", "route", "links_urls", "links_hosts"
            )
            docs_sp = ctx.documents.withColumnRenamed("doc_id", "final").select("final", "spans")
            docs_routed = docs_sp.withColumn("_fk", F.xxhash64("final")).join(
                F.broadcast(routed.select(F.xxhash64("final").alias("_fk"))),
                "_fk",
                "left_semi",
            ).drop("_fk")
            decisions = (
                routed.join(docs_routed, "final", "left")
                .mapInPandas(decide, DECISION_SCHEMA)
                .unionByName(plain)
                .localCheckpoint()
            )
            if timings is not None:
                timings["f_decide"] = round(_t.time() - _t0, 2)
            decision_parts.append(decisions)
            if branch_acc.value == acc_before:
                break
            state_size = branch_acc.value - acc_before
            meta_ok = (
                decisions.where("decision = 'meta'")
                .join(gate_urls.withColumnRenamed("url", "next_url"), "next_url", "left_anti")
                .select(*decisions.columns)
            )
            hopped = decisions.where("decision in ('direction', 'form')").unionByName(meta_ok)
            state = hopped.select(
                "scheduled_url",
                "rank",
                F.col("next_url").alias("current_url"),
                (F.col("hops") + 1).alias("hops"),
                "chain_cookies",
            )
            continue

        docs = ctx.documents.withColumnRenamed("doc_id", "final")
        if point_lookup:
            finals = [r["final"] for r in swf.select("final").distinct().collect()]
            docs_rel = docs.where(F.col("final").isin(finals)) if finals else docs.where(F.lit(False))
        else:
            # always the reduction here: `docs` carries spans, and a
            # shuffle of the payload loses to the serial key build at
            # every measured batch/corpus ratio (see the crawled re-join)
            # same hashed-key broadcast trick as closure_rel above
            docs_rel = docs.withColumn("_fk", F.xxhash64("final")).join(
                F.broadcast(swf.select(F.xxhash64("final").alias("_fk"))),
                "_fk",
                "left_semi",
            ).drop("_fk")
        fetched = (
            swf.join(docs_rel, "final", "left")
            .withColumn(
                "too_big",
                F.coalesce(
                    X.doc_size_col(F.col("spans")) > F.lit(cfg.max_content_bytes), F.lit(False)
                ),
            )
        )
        acc_before = branch_acc.value
        # directions force route_python_col to lit(True) (A3 regexes only
        # evaluate under Python re) — the split would checkpoint the full
        # span payload just to route everything to Python anyway
        import time as _t

        _t0 = _t.time()
        if _hop == 0 and cfg.vectorized_extract and not ctx.directions:
            # JVM fast path (plans/extract.py): the fetch join is
            # materialized once, then split — plain rows are decided by
            # Catalyst expressions (spans never cross Arrow), only
            # branch-capable/failed/slow-href rows run the Python loop.
            # One extra checkpoint job per round buys the decide stage
            # out of Python for the common case; later hops are tiny
            # (point-lookup scale) and branch-heavy by construction, so
            # they keep the single Python stage.
            from crawler_spark.plans.extract import plain_decisions, route_python_col

            fetched = fetched.localCheckpoint()
            if timings is not None and _hop == 0:
                timings["f_mat"] = round(_t.time() - _t0, 2)
                _t0 = _t.time()
            route = route_python_col(ctx.directions)
            decisions = (
                fetched.where(route)
                .mapInPandas(decide, DECISION_SCHEMA)
                .unionByName(plain_decisions(fetched.where(~route), cfg))
                .localCheckpoint()
            )
        else:
            decisions = fetched.mapInPandas(decide, DECISION_SCHEMA).localCheckpoint()
        if timings is not None and _hop == 0:
            timings["f_decide"] = round(_t.time() - _t0, 2)
        decision_parts.append(decisions)
        if branch_acc.value == acc_before:
            break
        state_size = branch_acc.value - acc_before  # ≥ next hop's row count
        # meta-refresh gate: target already seen/pending/admitted ⇒ the row
        # is dropped entirely — nothing stored (src/Crawl.hs:138-140)
        meta_ok = (
            decisions.where("decision = 'meta'")
            .join(gate_urls.withColumnRenamed("url", "next_url"), "next_url", "left_anti")
            .select(*decisions.columns)
        )
        hopped = decisions.where("decision in ('direction', 'form')").unionByName(meta_ok)
        state = hopped.select(
            "scheduled_url",
            "rank",
            F.col("next_url").alias("current_url"),
            (F.col("hops") + 1).alias("hops"),
            "chain_cookies",
        )

    return decision_parts


def admit_candidates(
    occurrences: DataFrame,
    seen_urls: DataFrame,
    pending_urls: DataFrame,
    ctx: RoundContext,
    round_: int,
    next_seq: int,
    seen_delta_urls: DataFrame | None = None,
    max_rank: int | None = None,
    timings: dict | None = None,
):
    """Shared D1-D3 admission pipeline (also used for seeding, S1/S2).

    occurrences: (url, host, ord_rank, ord_sub, prio) — every extraction
    occurrence, in discovery order (ord_rank = discovering fetch rank,
    ord_sub = extraction order; seeds use (0, input position)). prio is
    the priority the URL receives if this occurrence wins first-discovery
    (0, or parent depth + 1 under config.depth_priority).
    seen_urls / pending_urls: one-column (url) sets to exclude.
    seen_delta_urls: THIS round's url_seen append — not yet in the bloom
    sidecar (it merges at round commit), so it is anti-joined exactly for
    every candidate; it is one round's delta, i.e. small.

    Gate semantics replicate simulator._enqueue for error parity: the
    host-null error is logged PER OCCURRENCE of an include-passing URL
    (simulator logs on every enqueue attempt), so the error branch reads
    the pre-dedup occurrence stream; every other gate (seen / include /
    robots / pending) is URL-level — identical for all occurrences of a
    URL — so first-discovery dedup commutes with them and runs FIRST,
    cutting the bloom Arrow pass and every downstream join from
    occurrence volume to unique-URL volume. (A null-host URL can never
    be in url_seen or pending — admission rejects it — so skipping the
    seen gate in the error branch drops nothing the simulator keeps.)

    The seen anti-join is bloom-prefiltered when a sidecar is configured:
    candidates whose bucket bloom says "definitely new" skip the exact
    anti-join entirely (src/Types.hs:35-36 at 10^10 scale, SURVEY.md D1).
    """
    import time as _t

    _lt = [_t.time()]

    def _sublap(name):
        if timings is not None:
            timings[name] = round(_t.time() - _lt[0], 2)
        _lt[0] = _t.time()

    cfg = ctx.config
    occ = occurrences
    host_null_errors = _err(
        occ.where(
            X.include_match_col(
                F.col("url"), F.col("host"),
                list(cfg.url_include_patterns), list(cfg.domain_include_patterns),
            )
        ).where(F.col("host").isNull()),
        "GeneralError",
        F.col("url"),
        F.lit("Could not get domain from url"),
        round_,
    )

    # first-discovery wins (simulator: pending_urls grows as it admits);
    # (ord_rank, ord_sub) is unique per occurrence, so host/prio in the
    # struct never decide the min — they just ride along with the winner
    deduped = occ.groupBy("url").agg(
        F.min(F.struct("ord_rank", "ord_sub", "host", "prio")).alias("k")
    ).select(
        "url", F.col("k.ord_rank").alias("ord_rank"), F.col("k.ord_sub").alias("ord_sub"),
        F.col("k.host").alias("host"), F.col("k.prio").alias("prio"),
    )
    if ctx.bloom is not None:
        bloom, manifest = ctx.bloom, ctx.bloom.manifest()

        def prefilter(batches):
            import pandas as pd  # noqa: F401

            for pdf in batches:
                pdf = pdf.copy()
                pdf["maybe_seen"] = bloom.maybe_seen(pdf["url_hash"], manifest)
                yield pdf

        hashed = deduped.withColumn("url_hash", F.xxhash64("url"))
        # checkpoint the flagged stream before the maybe/fresh split: both
        # branches consume it and Catalyst does NOT reuse the exchange
        # across the union, so without the barrier the explode + dedup
        # aggregate + Arrow bloom pass execute TWICE per round
        # (event-log verified: duplicate MapInPandas subtrees in one plan)
        flagged = hashed.mapInPandas(
            prefilter,
            "url string, ord_rank bigint, ord_sub bigint, host string, "
            "prio int, url_hash bigint, maybe_seen boolean",
        ).localCheckpoint()
        _sublap("fr_flagged")
        # the exact gate never broadcasts url_seen: at 10^10 rows a driver
        # hash-relation build is impossible, and even at bench scale the
        # serial build of millions of strings beats no one. MERGE (not
        # shuffle_hash): the right side is unbounded and AQE-coalesced
        # partitions made per-partition hash maps OOM next to checkpoint
        # blocks — the sort path spills and scales with cores, matching
        # the bucketed-storage co-location this join gets on a cluster
        maybe = flagged.where("maybe_seen").join(
            seen_urls.hint("merge"), "url", "left_anti"
        )
        fresh = flagged.where("not maybe_seen")
        not_seen = maybe.unionByName(fresh).drop("maybe_seen", "url_hash")
    else:
        not_seen = deduped.join(seen_urls.hint("merge"), "url", "left_anti")

    included = not_seen.where(
        X.include_match_col(F.col("url"), F.col("host"), list(cfg.url_include_patterns), list(cfg.domain_include_patterns))
    )
    with_host = included.where(F.col("host").isNotNull())

    if ctx.robots is not None and cfg.respect_robots:
        rb = ctx.robots.select("host", "allow_prefixes", "disallow_prefixes")
        with_rb = with_host.join(F.broadcast(rb), "host", "left")
        allowed = with_rb.where(
            X.robots_allowed_col(
                X.url_path_col(F.col("url"), F.col("host")),
                F.col("allow_prefixes"),
                F.col("disallow_prefixes"),
            )
        ).drop("allow_prefixes", "disallow_prefixes")
    else:
        allowed = with_host

    # ONE anti-join covers both round-scale exclusion sets (pending
    # frontier + this round's uncommitted url_seen delta) — they are the
    # same magnitude, and folding them shuffles the candidate side once
    # instead of twice; only the web-scale url_seen keeps its own
    # bloom-prefiltered gate above
    excl = pending_urls if seen_delta_urls is None else pending_urls.unionByName(seen_delta_urls)
    # round-scale right side: partitioned sort-merge, never a driver
    # broadcast (plan-stability: Catalyst alternated SMJ / broadcast here
    # round-over-round on stale size estimates, and the broadcast round
    # serially built a multi-million-string relation on the driver)
    not_pending = allowed.join(excl.hint("merge"), "url", "left_anti")

    # materialize_input: the bloom prefilter + admission joins + dedup agg
    # above would otherwise run twice (range sampling pass + shuffle).
    # max_rank (the round's admitted-batch size, known after the scheduled
    # write) switches global_rank to deterministic monotone bucketing on
    # ord_rank — drops the range-sampling job + second checkpoint
    bucket = (
        rank_bucket(F.col("ord_rank"), max_rank) if max_rank else None
    )
    not_pending = not_pending.localCheckpoint()
    _sublap("fr_prep")
    ranked = global_rank(
        not_pending, ["ord_rank", "ord_sub"], "_d", materialize_input=False, bucket=bucket
    )
    frontier_append = ranked.select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        "host",
        F.xxhash64("host").alias("host_hash"),
        F.col("prio").cast("int").alias("priority"),
        (F.col("_d") + F.lit(next_seq - 1)).alias("seq"),
        F.lit(round_).alias("discovered_round"),
        F.lit("pending").alias("status"),
    )
    return frontier_append, host_null_errors


def run_round(
    ctx: RoundContext,
    frontier: DataFrame,
    scheduled: DataFrame,
    url_seen: DataFrame,
    round_: int,
    next_seq: int,
    stored_total: int,
    stager=None,
    timings: dict | None = None,
    watermarks: DataFrame | None = None,
    out: dict | None = None,
) -> bool | None:
    """Execute round `round_`; returns None when the frontier is drained,
    True otherwise — every output lands in `stager` (required).

    stager (driver._Stager): each output table's append DataFrame is
    written straight to its staged snapshot dir — the write IS the
    round's materialization point (replacing localCheckpoint + append
    writing the same rows twice), and tables with no downstream consumers
    in this round (scheduled/crawled/errors) stage from concurrent driver
    threads while the dependent chain (url_seen → frontier) continues on
    this one.

    watermarks: per-host consumption watermarks (host, wm_seq) — the
    compact exact representation of the consumed-seq set under uniform
    priority (see pending_frontier). When given, the round computes the
    updated table (old ∪ this round's per-host admitted maxima, tiny,
    localCheckpointed) and hands it back via out["watermarks"] for the
    next round; pending_rest uses it instead of an anti-join against the
    admitted batch (whose implicit broadcast build was driver-serial and
    O(batch)).
    """
    if stager is None:
        raise ValueError("run_round requires a stager")
    import time as _time

    cfg = ctx.config
    t0 = _time.time()

    def _lap(name):
        nonlocal t0
        if timings is not None:
            timings[name] = round(_time.time() - t0, 2)
            t0 = _time.time()

    def _mat(name: str, df: DataFrame) -> DataFrame:
        """Materialize an append DF as its staged table write."""
        return stager.materialize(name, df)

    def _submit(name: str, df: DataFrame) -> None:
        stager.submit(name, df)

    # The staged `scheduled` write IS the admitted batch's materialization:
    # one write job replaces the old pending/admitted localCheckpoint pair
    # plus the isEmpty probe (3 job barriers per round). `pending` stays
    # lazy — its anti-join recomputes fused inside the consumers' jobs
    # (cheap narrow columns), and `scheduled` was read from the committed
    # manifest at round start, so recomputation is stable against this
    # round's uncommitted stage dir.
    pending = pending_frontier(frontier, scheduled, watermarks)
    ctx.spark.sparkContext.setJobDescription("phase:schedule")
    scheduled_batch = schedule(pending, ctx, max_seq=next_seq)
    scheduled_append = scheduled_batch.select(
        "seq", "url_hash", "url", F.lit(round_).alias("round"), "rank",
        F.col("priority").cast("int").alias("priority"), "host",
        (F.col("eta_ms") if "eta_ms" in scheduled_batch.columns
         else F.lit(None)).cast("long").alias("departure_ms"),
    )
    admitted = _mat("scheduled", scheduled_append)
    batch_size = stager.staged_count("scheduled")
    if batch_size == 0:
        return None
    wm_next = None
    if watermarks is not None:
        # updated watermark table: a distributed group-max over the staged
        # admitted batch merged with the old table — O(hosts) rows, one
        # tiny checkpoint; replaces every consumed-set anti-join downstream
        delta = admitted.groupBy("host").agg(F.max("seq").alias("wm_seq"))
        wm_next = (
            watermarks.unionByName(delta)
            .groupBy("host")
            .agg(F.max("wm_seq").alias("wm_seq"))
            .localCheckpoint()
        )
        if out is not None:
            out["watermarks"] = wm_next
    _lap("schedule")

    # no distinct: the gate is only ever the right side of an anti-join,
    # where duplicates are harmless — saves a 10^10-scale aggregate
    gate_urls = url_seen.select("url").unionByName(pending.select("url"))
    decision_parts = fetch_and_branch(admitted, gate_urls, ctx, round_, timings=timings)
    decisions = decision_parts[0]
    for d in decision_parts[1:]:
        decisions = decisions.unionByName(d)
    _lap("fetch_branch")

    # A5/D6: cookies are shared only in storeResponse with the include
    # filter passed (src/Crawl.hs:157-163): the decide stage emits the
    # `cookies` share set (final-hop responseCookies minus chain-sent)
    # only on store_pass rows; here the round-start jar is subtracted —
    # responseCookies \\ cookiesSent — and the first setter in (rank, hop)
    # order wins attribution, committed at the round boundary. The jar is
    # anti-joined as a broadcast DataFrame, not an isin literal: the jar
    # grows with login-host count, and a per-cookie plan literal would
    # bloat the plan linearly with everything ever seen
    jar_df = ctx.spark.createDataFrame([(c,) for c in ctx.cookie_jar], "cookie string")
    session_append = (
        decisions.where("decision = 'store_pass'")
        .select("rank", "hops", "final_url", F.explode("cookies").alias("cookie"))
        .join(F.broadcast(jar_df), "cookie", "left_anti")
        .groupBy("cookie")
        .agg(F.min(F.struct("rank", "hops", "final_url")).alias("k"))
        .select("cookie", F.col("k.final_url").alias("url"), F.lit(round_).alias("round"))
    )
    _submit("session_state", session_append)

    # store_pass rows carry spans + resolved links; chain head = final URL
    passed = decisions.where("decision = 'store_pass'").withColumn(
        "chain", F.array_distinct(F.reverse(F.col("visited")))
    )

    # D4: every chain member completed; completed beats failed.
    # Both dedup anti-joins against the web-scale url_seen table use the
    # hashed-key broadcast-semi reduction (the fetch stage's measured-
    # faster pattern): url_seen streams once through a broadcast probe of
    # this round's candidate hashes — no shuffle of the big table; hash
    # collisions only WIDEN the reduced set ahead of the exact anti-join.
    chain_urls = passed.select(F.explode("chain").alias("url"))
    # Split by chain shape: a 1-element chain IS the scheduled URL —
    # unique within the round by construction, and (modulo the rare
    # admitted-then-completed-via-someone-else's-chain race) new to
    # url_seen, so it appends directly with NO distinct shuffle and NO
    # dedup join. Only multi-element chains (redirect members — a tiny
    # slice of a round) can collide with prior completions; they keep the
    # exact anti-join, right side reduced by a broadcast of their hashes.
    # A duplicate 'completed' row is semantically inert everywhere it is
    # read (url_seen_state group-mins, anti-joins and bloom inserts are
    # set-semantics), so trading exact-set appends for this plan shape
    # changes no observable state — the trace suite gates that.
    singles = passed.where(F.size("chain") == 1).select(F.col("chain")[0].alias("url"))
    multi_cand = (
        passed.where(F.size("chain") > 1)
        .select(F.explode("chain").alias("url"))
        .distinct()
    )
    multi_keys = F.broadcast(multi_cand.select(F.xxhash64("url").alias("_h")))
    prior_completed_red = (
        url_seen.where("state = 'completed'")
        .select("url")
        .withColumn("_h", F.xxhash64("url"))
        .join(multi_keys, "_h", "left_semi")
        .drop("_h")
    )
    completed_append = (
        singles.unionByName(multi_cand.join(prior_completed_red, "url", "left_anti"))
        .select(
            "url",
            F.xxhash64("url").alias("url_hash"),
            F.lit("completed").alias("state"),
            F.lit(round_).alias("round"),
        )
    )
    # end-of-round completed set = prior ∪ new = prior ∪ chain urls (every
    # chain member of a stored row completes), so the failed exclusion set
    # is (url_seen ∪ chain urls) — expressed directly instead of reusing
    # the completed_append plan, which would re-execute it inside this
    # branch of the same write job
    failed_cand = (
        decisions.where("decision = 'failed'")
        .select(F.explode("visited").alias("url"))
        .distinct()
    )
    failed_keys = F.broadcast(failed_cand.select(F.xxhash64("url").alias("_h")))
    exclusion_red = (
        url_seen.select("url")
        .unionByName(chain_urls)
        .withColumn("_h", F.xxhash64("url"))
        .join(failed_keys, "_h", "left_semi")
        .drop("_h")
    )
    failed_new = (
        failed_cand.join(exclusion_red, "url", "left_anti")
        .select(
            "url",
            F.xxhash64("url").alias("url_hash"),
            F.lit("failed").alias("state"),
            F.lit(round_).alias("round"),
        )
    )
    # F4: quota gates only the store (src/Crawl.hs:178-183); deterministic
    # cutoff by global fetch rank instead of the reference's racy counter
    if cfg.crawl_limit is not None:
        remaining = max(0, cfg.crawl_limit - stored_total)
        stored = global_rank(passed, ["rank"], "_srank").where(
            F.col("_srank") <= F.lit(remaining)
        ).drop("_srank")
    else:
        stored = passed
    crawled_append = stored.select(
        F.col("scheduled_url").alias("url"),
        "final_url",
        F.col("chain").alias("redirect_chain"),
        "spans",
        F.lit(round_).alias("round"),
        F.col("rank").cast("int").alias("rank_in_round"),
    )
    if ctx.doc_index_path is not None:
        # span-free fast path: plain stored rows carry spans = null; the
        # write re-joins them from the documents table by final_url (==
        # the doc key for every plain row — POSTs and branch chains route
        # through Python and arrive with spans inline). This is the ONE
        # full movement of span payloads per round: compressed parquet
        # scan → stored rows → the crawled write.
        have = crawled_append.where(F.col("spans").isNotNull())
        need = crawled_append.where(F.col("spans").isNull()).drop("spans")
        docs_sp = ctx.documents.select(
            F.col("doc_id").alias("final_url"), F.col("spans").alias("_dsp")
        )
        # ALWAYS the broadcast-key reduction here, never a shuffle: this
        # join carries the span payload, and shuffle-writing it costs GBs
        # of disk traffic per round at any batch/corpus ratio. The serial
        # key build runs on the stager's submit thread, off the round's
        # critical path.
        docs_sp_rel = docs_sp.withColumn("_fk", F.xxhash64("final_url")).join(
            F.broadcast(need.select(F.xxhash64("final_url").alias("_fk"))),
            "_fk",
            "left_semi",
        ).drop("_fk")
        rejoined = (
            need.join(docs_sp_rel, "final_url", "left")
            .withColumn("spans", F.col("_dsp"))
            .drop("_dsp")
            .select(*crawled_append.columns)
        )
        crawled_append = have.unionByName(rejoined)
    _submit("crawled_docs", crawled_append)

    url_seen_append = _mat("url_seen", completed_append.unionByName(failed_new))
    _lap("url_seen")

    # H2/U6: link candidates were resolved inside the decide stage
    links = passed.select("rank", "final_url", F.explode("links").alias("l")).select(
        "rank",
        "final_url",
        F.col("l.url").alias("url"),
        F.col("l.host").alias("host"),
        F.col("l.kind").alias("kind"),
        F.col("l.message").alias("message"),
        F.col("l.ord").cast("long").alias("ord_sub"),
    )
    link_errors = links.where("kind != 'ok'").select(
        F.when(F.col("kind") == "warning", F.lit("CrawlWarning"))
        .otherwise(F.lit("CrawlError"))
        .alias("kind"),
        F.col("final_url").alias("url"),
        F.col("message").alias("message"),
        F.lit(round_).alias("round"),
    )
    decision_errors = decisions.select(F.explode("errors").alias("e")).select(
        F.col("e.kind").alias("kind"),
        F.col("e.url").alias("url"),
        F.col("e.message").alias("message"),
        F.lit(round_).alias("round"),
    )

    if cfg.depth_priority:
        parent = admitted.select("rank", (F.col("priority") + 1).cast("int").alias("prio"))
        occurrences = links.where("kind = 'ok'").join(parent, "rank").select(
            "url", "host", F.col("rank").alias("ord_rank"), "ord_sub", "prio"
        )
    else:
        occurrences = links.where("kind = 'ok'").select(
            "url", "host", F.col("rank").alias("ord_rank"), "ord_sub",
            F.lit(0).cast("int").alias("prio"),
        )
    if wm_next is not None:
        # post-admission queue state straight from the updated watermarks —
        # no anti-join against the (round-scale) admitted batch
        pending_rest = pending_frontier(frontier, scheduled, wm_next)
    else:
        pending_rest = pending.join(admitted.select("seq"), "seq", "left_anti")
    ctx.spark.sparkContext.setJobDescription("phase:admission")
    frontier_append, host_null_errors = admit_candidates(
        occurrences,
        url_seen.select("url"),
        pending_rest.select("url"),
        ctx,
        round_,
        next_seq,
        seen_delta_urls=url_seen_append.select("url"),
        # ord_rank <= this round's admitted-batch size (already staged)
        max_rank=stager.staged_count("scheduled"),
        timings=timings,
    )
    errors_append = decision_errors.unionByName(link_errors).unionByName(host_null_errors)
    _submit("errors", errors_append)
    import time as _t2
    _w0 = _t2.time()
    _mat("frontier", frontier_append)
    if timings is not None:
        timings["fr_write"] = round(_t2.time() - _w0, 2)
    _lap("frontier")
    return True
