"""The crawl driver: seed → round loop → checkpointed commits (A6/A7).

Replaces the reference's supervision loop (src/Main.hs:40-68) and worker
pool (src/Workers.hs). Each round is one DataFrame job whose outputs are
committed to the snapshot tables; the `runs` append is the LAST commit of
a round, so `resume()` can roll every table back to the newest round whose
runs row exists — the north_rule's "resumable from checkpoint with
per-partition lineage" (lineage = SnapshotTable.lineage()).

Halt conditions (src/Main.hs:61-66): frontier drained, quota reached, or
max_rounds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.plans import expressions as X

from concurrent.futures import Future, ThreadPoolExecutor

from crawler_spark.bloom import BloomSidecar
from crawler_spark.config import CrawlConfig
from crawler_spark.plans.closure import build_redirect_closure
from crawler_spark.plans.round import (
    RoundContext,
    _err,
    admit_candidates,
    pending_frontier,
    run_round,
)
from crawler_spark.tables import Catalog
from crawler_spark.tables import dir_column as _dir_column


class _Stager:
    """Write-through materializer for a round's table appends.

    `materialize` writes the DataFrame to the table's next (uncommitted)
    snapshot dir and returns a reader over it — one Spark write job where
    localCheckpoint-then-append would run two. `submit` does the same from
    a pool thread for appends nothing downstream consumes this round
    (Spark supports concurrent job submission from driver threads).
    Manifest commits happen later at the round barrier; a crash before
    then leaves only orphan data dirs no manifest references.
    """

    def __init__(self, spark, catalog: Catalog, pool: ThreadPoolExecutor):
        self.spark = spark
        self.catalog = catalog
        self.pool = pool
        self.futures: dict[str, Future] = {}

    def submit(self, name: str, df) -> None:
        def staged():
            # job description is thread-local; tag the concurrent staged
            # write so event-log analysis can attribute its jobs
            self.spark.sparkContext.setJobDescription(f"stage:{name}")
            return self.catalog.tables[name].stage(df)

        self.futures[name] = self.pool.submit(staged)

    def materialize(self, name: str, df):
        table = self.catalog.tables[name]
        self.spark.sparkContext.setJobDescription(f"mat:{name}")
        target, count = table.stage(df)
        self.spark.sparkContext.setJobDescription(None)
        fut: Future = Future()
        fut.set_result((target, count))
        self.futures[name] = fut
        return table.read_dir(self.spark, target)

    def staged_count(self, name: str) -> int:
        """Row count of an already-materialized staged write."""
        return self.futures[name].result()[1]

    def wait(self) -> dict[str, tuple[str, int]]:
        return {name: f.result() for name, f in self.futures.items()}


class CrawlRun:
    def __init__(
        self,
        spark: SparkSession,
        config: CrawlConfig,
        state_dir: str,
        documents: DataFrame,
        redirects: DataFrame,
        robots: DataFrame | None,
        directions: list | None = None,
        form_instructions: list | None = None,
        use_bloom: bool = True,
        bloom_buckets: int = 32,
        distributed_bloom_merge: bool = False,
        http_fetch: bool = False,
        seen_filter: str = "bloom",
        cuckoo_entries_per_bucket: int = 1 << 14,
        doc_index_prebuilt: str | None = None,
    ):
        self.spark = spark
        self.config = config
        self.catalog = Catalog(state_dir)
        # north-rule "bloom/cuckoo URL-seen": either sidecar behind the
        # same interface; the round plan and the merge/rollback sites are
        # filter-agnostic. The choice must be stable across resume (like
        # use_bloom itself — it's part of the run's configuration).
        if seen_filter not in ("bloom", "cuckoo"):
            raise ValueError(f"seen_filter must be 'bloom' or 'cuckoo', got {seen_filter!r}")
        # fail fast on a filter-type flip across resume: the other type's
        # sidecar dir holding committed manifests means this state_dir was
        # built with that filter — constructing the new (empty) sidecar
        # would answer maybe_seen all-False and silently re-admit every
        # previously-seen URL past the exact anti-join.
        if use_bloom:
            other = "_bloom" if seen_filter == "cuckoo" else "_cuckoo"
            other_manifests = os.path.join(state_dir, other, "manifests")
            if os.path.isdir(other_manifests) and any(
                f.endswith(".json") for f in os.listdir(other_manifests)
            ):
                raise ValueError(
                    f"state_dir {state_dir!r} was built with seen_filter="
                    f"{other.lstrip('_')!r}; resuming with {seen_filter!r} "
                    "would start from an empty filter and corrupt url_seen "
                    "semantics. Use the original filter type or a fresh "
                    "state_dir."
                )
        if not use_bloom:
            bloom = None
        elif seen_filter == "cuckoo":
            from crawler_spark.cuckoo import CuckooSidecar

            bloom = CuckooSidecar(
                os.path.join(state_dir, "_cuckoo"),
                n_buckets=bloom_buckets,
                entries_per_bucket=cuckoo_entries_per_bucket,
            )
        else:
            bloom = BloomSidecar(os.path.join(state_dir, "_bloom"), n_buckets=bloom_buckets)
        # documents stays a plain parquet read: file-size stats keep
        # Catalyst from ever broadcasting it, and the fetch join streams it
        # via the broadcast semi-join reduction in fetch_and_branch (the
        # batch side broadcasts; the web-scale side never shuffles).
        # The closure is checkpointed because rebuilding the iterative
        # pointer-doubling plan on every scan would re-run its whole loop.
        # S9 real path: fetch over real sockets (plans/fetch_http.py) —
        # documents/redirects/closure go unused; the web is whatever the
        # network (or config.proxy) serves
        if http_fetch:
            closure = build_redirect_closure(
                spark.createDataFrame([], "src_url string, dst_url string"),
                config.max_redirects,
            )
            closure_count = 0
        else:
            closure = build_redirect_closure(redirects, config.max_redirects).localCheckpoint()
            # one count on the checkpointed closure at init: per-round
            # fetch joins pick broadcast-the-closure vs semi-reduce-it
            # from this (redirect tables are usually tiny vs the corpus)
            closure_count = closure.count()
        # span-free fast path: per-corpus derived table (plans/doc_index.py),
        # built once at init — corpus preprocessing, like the closure. On a
        # cluster this is an Iceberg table bucket-partitioned next to the
        # corpus; the hash-bucketed parquet layout here is its exact local
        # analog (narrow columns only, spans never enter it).
        doc_index_path = None
        if (
            not http_fetch
            and config.vectorized_extract
            and config.use_doc_index
            and not (directions or [])
        ):
            if doc_index_prebuilt is not None:
                # shared pre-built index for the corpus (deterministic, a
                # pure function of `documents`): many runs over one corpus
                # — bench legs, resumed crawls, A/B configs — reuse one
                # build instead of each paying the full-corpus span scan
                doc_index_path = doc_index_prebuilt
            else:
                from crawler_spark.plans.doc_index import write_bucketed_index

                # hash-bucketed index parquet: the corpus side of the
                # storage-partitioned fetch join (deterministic — resume
                # simply rewrites it)
                doc_index_path = os.path.join(state_dir, "_docindex")
                write_bucketed_index(documents, doc_index_path)
        self.ctx = RoundContext(
            spark=spark,
            config=config,
            documents=documents,
            closure=closure,
            robots=robots,
            directions=list(directions or []),
            form_instructions=list(form_instructions or []),
            bloom=bloom,
            http_fetch=http_fetch,
            doc_index_path=doc_index_path,
            closure_count=closure_count,
        )
        self.run_id = "run"
        # driver-held round state, restored from the runs table on resume
        self.round = 0
        self.next_seq = 0
        self.stored_total = 0
        # per-host consumption watermarks (plans/round.pending_frontier):
        # exact compact queue state whenever priorities are uniform —
        # depth_priority is the only non-zero-priority source (seeds,
        # links, service addUrl and streaming ingest all admit prio 0)
        self.watermarks = (
            None
            if config.depth_priority
            else spark.createDataFrame([], "host string, wm_seq long")
        )
        self.timings: dict = {}
        self.timings_history: list[dict] = []
        # serializes the round loop against control-surface mutations
        # (service_http listener thread — the STM-atomicity analog)
        import threading

        self.control_lock = threading.RLock()
        # control-plane liveness: the reference's readTVarIO endpoints
        # answer while workers crawl, so status/queueSize serve from
        # driver-held snapshot fields updated at round boundaries (never
        # the round-long control_lock), and addUrl/addUrlIncludePattern
        # buffer into lists drained at the next boundary
        self.snapshot_lock = threading.Lock()
        self.pending_queue = 0
        self._buffered_add_urls: list[str] = []
        self._buffered_patterns: list[str] = []
        self.status_snapshot = {
            "status": "unstarted", "round": -1, "stored_total": 0, "queue_size": 0,
        }
        # cluster path: per-bucket bitmap rebuild executor-side
        # (bloom.merge_dir_distributed); driver-side merge of the round
        # delta is faster in local mode and byte-identical
        self.distributed_bloom_merge = distributed_bloom_merge

    # -- seeding (S1/S2: src/Initialisation.hs:97-119, input order) ----------
    def seed(self, seed_urls: list[str]) -> None:
        """Canonicalize + admit seeds as checkpoint round -1."""
        raw = self.spark.createDataFrame(
            [(i, u) for i, u in enumerate(seed_urls)], "pos long, raw string"
        )
        self.seed_df(raw)

    def seed_df(self, raw) -> None:
        """DataFrame-native seeding for large seed sets (pos, raw): the
        whole admission pipeline runs distributed — no driver round-trip."""
        from crawler_spark.functions.urls import register_udfs

        canonicalize_urls, _ = register_udfs()
        spark = self.spark
        canon = raw.withColumn("c", canonicalize_urls(X.ws_trim_col(F.col("raw")))).select(
            "pos", "raw", F.col("c.url").alias("url"), F.col("c.host").alias("host"), F.col("c.error").alias("error")
        ).localCheckpoint()
        seed_errors = _err(
            canon.where(F.col("error").isNotNull()),
            "GeneralError",
            F.col("raw"),
            F.concat(F.lit("Could not canonicalise seed: "), F.col("error")),
            0,
        )
        occurrences = canon.where(F.col("error").isNull()).select(
            "url", "host", F.lit(0).cast("long").alias("ord_rank"), F.col("pos").alias("ord_sub"),
            F.lit(0).cast("int").alias("prio"),
        )
        empty_urls = spark.createDataFrame([], "url string")
        frontier_append, host_null_errors = admit_candidates(
            occurrences, empty_urls, empty_urls, self.ctx, 0, self.next_seq
        )
        n_new = self.catalog.frontier.append(frontier_append, -1)
        self.catalog.errors.append(seed_errors.unionByName(host_null_errors), -1)
        self.next_seq += n_new
        self._commit_run_row(-1, pending=n_new)
        if self.ctx.bloom is not None:
            self.ctx.bloom.merge_hashes([], -1)  # empty baseline manifest
        self.pending_queue = n_new
        self._update_snapshot("running", -1)

    def _commit_run_row(self, round_: int, pending: int) -> None:
        # driver-local pyarrow write — a one-row bookkeeping append should
        # not cost a Spark job
        self.catalog.runs.append_local(
            [(self.run_id, round_, "running", self.stored_total, pending, self.next_seq)],
            round_,
        )

    # -- resume (north_rule) -------------------------------------------------
    def resume(self) -> int:
        """Roll all tables (and the bloom sidecar) back to the last round
        whose runs row committed; restore driver counters. Returns it."""
        r = self.catalog.rollback_to_last_completed(self.spark)
        if self.ctx.bloom is not None:
            self.ctx.bloom.rollback_to_round(r)
        runs = self.catalog.runs.read(self.spark)
        # tie-break on next_seq: streaming ingest commits runs rows at the
        # same round number as the crawl's own row, and next_seq is monotone
        # across commits — picking max(round) alone could restore a stale
        # next_seq whose reuse would collide with streamed seq values
        last = runs.orderBy(F.desc("round"), F.desc("next_seq")).limit(1).collect()
        if last:
            self.round = last[0]["round"] + 1
            self.next_seq = last[0]["next_seq"]
            self.stored_total = last[0]["stored_total"]
        jar = [r_["cookie"] for r_ in self.catalog.session_state.read(self.spark).select("cookie").collect()]
        self.ctx.cookie_jar = frozenset(jar)
        if self.watermarks is not None:
            # rebuild consumption watermarks from the rolled-back crawl log
            # (one group-max agg). A state written before the scheduled
            # table carried `host` yields null hosts — watermarks would be
            # silently wrong there, so fall back to the exact anti-join.
            sched = self.catalog.scheduled.read(self.spark)
            if sched.where(F.col("host").isNull()).limit(1).count() > 0:
                self.watermarks = None
            else:
                self.watermarks = (
                    sched.groupBy("host").agg(F.max("seq").alias("wm_seq")).localCheckpoint()
                )
        # one Spark count at resume time re-seeds the boundary-maintained
        # queue-size snapshot
        self.pending_queue = pending_frontier(
            self.catalog.frontier.read(self.spark), self.catalog.scheduled.read(self.spark)
        ).count()
        self._update_snapshot("running", self.round - 1)
        return r

    # -- control-plane snapshot + buffers (service_http liveness) ------------
    def _update_snapshot(self, status: str, round_: int) -> None:
        with self.snapshot_lock:
            self.status_snapshot = {
                "status": status,
                "round": round_,
                "stored_total": self.stored_total,
                "queue_size": self.pending_queue,
            }

    def control_snapshot(self) -> dict:
        """Lock-cheap view for status/queueSize endpoints — never blocks
        on the round loop (readTVarIO liveness parity)."""
        with self.snapshot_lock:
            return dict(self.status_snapshot)

    def enqueue_add_url(self, url: str) -> None:
        """POST /addUrl analog: buffered, admitted at the next boundary."""
        with self.snapshot_lock:
            self._buffered_add_urls.append(url)

    def enqueue_include_pattern(self, pattern: str) -> None:
        with self.snapshot_lock:
            self._buffered_patterns.append(pattern)

    def _drain_control_buffers(self) -> None:
        with self.snapshot_lock:
            urls, self._buffered_add_urls = self._buffered_add_urls, []
            pats, self._buffered_patterns = self._buffered_patterns, []
        if pats or urls:
            from crawler_spark import service

            for p in pats:
                service.add_url_include_pattern(self, p)
            if urls:
                n = service.add_urls(self, urls)
                with self.snapshot_lock:
                    self.pending_queue += n
                    self.status_snapshot["queue_size"] = self.pending_queue

    # -- the loop ------------------------------------------------------------
    def run(self, max_rounds: int | None = None) -> int:
        """Run rounds until drained/quota/max_rounds; returns rounds run."""
        cfg = self.config
        limit_rounds = cfg.max_rounds if max_rounds is None else self.round + max_rounds
        ran = 0
        stop_flag = os.path.join(self.catalog.root, "_stop")
        while self.round < limit_rounds:
            if cfg.crawl_limit is not None and self.stored_total >= cfg.crawl_limit:
                break
            if os.path.exists(stop_flag):  # S13 POST /stop analog
                break
            if not self.run_one_round():
                break
            ran += 1
        return ran

    def run_one_round(self) -> bool:
        with self.control_lock:
            return self._run_one_round_locked()

    def _run_one_round_locked(self) -> bool:
        import time

        self._drain_control_buffers()
        spark, cat, round_ = self.spark, self.catalog, self.round
        timings: dict | None = {} if os.environ.get("SPARK_GRAFT_TIMING") else None
        frontier = cat.frontier.read(spark)
        scheduled = cat.scheduled.read(spark)
        url_seen = cat.url_seen.read(spark)

        with ThreadPoolExecutor(max_workers=4) as pool:
            stager = _Stager(spark, cat, pool)
            round_out: dict = {}
            ok = run_round(
                self.ctx, frontier, scheduled, url_seen, round_,
                self.next_seq, self.stored_total, stager=stager, timings=timings,
                watermarks=self.watermarks, out=round_out,
            )
            if ok is None:
                return False
            t0 = time.time()
            staged = stager.wait()
        if timings is not None:
            timings["c_wait"] = round(time.time() - t0, 2)
            t1 = time.time()

        # every append is already on disk; commit the manifests at the
        # round barrier — cheap file renames, runs row last (the barrier)
        counts = {
            "admitted": staged["scheduled"][1],
            "new_frontier": staged["frontier"][1],
            "seen_new": staged["url_seen"][1],
            "stored": staged["crawled_docs"][1],
            "errors": staged["errors"][1],
            "new_cookies": staged["session_state"][1],
        }
        for name in ("scheduled", "frontier", "url_seen", "crawled_docs", "errors", "session_state"):
            cat.tables[name].commit_staged(staged[name][0], round_)
        cat.metrics.append_local([(round_, k, float(v)) for k, v in counts.items()], round_)
        if timings is not None:
            timings["c_manifests"] = round(time.time() - t1, 2)
            t1 = time.time()
        if self.ctx.bloom is not None:
            if self.distributed_bloom_merge:
                self.ctx.bloom.merge_dir_distributed(spark, staged["url_seen"][0], round_)
            else:
                self.ctx.bloom.merge_dir(staged["url_seen"][0], round_)
        if timings is not None:
            timings["c_bloom"] = round(time.time() - t1, 2)
        if counts["new_cookies"]:
            # jar for the NEXT round grows by this round's committed diff
            # (driver-local footer read — the delta dir is tiny)
            self.ctx.cookie_jar = self.ctx.cookie_jar | frozenset(
                _dir_column(staged["session_state"][0], "cookie")
            )

        self.stored_total += counts["stored"]
        self.next_seq += counts["new_frontier"]
        self._commit_run_row(round_, -1)
        if round_out.get("watermarks") is not None:
            # advance queue-state watermarks only past the commit barrier
            # (a crash before it rolls the round back; resume recomputes)
            self.watermarks = round_out["watermarks"]
        self.round += 1
        self.pending_queue += counts["new_frontier"] - counts["admitted"]
        self._update_snapshot("running", round_)
        if timings is not None:
            timings["commit"] = round(time.time() - t0, 2)
            self.timings = timings
            self.timings_history.append(dict(timings, round=round_))
        return True

    def lineage_report(self) -> dict:
        """Per-table (round → data dirs) lineage — the north_rule's
        per-partition provenance record for every committed round."""
        return {name: t.lineage() for name, t in self.catalog.tables.items()}

    # -- trace accessors (tests / parity checks) -----------------------------
    def fetch_order(self) -> list[tuple[int, int, str]]:
        rows = (
            self.catalog.scheduled.read(self.spark)
            .orderBy("round", "rank")
            .select("round", "rank", "url")
            .collect()
        )
        return [(r["round"], int(r["rank"]), r["url"]) for r in rows]

    def evict_urls(self, urls) -> int:
        """Recrawl eviction: expire previously-crawled URLs so the next
        link discovery re-admits and re-fetches them (the action side of a
        recrawl schedule — see queries/corpus_ops.py:q_recrawl_schedule
        for the selection side).

        `urls` is a list[str] or a single-column DataFrame of exact URLs.
        Call between rounds. Two state updates, IN THIS ORDER:

        1. url_seen (exact set): anti-join the eviction set out and commit
           the new snapshot at the last completed round, so resume keeps
           it.
        2. seen-filter sidecar: cuckoo supports true deletion
           (delete_hashes); bloom cannot delete, and correctness does not
           need it — filter hits are exact-checked against url_seen by the
           admission anti-join (plans/round.py), so a stale filter entry
           costs one extra anti-join probe, never a wrong admission. The
           cuckoo path exists because at 10^10-URL scale an
           eviction-heavy workload would otherwise grow the filter's
           false-positive rate epoch over epoch.

        The order is the crash-safety argument: dying between (1) and (2)
        leaves evicted URLs still flagged maybe_seen — harmless. The
        reverse order would let a filter-cleared URL bypass the exact
        check while still in url_seen and double-fetch it.

        Returns the number of url_seen rows removed.
        """
        spark, cat = self.spark, self.catalog
        evict_df = (
            urls if hasattr(urls, "join")
            else spark.createDataFrame([(u,) for u in urls], "url string")
        ).select("url").distinct()
        # no checkpoint needed to pin the pre-image: read() binds concrete
        # snapshot dirs at call time and overwrite() writes a NEW dir —
        # snapshots are copy-on-write, so `seen` stays the pre-image.
        seen = cat.url_seen.read(spark)
        # the evicted rows are the small side — materialize them ONCE
        # driver-side (url_hash only) and reuse for both the removed count
        # and the sidecar deletion set. Deliberate collect: eviction runs
        # per recrawl epoch on the schedule output (bounded), not per
        # round — chunk epochs if huge.
        evicted_hashes = [
            r["url_hash"]
            for r in seen.join(evict_df, "url", "left_semi")
            .select("url_hash").collect()
        ]
        removed = len(evicted_hashes)
        commit_round = self.round - 1  # last completed round
        cat.url_seen.overwrite(
            seen.join(evict_df, "url", "left_anti"), commit_round
        )
        if removed and self.ctx.bloom is not None and hasattr(
            self.ctx.bloom, "delete_hashes"
        ):
            # COLLISION-SAFE: delete only hashes that no SURVIVING row
            # still carries. The filter stores one copy per 64-bit hash;
            # deleting a hash shared (by xxhash64 collision) with a kept
            # URL would make maybe_seen answer False for that kept URL —
            # and the admission fast path trusts False without the exact
            # anti-join, so it would double-fetch. At 10^10 URLs a few
            # 64-bit collisions are expected; excluding still-live hashes
            # keeps the exactness contract. The survivor side reads the
            # snapshot overwrite just committed (parquet scan, no join
            # recompute).
            import numpy as np

            ev = spark.createDataFrame(
                [(int(h),) for h in set(evicted_hashes)], "url_hash bigint"
            )
            dead_hashes = [
                r["url_hash"]
                for r in ev.join(
                    cat.url_seen.read(spark).select("url_hash"),
                    "url_hash", "left_anti",
                ).collect()
            ]
            if dead_hashes:
                self.ctx.bloom.delete_hashes(
                    np.asarray(dead_hashes, dtype=np.int64), commit_round
                )
        return removed

    def url_seen_state(self) -> dict[str, str]:
        """completed beats failed ('completed' < 'failed' ⇒ min)."""
        rows = (
            self.catalog.url_seen.read(self.spark)
            .groupBy("url")
            .agg(F.min("state").alias("state"))
            .collect()
        )
        return {r["url"]: r["state"] for r in rows}
