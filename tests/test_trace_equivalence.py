"""End-to-end engine ↔ simulator trace equivalence (SURVEY.md §3.4, §5.2).

The single-threaded simulator is the deterministic re-specification of the
reference's polite-queue discipline; the Spark engine must reproduce its
fetch order (round, rank), final url_seen state map, stored docs (incl.
span-sequence equality per BASELINE.json input_hint), and error multiset.
"""

from __future__ import annotations

from collections import Counter

import pytest

from crawler_spark.config import CrawlConfig
from crawler_spark.driver import CrawlRun
from crawler_spark.genweb import generate
from crawler_spark.simulator import Simulator
from tests.conftest import web_to_spark


def run_both(spark, tmp_state, web, config, max_rounds, use_bloom=True):
    sim = Simulator(web, config)
    sim.seed(list(config.seeds))
    sim_res = sim.run(max_rounds=max_rounds)

    docs, redirects, robots = web_to_spark(spark, web)
    run = CrawlRun(
        spark,
        config,
        tmp_state,
        docs,
        redirects,
        robots,
        directions=web.get("href_directions") or [],
        form_instructions=web.get("form_instructions") or [],
        use_bloom=use_bloom,
        bloom_buckets=8,
    )
    run.seed(list(config.seeds))
    run.run(max_rounds=max_rounds)
    return sim, sim_res, run


def assert_equivalent(spark, sim_res, run):
    # 1. fetch order: exact (round, rank, url) sequence
    assert run.fetch_order() == sim_res.fetch_order

    # 2. final url_seen state map (completed beats failed)
    assert run.url_seen_state() == sim_res.url_seen

    # 3. stored docs: key set + span-sequence equality (kind, text,
    #    media_ref, order) + redirect chain conventions
    eng = {
        (r["round"], r["rank_in_round"]): r
        for r in run.catalog.crawled_docs.read(spark).collect()
    }
    sim_stored = {(d["round"], d["rank"] if "rank" in d else d["rank_in_round"]): d for d in sim_res.stored}
    assert eng.keys() == sim_stored.keys()
    for k, s in sim_stored.items():
        e = eng[k]
        assert e["url"] == s["url"]
        assert e["final_url"] == s["final_url"]
        assert list(e["redirect_chain"]) == list(s["redirect_chain"])
        e_spans = [(sp["kind"], sp["text"], sp["media_ref"], sp["offset"]) for sp in e["spans"]]
        s_spans = [
            (sp["kind"], sp.get("text"), sp.get("media_ref"), sp["offset"]) for sp in s["spans"]
        ]
        assert e_spans == s_spans

    # 4. error multiset (order within a round is not specified)
    eng_errors = Counter(
        (r["round"], r["kind"], r["url"], r["message"])
        for r in run.catalog.errors.read(spark).collect()
    )
    sim_errors = Counter(
        (r["round"], r["kind"], r["url"], r["message"]) for r in sim_res.errors
    )
    assert eng_errors == sim_errors

    # 5. session jar (A5): exact (cookie, first-setter url, round) rows
    eng_session = sorted(
        (r["cookie"], r["url"], r["round"])
        for r in run.catalog.session_state.read(spark).collect()
    )
    sim_session = sorted((r["cookie"], r["url"], r["round"]) for r in sim_res.session_state)
    assert eng_session == sim_session


@pytest.mark.parametrize(
    "use_bloom,vectorized_extract",
    [(True, True), (False, True), (True, False)],
    ids=["bloom", "nobloom", "python-decide"],
)
def test_basic_crawl_equivalence(spark, tmp_state, use_bloom, vectorized_extract):
    """vectorized_extract=False forces every row through the Python
    decide loop — the same web + seeds through both paths must match the
    simulator identically, locking the JVM fast path (plans/extract.py)
    end-to-end on top of test_extract_parity's row-level check."""
    web = generate(n_docs=60, n_hosts=8, seed=7, n_redirects=6, long_chain=True)
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=2,
        vectorized_extract=vectorized_extract,
    )
    sim, sim_res, run = run_both(spark, tmp_state, web, config, max_rounds=6, use_bloom=use_bloom)
    assert len(sim_res.fetch_order) > 10  # the web actually got crawled
    assert_equivalent(spark, sim_res, run)


def test_quota_and_budget(spark, tmp_state):
    web = generate(n_docs=50, n_hosts=5, seed=11, n_redirects=4, hot_host_frac=0.5)
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=3,
        crawl_limit=17,
        scheduler_salts=4,
    )
    sim, sim_res, run = run_both(spark, tmp_state, web, config, max_rounds=8)
    assert len(sim_res.stored) <= 17
    assert_equivalent(spark, sim_res, run)


def test_interaction_branches(spark, tmp_state):
    """Directions, meta-refresh, and forms all firing in one crawl."""
    web = generate(
        n_docs=40,
        n_hosts=4,
        seed=3,
        n_redirects=3,
        meta_refresh_rate=0.15,
        form_rate=0.15,
        direction_rate=0.2,
    )
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=4,
    )
    sim, sim_res, run = run_both(spark, tmp_state, web, config, max_rounds=5)
    assert_equivalent(spark, sim_res, run)


def test_session_cookie_gating(spark, tmp_state):
    """A5/D6: form login sets the host session cookie at a round boundary;
    cookie-gated pages fail before the cookie lands in the jar and succeed
    when scheduled after (simulator agrees exactly, incl. session_state)."""
    web = generate(
        n_docs=60,
        n_hosts=3,
        seed=13,
        n_redirects=2,
        form_rate=0.3,
        cookie_gate_rate=0.25,
        links_per_doc=8,
        meta_refresh_rate=0.0,
        direction_rate=0.0,
    )
    gated = {
        d["doc_id"]
        for d in web["documents"].to_dict("records")
        if any(s["kind"] == "require_cookie" for s in d["spans"])
    }
    assert gated  # the scenario actually exercises A5
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=3,
    )
    sim, sim_res, run = run_both(spark, tmp_state, web, config, max_rounds=10)
    assert sim_res.session_state  # at least one login happened
    assert any(
        "Unauthorized (cookie required)" in e["message"] for e in sim_res.errors
    )  # gates fired before the cookie existed...
    assert any(
        u in gated and s == "completed" for u, s in sim_res.url_seen.items()
    )  # ...and gated pages scheduled after login succeeded
    assert_equivalent(spark, sim_res, run)


def test_depth_priority_propagation(spark, tmp_state):
    """Links inherit BFS depth as scheduling priority: shallow pages fetch
    first within each host budget; first discovery fixes a URL's priority.
    Engine window order and simulator order must agree exactly."""
    web = generate(n_docs=80, n_hosts=6, seed=17, n_redirects=5)
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=2,
        depth_priority=True,
    )
    sim, sim_res, run = run_both(spark, tmp_state, web, config, max_rounds=7)
    assert len(sim_res.fetch_order) > 10
    # the flag actually changed the schedule vs pure FIFO
    sim_fifo = Simulator(
        web,
        CrawlConfig(
            seeds=config.seeds,
            domain_include_patterns=config.domain_include_patterns,
            per_host_budget=2,
        ),
    )
    sim_fifo.seed(list(config.seeds))
    fifo_res = sim_fifo.run(max_rounds=7)
    assert fifo_res.fetch_order != sim_res.fetch_order
    # frontier carries real depths
    depths = {r["priority"] for r in run.catalog.frontier.read(spark).collect()}
    assert max(depths) >= 2
    assert_equivalent(spark, sim_res, run)


def test_url_include_patterns_and_no_robots(spark, tmp_state):
    web = generate(n_docs=40, n_hosts=6, seed=5, n_redirects=5, private_rate=0.2)
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        url_include_patterns=("host", "/p"),
        per_host_budget=2,
        respect_robots=False,
    )
    sim, sim_res, run = run_both(spark, tmp_state, web, config, max_rounds=5)
    assert_equivalent(spark, sim_res, run)


def test_everything_at_once(spark, tmp_state):
    """Adversarial combination: hot-host skew + redirects (incl. the
    >20-hop abort chain) + directions + meta-refresh + forms + session
    cookies + gated docs + depth priority + crawl-delay budgets + quota,
    run long enough to cross several round boundaries. One divergence
    anywhere in any subsystem breaks exact trace parity."""
    web = generate(
        n_docs=120,
        n_hosts=8,
        seed=47,
        hot_host_frac=0.4,
        n_redirects=8,
        long_chain=True,
        meta_refresh_rate=0.08,
        form_rate=0.12,
        direction_rate=0.08,
        cookie_gate_rate=0.15,
        links_per_doc=7,
    )
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=3,
        crawl_limit=60,
        scheduler_salts=4,
        depth_priority=True,
    )
    sim, sim_res, run = run_both(spark, tmp_state, web, config, max_rounds=8)
    assert len(sim_res.fetch_order) > 30
    assert sim_res.stored and len(sim_res.stored) <= 60
    assert_equivalent(spark, sim_res, run)


def test_whitespace_and_garbage_seeds_parity(spark, tmp_state):
    """Seed trimming must match the simulator's str.strip() (the
    reference trims all whitespace, src/Shared.hs:41-42): a
    newline-suffixed seed is admitted as its stripped form, garbage
    errors identically on both sides."""
    web = generate(n_docs=40, n_hosts=4, seed=19, n_redirects=2)
    good = web["seeds"]["url"][0]
    seeds = [good + "\n", "\t" + good + " ", "  ht tp://bad  ", "mailto:x@y"]
    config = CrawlConfig(domain_include_patterns=("example.org",), per_host_budget=2)

    sim = Simulator(web, config)
    sim.seed(seeds)
    sim_res = sim.run(max_rounds=3)

    docs, redirects, robots = web_to_spark(spark, web)
    run = CrawlRun(spark, config, tmp_state, docs, redirects, robots, bloom_buckets=8)
    run.seed(seeds)
    run.run(max_rounds=3)
    assert_equivalent(spark, sim_res, run)
    # the stripped duplicate was admitted once
    assert sum(1 for (_, _, u) in sim_res.fetch_order if u == good) == 1


def test_chain_local_cookie_unlocks_gated_page(spark, tmp_state):
    """Cookie threading WITHIN one interaction chain (src/Fetch.hs):
    A(form) → login result sets the session cookie → meta-refresh → gated
    page G succeeds in the SAME chain, before any round boundary. G is
    stored attributed to A. The cookie does NOT enter the global jar:
    sharing is storeResponse-only — responseCookies \\ cookiesSent of the
    FINAL hop (src/Crawl.hs:157-163) — and the setter here is an
    intermediate hop, so the cookie stays chain-local."""
    import json as _json

    import pandas as pd

    from crawler_spark.config import FormInstruction

    host = "chain.example.org"
    a = f"http://{host}/p0"
    # POST fetch key: action URL + NUL + urlencoded body (sorted params)
    from crawler_spark import crawl_logic as cl

    submit = cl.post_key(
        f"http://{host}/login", [("pass", "hunter2"), ("user", "admin")]
    )
    gated = f"http://{host}/members"

    def sp(kind, text=None, media_ref=None, offset=0):
        return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}

    form = {"method": "POST", "action": "/login",
            "inputs": [{"key": "user", "value": ""}, {"key": "pass", "value": ""}]}
    docs = pd.DataFrame([
        {"doc_id": a, "spans": [sp("form", text=_json.dumps(form, sort_keys=True))]},
        {"doc_id": submit, "spans": [
            sp("set_cookie", text="sess-chain", offset=0),
            sp("meta_refresh", text="/members", offset=1),
        ]},
        {"doc_id": gated, "spans": [
            sp("require_cookie", text="sess-chain", offset=0),
            sp("text", text="secret members area", offset=1),
        ]},
    ])
    web = {
        "documents": docs,
        "redirects": pd.DataFrame(columns=["src_url", "dst_url", "status_code"]),
        "robots_rules": pd.DataFrame(columns=["host", "allow_prefixes", "disallow_prefixes", "crawl_delay"]),
        "seeds": pd.DataFrame({"seq": [0], "url": [a]}),
        "form_instructions": [
            FormInstruction(label="login", url_regex="/p0$", form_action_regex="/login$",
                            params=(("user", "admin"), ("pass", "hunter2")))
        ],
        "href_directions": [],
    }
    config = CrawlConfig(seeds=(a,), domain_include_patterns=("example.org",), per_host_budget=2)
    sim, sim_res, run = run_both(spark, tmp_state, web, config, max_rounds=3)
    # the gated page was reached and stored within the chain
    assert [d["final_url"] for d in sim_res.stored] == [gated]
    assert sim_res.url_seen.get(gated) == "completed"
    assert not any("Unauthorized" in e["message"] for e in sim_res.errors)
    # intermediate-hop cookie stays chain-local (Crawl.hs:159 shares only
    # the final hop's responseCookies \\ cookiesSent)
    assert [r["cookie"] for r in sim_res.session_state] == []
    assert_equivalent(spark, sim_res, run)


def test_timing_scheduler_equivalence(spark, tmp_state):
    """scheduler_mode='timing' (P7+ virtual-time politeness wired into
    the round loop): admission by departure time inside the round window
    and GLOBAL fetch order by (eta, priority, seq) must match the
    simulator exactly — including hosts with crawl_delay > 1 whose
    departures interleave differently than budget mode's (priority, seq)
    order would."""
    web = generate(n_docs=60, n_hosts=8, seed=13, n_redirects=5)
    assert web["robots_rules"]["crawl_delay"].notna().any()  # delays exist
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=3,
        scheduler_mode="timing",
    )
    sim, sim_res, run = run_both(spark, tmp_state, web, config, max_rounds=6)
    assert len(sim_res.fetch_order) > 10
    assert_equivalent(spark, sim_res, run)

    # the mode actually changes the schedule: budget mode on the same web
    # produces a different fetch order (delayed hosts interleave earlier
    # in timing order than the seq-grouped budget order)
    import dataclasses

    from crawler_spark.simulator import Simulator

    sim_b = Simulator(web, dataclasses.replace(config, scheduler_mode="budget"))
    sim_b.seed(list(config.seeds))
    res_b = sim_b.run(max_rounds=6)
    assert [u for (_, _, u) in res_b.fetch_order] != [
        u for (_, _, u) in sim_res.fetch_order
    ]


def test_timing_scheduler_with_depth_priority(spark, tmp_state):
    """Interaction of the two scheduler-affecting modes: depth_priority
    gives links BFS-depth priorities (which also forces the admission
    plan's exact-anti-join fallback instead of per-host watermarks), and
    scheduler_mode='timing' orders fetches by virtual departure time with
    priority as the tie-break INSIDE a host's delay lattice. The engine
    must match the simulator under both at once."""
    web = generate(n_docs=60, n_hosts=8, seed=13, n_redirects=5)
    assert web["robots_rules"]["crawl_delay"].notna().any()
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=3,
        scheduler_mode="timing",
        depth_priority=True,
    )
    sim, sim_res, run = run_both(spark, tmp_state, web, config, max_rounds=6)
    assert len(sim_res.fetch_order) > 10
    # depth priorities actually bite: some fetch must carry priority > 0
    sched = run.catalog.scheduled.read(spark)
    assert sched.where("priority > 0").count() > 0
    assert_equivalent(spark, sim_res, run)


def test_politeness_audit_closes_loop_on_real_timing_crawl(spark, tmp_state):
    """Closed loop from scheduler to honor-check (VERDICT r3 #6): a REAL
    scheduler_mode='timing' crawl persists its virtual departure times
    (scheduled.departure_ms), and the politeness auditor — the same
    aggregation the driver query uses — must find ZERO gap violations in
    that log. Producer (plans/round.schedule eta lattice) and checker
    (linkgraph_ops.audit_politeness_log window) are independent code
    paths. The audit result is cross-checked against a DuckDB replica
    over the identical extracted log."""
    import duckdb
    from pyspark.sql import functions as F

    from crawler_spark.crawl_logic import host_delay_s
    from crawler_spark.queries.linkgraph_ops import audit_politeness_log

    web = generate(n_docs=60, n_hosts=8, seed=13, n_redirects=5)
    assert web["robots_rules"]["crawl_delay"].notna().any()
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=3,
        scheduler_mode="timing",
    )
    _sim, _sim_res, run = run_both(spark, tmp_state, web, config, max_rounds=2)

    # effective per-fetch delay per host (robots delay when > 1s, else the
    # 1/s default) — the standard the audit holds the scheduler to
    delay_ms = {
        r["host"]: int(host_delay_s(r["crawl_delay"]) * 1000)
        for _, r in web["robots_rules"].iterrows()
    }
    default_ms = int(host_delay_s(None) * 1000)

    sched = run.catalog.scheduled.read(spark)
    assert sched.where("departure_ms IS NULL").count() == 0  # timing mode fills it
    delays_df = spark.createDataFrame(
        [(h, m) for h, m in delay_ms.items()], "host string, crawl_delay_ms long"
    )
    # eta resets each round, so gaps are scoped to (host, round)
    log = (
        sched.join(F.broadcast(delays_df), "host", "left")
        .select(
            F.concat_ws("#", "host", F.col("round").cast("string")).alias("host"),
            "departure_ms",
            F.coalesce("crawl_delay_ms", F.lit(default_ms)).alias("crawl_delay_ms"),
        )
    )
    audit = audit_politeness_log(log)
    rows = [r.asDict() for r in audit.collect()]
    assert rows, "audit produced no hosts"
    # the check must bite: at least one (host, round) saw 2+ departures
    assert any(r["n_fetches"] >= 2 for r in rows)
    for r in rows:
        assert r["n_violations"] == 0, f"politeness violated: {r}"
        if r["n_fetches"] >= 2:
            assert r["min_gap_ms"] >= r["crawl_delay_ms"], r

    # DuckDB replica of the audit over the identical log
    log_pdf = log.toPandas()
    con = duckdb.connect()
    con.register("log", log_pdf)
    oracle = con.execute("""
        WITH gaps AS (
          SELECT host, crawl_delay_ms,
                 departure_ms - lag(departure_ms) OVER (
                   PARTITION BY host ORDER BY departure_ms) AS gap_ms
          FROM log)
        SELECT host, crawl_delay_ms, count(*) AS n_fetches,
               CAST(sum(CASE WHEN gap_ms < crawl_delay_ms THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_violations,
               min(gap_ms) AS min_gap_ms
        FROM gaps GROUP BY 1, 2 ORDER BY host
    """).fetchall()
    got = [
        (r["host"], r["crawl_delay_ms"], r["n_fetches"], r["n_violations"], r["min_gap_ms"])
        for r in rows
    ]
    assert got == [tuple(t) for t in oracle]
