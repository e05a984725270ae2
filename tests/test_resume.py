"""Checkpoint/resume tests (SURVEY.md §5.3, north_rule resumability)."""

from __future__ import annotations

from crawler_spark.config import CrawlConfig
from crawler_spark.driver import CrawlRun
from crawler_spark.genweb import generate
from crawler_spark.simulator import Simulator
from tests.conftest import web_to_spark


def _mk_run(spark, tmp_state, web, config):
    docs, redirects, robots = web_to_spark(spark, web)
    return CrawlRun(
        spark,
        config,
        tmp_state,
        docs,
        redirects,
        robots,
        directions=web.get("href_directions") or [],
        form_instructions=web.get("form_instructions") or [],
        bloom_buckets=8,
    )


def test_kill_resume_continuation_identical(spark, tmp_state):
    """Run k rounds, 'crash', resume, finish — trace must equal an
    uninterrupted run (byte-identical continuation), including the session
    cookie jar (A5 state restored from the session_state table)."""
    web = generate(n_docs=50, n_hosts=6, seed=21, n_redirects=4, form_rate=0.2, cookie_gate_rate=0.2)
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=2,
    )
    sim = Simulator(web, config)
    sim.seed(list(config.seeds))
    sres = sim.run(max_rounds=6)

    run = _mk_run(spark, tmp_state, web, config)
    run.seed(list(config.seeds))
    run.run(max_rounds=3)

    # crash: drop the object; partial uncommitted writes simulated by an
    # orphan table append without a runs row
    orphan = spark.createDataFrame(
        [("http://ghost.example.org/x", 1, "completed", 99)],
        run.catalog.url_seen.schema,
    )
    run.catalog.url_seen.append(orphan, 99)

    jar_at_crash = run.ctx.cookie_jar

    run2 = _mk_run(spark, tmp_state, web, config)
    resumed = run2.resume()
    assert resumed == 2  # rounds 0..2 committed
    assert run2.round == 3
    assert run2.ctx.cookie_jar == jar_at_crash  # A5 jar restored
    run2.run(max_rounds=3)

    assert run2.fetch_order() == sres.fetch_order
    assert run2.url_seen_state() == sres.url_seen
    assert sorted(
        (r["cookie"], r["url"], r["round"])
        for r in run2.catalog.session_state.read(spark).collect()
    ) == sorted((r["cookie"], r["url"], r["round"]) for r in sres.session_state)


def test_stop_flag_halts_loop(spark, tmp_state):
    from crawler_spark import service

    web = generate(n_docs=30, n_hosts=4, seed=2)
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
    )
    run = _mk_run(spark, tmp_state, web, config)
    run.seed(list(config.seeds))
    service.request_stop(run)
    assert run.run(max_rounds=5) == 0  # halts before any round
    assert service.stop_requested(run)


def test_service_add_urls_and_queue_size(spark, tmp_state):
    from crawler_spark import service

    web = generate(n_docs=30, n_hosts=4, seed=2)
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
    )
    run = _mk_run(spark, tmp_state, web, config)
    run.seed(list(config.seeds))
    q0 = service.queue_size(run, spark)
    # duplicate of an existing pending URL is rejected; a fresh one lands
    fresh = "http://host1.example.org/p1"
    dup = web["seeds"]["url"][0]
    n = service.add_urls(run, [dup, fresh, "not a url"])
    assert n == 1
    assert service.queue_size(run, spark) == q0 + 1
    run.run(max_rounds=1)
    st = service.run_status(run, spark)
    assert st["round"] == 0 and st["status"] == "running"


def test_resume_with_other_seen_filter_type_fails_fast(spark, tmp_state):
    """seen_filter must stay stable across resume: flipping bloom→cuckoo on
    an existing state_dir would construct an EMPTY sidecar whose maybe_seen
    answers all-False, silently re-admitting previously-seen URLs. The
    constructor must refuse instead (ADVICE r04)."""
    import pytest

    web = generate(n_docs=30, n_hosts=4, seed=5)
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=2,
    )
    run = _mk_run(spark, tmp_state, web, config)  # seen_filter='bloom'
    run.seed(list(config.seeds))
    run.run(max_rounds=2)

    docs, redirects, robots = web_to_spark(spark, web)
    with pytest.raises(ValueError, match="seen_filter"):
        CrawlRun(
            spark, config, tmp_state, docs, redirects, robots,
            bloom_buckets=8, seen_filter="cuckoo",
        )
    # same filter type still resumes fine
    run2 = _mk_run(spark, tmp_state, web, config)
    assert run2.resume() >= 0
