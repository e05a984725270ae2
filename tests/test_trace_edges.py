"""Edge-case trace equivalence + engine state invariants (SURVEY §5.4)."""

from __future__ import annotations

from crawler_spark.config import CrawlConfig
from crawler_spark.driver import CrawlRun
from crawler_spark.genweb import generate
from crawler_spark.simulator import Simulator
from tests.conftest import web_to_spark
from tests.test_trace_equivalence import assert_equivalent, run_both


def test_zero_quota_stores_nothing(spark, tmp_state):
    web = generate(n_docs=20, n_hosts=3, seed=13)
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        crawl_limit=0,
    )
    sim, sres, run = run_both(spark, tmp_state, web, config, max_rounds=3)
    assert sres.stored == []
    assert run.catalog.crawled_docs.read(spark).count() == 0
    assert run.fetch_order() == sres.fetch_order == []


def test_empty_include_rejects_all_seeds(spark, tmp_state):
    """F1: empty pattern sets reject everything (src/Crawl.hs:214-228)."""
    web = generate(n_docs=20, n_hosts=3, seed=13)
    config = CrawlConfig(seeds=tuple(web["seeds"]["url"]))
    sim, sres, run = run_both(spark, tmp_state, web, config, max_rounds=3)
    assert sres.fetch_order == [] and run.fetch_order() == []
    assert run.catalog.frontier.read(spark).count() == 0


def test_high_budget_single_round_drain(spark, tmp_state):
    """Budget ≥ web size: everything reachable is fetched breadth-first."""
    web = generate(n_docs=40, n_hosts=4, seed=17, n_redirects=2, long_chain=False)
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=100,
    )
    sim, sres, run = run_both(spark, tmp_state, web, config, max_rounds=4)
    assert_equivalent(spark, sres, run)


def test_engine_state_invariants(spark, tmp_state):
    """Per-property checks across a multi-round crawl:
    pending ∩ url_seen = ∅ (D1), seq unique & dense-ish, scheduled ⊆
    frontier, chains' heads stored as final_url."""
    from pyspark.sql import functions as F

    from crawler_spark.plans.round import pending_frontier

    web = generate(n_docs=80, n_hosts=8, seed=23, n_redirects=6)
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=3,
    )
    docs, redirects, robots = web_to_spark(spark, web)
    run = CrawlRun(spark, config, tmp_state, docs, redirects, robots, bloom_buckets=8)
    run.seed(list(config.seeds))
    run.run(max_rounds=5)

    frontier = run.catalog.frontier.read(spark)
    scheduled = run.catalog.scheduled.read(spark)
    seen = run.catalog.url_seen.read(spark)

    n = frontier.count()
    assert frontier.select("seq").distinct().count() == n  # seq unique
    assert frontier.agg(F.max("seq")).collect()[0][0] == run.next_seq - 1

    pending = pending_frontier(frontier, scheduled)
    assert pending.join(seen, "url", "left_semi").count() == 0  # D1 invariant

    assert scheduled.join(frontier, "seq", "left_anti").count() == 0  # ⊆

    crawled = run.catalog.crawled_docs.read(spark)
    bad = crawled.where(
        F.element_at("redirect_chain", 1) != F.col("final_url")
    ).count()
    assert bad == 0  # chain head = final URL (src/Fetch.hs:40-43)
