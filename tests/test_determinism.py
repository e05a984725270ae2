"""Crawl-order determinism across physical configurations (SURVEY §3.4):
the schedule must be a pure function of (web, config, seeds) — not of
shuffle partitioning, parallelism, or AQE decisions. This is the property
the reference could not offer (20 racing threads) and the one our
re-specification guarantees."""

from __future__ import annotations

from crawler_spark.config import CrawlConfig
from crawler_spark.driver import CrawlRun
from crawler_spark.genweb import generate
from tests.conftest import web_to_spark


def _crawl(spark, state_dir, web, config, rounds):
    docs, redirects, robots = web_to_spark(spark, web)
    run = CrawlRun(spark, config, state_dir, docs, redirects, robots, bloom_buckets=8)
    run.seed(list(config.seeds))
    run.run(max_rounds=rounds)
    return run.fetch_order(), run.url_seen_state()


def test_identical_trace_across_shuffle_partitions(spark, tmp_path):
    web = generate(n_docs=70, n_hosts=7, seed=41, n_redirects=5)
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=2,
        scheduler_salts=5,
    )
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        order_a, seen_a = _crawl(spark, str(tmp_path / "a"), web, config, 4)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        order_b, seen_b = _crawl(spark, str(tmp_path / "b"), web, config, 4)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert order_a == order_b
    assert seen_a == seen_b
    assert len(order_a) > 10


def test_identical_trace_with_and_without_aqe(spark, tmp_path):
    web = generate(n_docs=50, n_hosts=5, seed=43, n_redirects=3)
    config = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=3,
    )
    original = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        order_a, seen_a = _crawl(spark, str(tmp_path / "a"), web, config, 3)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        order_b, seen_b = _crawl(spark, str(tmp_path / "b"), web, config, 3)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", original)
    assert order_a == order_b
    assert seen_a == seen_b


def test_prebuilt_doc_index_trace_parity(spark, tmp_path):
    """CrawlRun(doc_index_prebuilt=...) must use the shared index (no
    per-state rebuild) and produce the exact simulator trace — the
    corpus-preprocessing reuse path the bench legs take."""
    import tempfile

    from crawler_spark.config import CrawlConfig
    from crawler_spark.driver import CrawlRun
    from crawler_spark.genweb import generate
    from crawler_spark.plans.doc_index import write_bucketed_index
    from crawler_spark.simulator import Simulator
    from tests.conftest import web_to_spark

    web = generate(n_docs=60, n_hosts=6, seed=13, n_redirects=2)
    web["href_directions"] = []  # directions disable the doc-index path
    docs, redirects, robots = web_to_spark(spark, web)
    cfg = CrawlConfig(seeds=tuple(web["seeds"]["url"]),
                      domain_include_patterns=("example.org",), per_host_budget=2)
    idx = str(tmp_path / "_docindex")
    write_bucketed_index(docs, idx)
    run = CrawlRun(spark, cfg, str(tmp_path / "st"), docs, redirects, robots,
                   directions=[], form_instructions=web["form_instructions"],
                   doc_index_prebuilt=idx)
    assert run.ctx.doc_index_path == idx
    run.seed(list(cfg.seeds))
    run.run(max_rounds=4)
    sim = Simulator(web, cfg)
    sim.seed(list(cfg.seeds))
    res = sim.run(max_rounds=4)
    assert run.fetch_order() == res.fetch_order
    assert run.url_seen_state() == res.url_seen
