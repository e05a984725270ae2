"""Recrawl eviction end-to-end (VERDICT r04 #8): expire a crawled URL via
CrawlRun.evict_urls — url_seen anti-join + cuckoo sidecar deletion — and
prove the next organic link discovery re-fetches it EXACTLY once.

Fixture: a single-host chain p0 → p1 → p2 → p3 → p0 with per_host_budget=1,
so each round fetches exactly one page and the back-link to p0 is only
discovered (round 3, from p3) AFTER the eviction between rounds 2 and 3.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark.config import CrawlConfig
from crawler_spark.driver import CrawlRun
from tests.conftest import web_to_spark

HOST = "re.example.org"
URLS = [f"http://{HOST}/p{i}" for i in range(4)]


def _chain_web():
    def sp(kind, text, offset=0):
        return {"kind": kind, "text": text, "media_ref": None, "offset": offset}

    docs = pd.DataFrame([
        {"doc_id": URLS[i], "spans": [
            sp("text", f"page {i} content", 0),
            sp("link", URLS[(i + 1) % 4], 1),  # p3 links back to p0
        ]}
        for i in range(4)
    ])
    return {
        "documents": docs,
        "redirects": pd.DataFrame(columns=["src_url", "dst_url", "status_code"]),
        "robots_rules": pd.DataFrame(
            columns=["host", "allow_prefixes", "disallow_prefixes", "crawl_delay"]
        ),
    }


def _mk_run(spark, state, seen_filter):
    docs, redirects, robots = web_to_spark(spark, _chain_web())
    cfg = CrawlConfig(
        seeds=(URLS[0],),
        domain_include_patterns=("example.org",),
        per_host_budget=1,
    )
    return CrawlRun(
        spark, cfg, state, docs, redirects, robots,
        bloom_buckets=4, seen_filter=seen_filter,
    )


@pytest.mark.parametrize("seen_filter", ["cuckoo", "bloom"])
def test_evicted_url_refetched_exactly_once(spark, tmp_state, seen_filter):
    import numpy as np

    run = _mk_run(spark, tmp_state + "_" + seen_filter, seen_filter)
    run.seed([URLS[0]])
    run.run(max_rounds=3)  # rounds 0..2 fetch p0, p1, p2
    fetched = [u for _, _, u in run.fetch_order()]
    assert fetched == URLS[:3]

    p0_hash = run.catalog.url_seen.read(spark).where(
        F.col("url") == URLS[0]
    ).collect()[0]["url_hash"]
    assert bool(run.ctx.bloom.maybe_seen(
        pd.Series(np.asarray([p0_hash], dtype=np.int64)), run.ctx.bloom.manifest()
    )[0])

    # the recrawl-schedule selection side: everything crawled in round 0 is
    # past its TTL (q_recrawl_schedule's due-date rule, applied to own state)
    expired = (
        run.catalog.url_seen.read(spark).where(F.col("round") <= 0).select("url")
    )
    assert run.evict_urls(expired) == 1

    # exact set no longer contains p0; the cuckoo filter truly deleted it,
    # the bloom filter cannot (and must not need to — admission exact-checks)
    assert URLS[0] not in run.url_seen_state()
    filter_hit = bool(run.ctx.bloom.maybe_seen(
        pd.Series(np.asarray([p0_hash], dtype=np.int64)), run.ctx.bloom.manifest()
    )[0])
    assert filter_hit == (seen_filter == "bloom")

    run.run(max_rounds=2)  # round 3 fetches p3 (discovers p0), round 4 refetches p0
    order = [(r, u) for r, _, u in run.fetch_order()]
    assert order == [
        (0, URLS[0]), (1, URLS[1]), (2, URLS[2]), (3, URLS[3]), (4, URLS[0]),
    ]
    # exactly once: p0 has exactly two fetches total, everything else one
    counts = pd.Series([u for _, u in order]).value_counts()
    assert counts[URLS[0]] == 2 and (counts.drop(URLS[0]) == 1).all()
    # and p0 is seen again afterwards
    assert run.url_seen_state()[URLS[0]] == "completed"


def test_eviction_survives_resume(spark, tmp_state):
    """The eviction snapshot commits at the last completed round, so a
    kill/resume after eviction must NOT resurrect the evicted URL."""
    state = tmp_state + "_resume"
    run = _mk_run(spark, state, "cuckoo")
    run.seed([URLS[0]])
    run.run(max_rounds=3)
    assert run.evict_urls([URLS[0]]) == 1

    run2 = _mk_run(spark, state, "cuckoo")
    run2.resume()
    assert URLS[0] not in run2.url_seen_state()
    run2.run(max_rounds=2)
    order = [(r, u) for r, _, u in run2.fetch_order()]
    assert order[-1] == (4, URLS[0])
