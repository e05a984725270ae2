"""Streaming frontier ingestion (crawler_spark/streaming/ingest.py).

Covers the Streaming checklist row (SURVEY.md §2.8): file-source stream →
stateful dedup (applyInPandasWithState) → foreachBatch admission into the
frontier, interleaved with batch crawl rounds.
"""

from __future__ import annotations

import os

import pytest

from crawler_spark.config import CrawlConfig
from crawler_spark.driver import CrawlRun
from crawler_spark.genweb import generate
from crawler_spark.streaming.ingest import HAVE_TWS, StreamingIngest

# the transformWithStateInPandas variant needs google.protobuf (absent in
# this container) — parametrized runs skip rather than fail without it
_TWS_PARAMS = [
    pytest.param(False, id="apiws"),
    pytest.param(
        True,
        id="tws",
        marks=pytest.mark.skipif(not HAVE_TWS, reason="google.protobuf not installed"),
    ),
]
from tests.conftest import web_to_spark


@pytest.fixture()
def stream_run(spark, tmp_state):
    web = generate(n_docs=60, n_hosts=6, seed=23, n_redirects=3)
    docs, redirects, robots = web_to_spark(spark, web)
    config = CrawlConfig(domain_include_patterns=("example.org",), per_host_budget=3)
    run = CrawlRun(spark, config, tmp_state, docs, redirects, robots, bloom_buckets=8)
    return web, run


def _write_urls(path: str, name: str, urls: list[str]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        f.write("\n".join(urls) + "\n")


@pytest.mark.parametrize("use_tws", _TWS_PARAMS)
def test_stream_ingest_dedup_and_admission(stream_run, spark, tmp_path, use_tws):
    web, run = stream_run
    doc_urls = [d["doc_id"] for d in web["documents"].to_dict("records")][:12]
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    # duplicates within a file, across files, messy/invalid variants
    _write_urls(in_dir, "a.txt", doc_urls[:6] + doc_urls[:3] + ["mailto:x@y", "ht tp://bad"])
    # host-case variant canonicalizes to an already-sent URL (path case kept)
    host0 = doc_urls[0].split("//")[1].split("/")[0]
    variant = doc_urls[0].replace(host0, host0.upper())
    _write_urls(in_dir, "b.txt", doc_urls[3:9] + [variant])

    ingest = StreamingIngest(run, n_buckets=8)
    q = ingest.start(in_dir, ckpt, available_now=True, use_tws=use_tws)
    q.awaitTermination(120)

    fr = run.catalog.frontier.read(spark)
    urls = [r["url"] for r in fr.select("url").collect()]
    assert sorted(urls) == sorted(set(urls))  # no dupes admitted
    # canonicalization folded the uppercased-host variant into its original
    assert set(urls) == set(doc_urls[:9])
    # seqs are monotone & dense across micro-batches
    seqs = sorted(r["seq"] for r in fr.collect())
    assert seqs == list(range(len(seqs)))
    assert run.next_seq == len(seqs)


def test_stream_then_crawl_then_stream(stream_run, spark, tmp_path):
    """Interleaving: stream batch 1 → crawl a round → stream batch 2 must
    not re-admit URLs the crawl already completed or still has pending."""
    web, run = stream_run
    doc_urls = [d["doc_id"] for d in web["documents"].to_dict("records")]
    in1, in2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    ck1, ck2 = str(tmp_path / "c1"), str(tmp_path / "c2")

    _write_urls(in1, "a.txt", doc_urls[:6])
    ingest = StreamingIngest(run, n_buckets=8)
    ingest.start(in1, ck1, available_now=True).awaitTermination(120)
    assert sum(ingest.batches) == 6

    assert run.run_one_round()
    seen = set(run.url_seen_state())
    pending = {r["url"] for r in run.catalog.frontier.read(spark).collect()} - {
        r["url"] for r in run.catalog.scheduled.read(spark).collect()
    }
    assert seen  # the round completed something

    # second stream: overlap with seen + pending + genuinely new
    new = [u for u in doc_urls if u not in seen and u not in pending][:4]
    _write_urls(in2, "b.txt", list(seen)[:3] + list(pending)[:2] + new)
    ingest2 = StreamingIngest(run, n_buckets=8)
    ingest2.start(in2, ck2, available_now=True).awaitTermination(120)
    assert sum(ingest2.batches) == len(new)

    fr = [r["url"] for r in run.catalog.frontier.read(spark).select("url").collect()]
    assert sorted(fr) == sorted(set(fr))  # still no dupes
    assert set(new) <= set(fr)


@pytest.mark.parametrize("use_tws", _TWS_PARAMS)
def test_stream_state_survives_restart(stream_run, spark, tmp_path, use_tws):
    """Stateful-dedup state is Spark-checkpointed (GroupState for
    applyInPandasWithState, RocksDB ListState for the
    transformWithStateInPandas variant): a NEW query over the SAME
    checkpoint must remember every url_hash it already emitted, so
    re-sent URLs are deduped by restored state (before any table
    anti-join could catch them — they were admitted pre-restart)."""
    web, run = stream_run
    doc_urls = [d["doc_id"] for d in web["documents"].to_dict("records")]
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")

    _write_urls(in_dir, "a.txt", doc_urls[:5])
    ingest = StreamingIngest(run, n_buckets=8)
    ingest.start(in_dir, ckpt, available_now=True, use_tws=use_tws).awaitTermination(120)
    assert sum(ingest.batches) == 5

    # restart: same checkpoint, fresh query object; resend 3 old + 4 new.
    # The old 3 ARE still pending in the frontier, so the table anti-join
    # would also drop them — prove the STATE did it by counting emitted
    # rows per micro-batch (state dedup happens before _admit_batch).
    _write_urls(in_dir, "b.txt", doc_urls[:3] + doc_urls[5:9])
    ingest2 = StreamingIngest(run, n_buckets=8)
    q = ingest2.start(in_dir, ckpt, available_now=True, use_tws=use_tws)
    q.awaitTermination(120)
    # only the 4 genuinely-new URLs reached admission at all
    assert sum(ingest2.batches) == 4

    fr = [r["url"] for r in run.catalog.frontier.read(spark).select("url").collect()]
    assert sorted(fr) == sorted(set(fr))
    assert set(doc_urls[:9]) == set(fr)


def test_kafka_value_projection(spark):
    """kafka_candidates: CAST(value AS STRING) over Kafka's binary value
    column + deterministic arrival hash — the projection the kafka and
    kafka-fixture sources share."""
    from crawler_spark.streaming.ingest import kafka_candidates

    df = spark.createDataFrame(
        [(bytearray(b"http://k.example.org/a"),), (bytearray(b"http://k.example.org/b"),)],
        "value binary",
    )
    rows = {r["url"]: r["arrival"] for r in kafka_candidates(df).collect()}
    assert set(rows) == {"http://k.example.org/a", "http://k.example.org/b"}
    assert all(isinstance(v, int) for v in rows.values())


def test_kafka_fixture_source_ingest(stream_run, spark, tmp_path):
    """The kafka source config path end-to-end, jar-free: the rate source
    shaped into Kafka's (value: binary) schema runs through the SAME
    kafka_candidates projection, stateful dedup, and foreachBatch
    admission as production kafka would."""
    import time

    web, run = stream_run
    ingest = StreamingIngest(run, n_buckets=8)
    q = ingest.start(
        checkpoint_dir=str(tmp_path / "ckpt_kafka"),
        available_now=False,  # rate source is continuous; stop explicitly
        source={
            "format": "kafka-fixture",
            "options": {"rowsPerSecond": "50"},
            "url_prefix": "http://stream.example.org/s",
        },
    )
    try:
        deadline = time.time() + 120
        while sum(ingest.batches) < 20 and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
    assert sum(ingest.batches) >= 20

    fr = run.catalog.frontier.read(spark)
    urls = [r["url"] for r in fr.select("url").collect()]
    assert urls and all(u.startswith("http://stream.example.org/s") for u in urls)
    assert sorted(urls) == sorted(set(urls))  # no dupes across batches
    seqs = sorted(r["seq"] for r in fr.collect())
    assert seqs == list(range(len(seqs)))  # dense monotone seq assignment


def test_kafka_source_config_requires_package(spark):
    """The real kafka format is wired (options applied, projection
    attached) — in this container the data-source jar is absent, so
    constructing the reader must fail with the standard DATA_SOURCE
    error, not silently fall back."""
    import pytest as _pytest

    from crawler_spark.streaming.ingest import build_candidate_source

    with _pytest.raises(Exception, match="(?i)kafka"):
        build_candidate_source(
            spark,
            {
                "format": "kafka",
                "options": {
                    "kafka.bootstrap.servers": "localhost:9092",
                    "subscribe": "crawl-candidates",
                },
            },
        )
