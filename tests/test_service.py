"""Control-surface parity (S13, src/Service.hs:28-83) beyond the
add_urls/stop/queue_size verbs covered by test_resume: runtime
include-pattern growth and the workerStatus analog."""

from __future__ import annotations

import pandas as pd

from crawler_spark import service
from crawler_spark.config import CrawlConfig
from crawler_spark.driver import CrawlRun
from tests.conftest import web_to_spark


def _span(kind, text=None, offset=0):
    return {"kind": kind, "text": text, "media_ref": None, "offset": offset}


def _web():
    h = "http://h.example.org"
    docs = pd.DataFrame(
        [
            {"doc_id": f"{h}/a0", "spans": [_span("text", "start", 0), _span("link", "/a1", 1)]},
            {"doc_id": f"{h}/a1", "spans": [_span("text", "mid", 0), _span("link", "/b1", 1)]},
            {"doc_id": f"{h}/b1", "spans": [_span("text", "b-side", 0)]},
        ]
    )
    return {
        "documents": docs,
        "redirects": pd.DataFrame(columns=["src_url", "dst_url", "status_code"]),
        "robots_rules": pd.DataFrame(
            columns=["host", "allow_prefixes", "disallow_prefixes", "crawl_delay"]
        ),
    }


def test_add_url_include_pattern_between_rounds(spark, tmp_state):
    """src/Service.hs:76-77: a pattern inserted at runtime admits URLs in
    FOLLOWING rounds. /b1 is discovered only after the pattern exists, so
    it gets admitted; had the pattern stayed frozen it would have been
    silently include-dropped at enqueue (Crawl.hs:189)."""
    h = "http://h.example.org"
    web = _web()
    docs, redirects, robots = web_to_spark(spark, web)
    cfg = CrawlConfig(seeds=(f"{h}/a0",), url_include_patterns=("/a",), per_host_budget=4)
    run = CrawlRun(spark, cfg, tmp_state, docs, redirects, robots, bloom_buckets=4)
    run.seed(list(cfg.seeds))

    run.run(max_rounds=1)  # round 0: fetch /a0, admit /a1
    stored0 = {r["final_url"] for r in run.catalog.crawled_docs.read(spark).collect()}
    assert stored0 == {f"{h}/a0"}

    service.add_url_include_pattern(run, "/b")
    assert "/b" in run.ctx.config.url_include_patterns
    run.run(max_rounds=3)  # round 1 fetches /a1, admits /b1; round 2 fetches it

    stored = {r["final_url"] for r in run.catalog.crawled_docs.read(spark).collect()}
    assert f"{h}/b1" in stored
    assert run.url_seen_state().get(f"{h}/b1") == "completed"


def test_include_pattern_frozen_without_service_call(spark, tmp_state):
    """Control: same web without the runtime insert — /b1 stays dropped."""
    h = "http://h.example.org"
    web = _web()
    docs, redirects, robots = web_to_spark(spark, web)
    cfg = CrawlConfig(seeds=(f"{h}/a0",), url_include_patterns=("/a",), per_host_budget=4)
    run = CrawlRun(spark, cfg, tmp_state, docs, redirects, robots, bloom_buckets=4)
    run.seed(list(cfg.seeds))
    run.run(max_rounds=4)
    stored = {r["final_url"] for r in run.catalog.crawled_docs.read(spark).collect()}
    assert f"{h}/b1" not in stored


def test_worker_status(spark, tmp_state):
    h = "http://h.example.org"
    web = _web()
    docs, redirects, robots = web_to_spark(spark, web)
    cfg = CrawlConfig(seeds=(f"{h}/a0",), url_include_patterns=("/a", "/b"), per_host_budget=4)
    run = CrawlRun(spark, cfg, tmp_state, docs, redirects, robots, bloom_buckets=4)
    run.seed(list(cfg.seeds))
    run.run(max_rounds=4)

    ws = service.worker_status(run, spark)
    assert ws["parallelism"] >= 1
    assert ws["rounds_run"] == run.round
    assert ws["stored_total"] == 3  # a0, a1, b1
    # per-round counters made it into the metrics view
    assert any(name == "stored" for (_, name, _) in ws["metrics"])


def test_http_control_listener(spark, tmp_state):
    """The warp analog (service_http.ControlServer, src/Service.hs:28-83):
    all six endpoints over real sockets against a live run — status,
    queueSize, workerStatus, addUrl (incl. the err400 body for garbage),
    addUrlIncludePattern taking effect next round, and stop halting the
    loop at the boundary."""
    import json as _json
    import urllib.error
    import urllib.request

    from crawler_spark.service_http import ControlServer

    h = "http://h.example.org"
    web = _web()
    docs, redirects, robots = web_to_spark(spark, web)
    cfg = CrawlConfig(seeds=(f"{h}/a0",), url_include_patterns=("/a",), per_host_budget=4)
    run = CrawlRun(spark, cfg, tmp_state, docs, redirects, robots, bloom_buckets=4)
    run.seed(list(cfg.seeds))
    run.run(max_rounds=1)

    srv = ControlServer(run, port=0).start()
    base = f"http://127.0.0.1:{srv.port}"

    def get(path):
        with urllib.request.urlopen(base + path, timeout=30) as r:
            return _json.loads(r.read())

    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=_json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            return _json.loads(r.read() or b"null")

    try:
        st = get("/status")
        assert st["round"] == run.round - 1 and st["status"] in ("running", "ok", "committed")
        assert isinstance(get("/queueSize/UrlQueue"), int)
        assert get("/queueSize/StoreQueue") == 0
        ws = get("/workerStatus")
        assert isinstance(ws, list) and any(l.startswith("parallelism=") for l in ws)

        # err400 parity for garbage URLs (Service.hs:70-72)
        try:
            post("/addUrl", "not a url ::: nope")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert e.read().startswith(b"Could not understand url:")

        # runtime include pattern + added URL crawled in following rounds
        post("/addUrlIncludePattern", "/b")
        post("/addUrl", f"{h}/b1")
        run.run(max_rounds=2)
        stored = {r["final_url"] for r in run.catalog.crawled_docs.read(spark).collect()}
        assert f"{h}/b1" in stored

        # stop: flag honored at the next boundary
        post("/stop", None)
        assert run.run(max_rounds=5) == 0
    finally:
        srv.stop()
