"""Real-socket fetch stage (S9/A1 real path) vs fetch-simulate.

Drives a full crawl through plans/fetch_http.py against an in-process
HTTP proxy serving the same synthetic web the fetch-sim joins read, and
asserts the complete trace (fetch order, url_seen, stored docs with
span sequences, error multiset, session jar) is identical to the
simulator — i.e. the real path and the simulated path are
interchangeable, per the SURVEY.md S9 seam contract.
"""

from __future__ import annotations

import dataclasses
import os

from crawler_spark.config import CrawlConfig
from crawler_spark.driver import CrawlRun
from crawler_spark.genweb import generate
from crawler_spark.plans.fetch_http import USER_AGENT
from crawler_spark.simulator import Simulator
from tests.conftest import web_to_spark
from tests.http_fixture import SyntheticWebServer
from tests.test_trace_equivalence import assert_equivalent


def test_http_fetch_trace_matches_fetch_sim(spark, tmp_state):
    web = generate(
        n_docs=60,
        n_hosts=8,
        seed=7,
        n_redirects=6,
        long_chain=True,
        meta_refresh_rate=0.1,
        form_rate=0.1,
        direction_rate=0.15,
    )
    base = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=2,
    )
    sim = Simulator(web, base)
    sim.seed(list(base.seeds))
    sim_res = sim.run(max_rounds=6)
    assert len(sim_res.fetch_order) > 10

    docs, redirects, robots = web_to_spark(spark, web)
    with SyntheticWebServer(web) as srv:
        cfg = dataclasses.replace(base, proxy=srv.proxy_addr)
        run = CrawlRun(
            spark,
            cfg,
            os.path.join(tmp_state, "http"),
            docs,  # unused by the http path — the proxy serves the web
            redirects,
            robots,
            directions=web.get("href_directions") or [],
            form_instructions=web.get("form_instructions") or [],
            bloom_buckets=8,
            http_fetch=True,
        )
        run.seed(list(cfg.seeds))
        run.run(max_rounds=6)
        requests = list(srv.requests)

    # the trace over real sockets equals the simulator's exactly
    assert_equivalent(spark, sim_res, run)

    # request-path parity (src/Request.hs:15-44): every request carried
    # the reference UA, and at least one login-chain fetch sent a cookie
    assert requests and all(r["user_agent"] == USER_AGENT for r in requests)
    # redirect sources were requested (engine followed 3xx manually)
    red_srcs = set(web["redirects"]["src_url"])
    if red_srcs:
        assert any(r["url"] in red_srcs for r in requests)


def test_http_fetch_abort_and_missing(spark, tmp_state):
    """Redirect cycle (abort at max_redirects) and a 404 target both come
    back as failed rows with the simulator's exact error messages."""
    import pandas as pd

    a, b, gone = (
        "http://h.example.org/a",
        "http://h.example.org/b",
        "http://h.example.org/gone",
    )
    seed = "http://h.example.org/p0"
    web = {
        "documents": pd.DataFrame(
            [{"doc_id": seed, "spans": [
                {"kind": "text", "text": "go /a go /gone", "media_ref": None, "offset": 0},
                {"kind": "link", "text": "/a", "media_ref": None, "offset": 1},
                {"kind": "link", "text": "/gone", "media_ref": None, "offset": 2},
            ]}]
        ),
        "redirects": pd.DataFrame(
            [{"src_url": a, "dst_url": b, "status_code": 301},
             {"src_url": b, "dst_url": a, "status_code": 301}]
        ),
        "robots_rules": pd.DataFrame(columns=["host", "allow_prefixes", "disallow_prefixes", "crawl_delay"]),
        "seeds": pd.DataFrame({"seq": [0], "url": [seed]}),
        "form_instructions": [],
        "href_directions": [],
    }
    base = CrawlConfig(
        seeds=(seed,),
        domain_include_patterns=("example.org",),
        per_host_budget=4,
        max_redirects=5,
    )
    sim = Simulator(web, base)
    sim.seed([seed])
    sim_res = sim.run(max_rounds=3)
    assert any("Too many redirects" in e["message"] for e in sim_res.errors)
    assert any("Fetch failed" in e["message"] for e in sim_res.errors)

    docs, redirects, robots = web_to_spark(spark, web)
    with SyntheticWebServer(web) as srv:
        cfg = dataclasses.replace(base, proxy=srv.proxy_addr)
        run = CrawlRun(
            spark, cfg, os.path.join(tmp_state, "http2"), docs, redirects, robots,
            bloom_buckets=8, http_fetch=True,
        )
        run.seed([seed])
        run.run(max_rounds=3)

    assert_equivalent(spark, sim_res, run)


def test_http_fetch_hostile_responses_become_failed_rows():
    """Server-controlled data must degrade to failed-fetch rows, never
    crash the stage: malformed Content-Length, JSON that is not a span
    list, and a relative Location after a POST (which must resolve
    against the ACTION url, not the NUL-carrying fetch key)."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import pandas as pd

    spans_ok = [{"kind": "text", "text": "hi", "media_ref": None, "offset": 0}]

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def do_GET(self):  # noqa: N802
            if self.path.endswith("/badlen"):
                body = b"[]"
                self.send_response(200)
                self.send_header("Content-Length", "not-a-number")
                self.end_headers()
                self.wfile.write(body)
            elif self.path.endswith("/notalist"):
                body = b"5"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path.endswith("/login?next=1"):
                body = _json.dumps(spans_ok).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()

        def do_POST(self):  # noqa: N802
            self.rfile.read(int(self.headers.get("Content-Length") or 0))
            # query-only Location: resolves to <action>?next=1 iff the
            # base is the action URL; against the NUL fetch key it would
            # produce an illegal URL and a spurious failed row
            self.send_response(302)
            self.send_header("Location", "?next=1")
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    from crawler_spark.plans.fetch_http import make_http_fetch

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address
        cfg = CrawlConfig(seeds=(), domain_include_patterns=("example.org",),
                          proxy=f"{host}:{port}")
        fetch = make_http_fetch(cfg, frozenset())
        urls = [
            "http://h.example.org/badlen",
            "http://h.example.org/notalist",
            "http://h.example.org/login\x00pass=x&user=admin",
        ]
        pdf = pd.DataFrame({
            "rank": [1, 2, 3],
            "scheduled_url": urls,
            "current_url": urls,
            "hops": [0, 0, 0],
            "chain_cookies": [[], [], []],
        })
        (out,) = list(fetch(iter([pdf])))
        rows = {r.scheduled_url: r for r in out.itertuples()}
        # hostile rows: failed (spans None), no exception escaped
        assert rows[urls[0]].spans is None
        assert rows[urls[1]].spans is None
        # POST: 302 '?next=1' resolved against the action URL and fetched
        post = rows[urls[2]]
        assert post.spans == spans_ok
        assert post.final == "http://h.example.org/login?next=1"
        assert post.visited[-1] == "http://h.example.org/login?next=1"
    finally:
        srv.shutdown()
        srv.server_close()
