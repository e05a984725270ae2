"""HTML→spans converter (crawler_spark/html_spans.py): unit tests pin
the reference's tagsoup semantics (Parse.hs / Forms.hs file:line in the
converter docstring); the end-to-end test crawls REAL tag-soup pages
over sockets and asserts the trace equals the simulator on the
equivalent span web — the production seam of plans/fetch_http.py.
"""

from __future__ import annotations

import dataclasses
import json
import os

import pandas as pd

from crawler_spark.config import CrawlConfig, FormInstruction
from crawler_spark.driver import CrawlRun
from crawler_spark.html_spans import html_to_spans
from crawler_spark.simulator import Simulator
from tests.conftest import web_to_spark
from tests.http_fixture import HtmlWebServer
from tests.test_trace_equivalence import assert_equivalent


def kinds(spans):
    return [(s["kind"], s["text"], s["media_ref"]) for s in spans]


def test_hrefs_case_insensitive_every_href_attr_page_order():
    """Parse.hs:47-51: every attribute named href (any case) on every
    <a> open tag, raw value (trim happens downstream), page order."""
    html = '<a HREF=" /x ">t</a><p>mid</p><a href="/y" Href="/z">u</a><div href="/no"></div>'
    spans = html_to_spans(html)
    links = [s["text"] for s in spans if s["kind"] == "link"]
    assert links == [" /x ", "/y", "/z"]  # div's href ignored (a-tags only)
    # offsets strictly increasing in page order
    offs = [s["offset"] for s in spans]
    assert offs == sorted(offs) and len(set(offs)) == len(offs)


def test_bare_href_attribute_is_empty_string():
    assert [s["text"] for s in html_to_spans("<a href>x</a>") if s["kind"] == "link"] == [""]


def test_meta_refresh_reference_quirks():
    # first qualifying meta wins (findPageRedirect's headMay)
    two = '<head><meta http-equiv="refresh" content="0;url=/a"><meta http-equiv="refresh" content="0;url=/b"></head>'
    assert [s["text"] for s in html_to_spans(two) if s["kind"] == "meta_refresh"] == ["/a"]
    # attrs matched lowercased on key AND value (Parse.hs:36 `both toLower`)
    up = '<head><META HTTP-EQUIV="REFRESH" CONTENT="5; URL=/next x"></head>'
    assert [s["text"] for s in html_to_spans(up) if s["kind"] == "meta_refresh"] == ["/next"]
    # only tags before the first </head> qualify (takeWhile not close-head)
    after = '<head></head><meta http-equiv="refresh" content="0;url=/late">'
    assert not [s for s in html_to_spans(after) if s["kind"] == "meta_refresh"]
    # no url section in content ⇒ no redirect
    nourl = '<head><meta http-equiv="refresh" content="5"></head>'
    assert not [s for s in html_to_spans(nourl) if s["kind"] == "meta_refresh"]
    # content split on ' ' AND ';'; first token starting with "url"
    spaced = '<head><meta http-equiv="refresh" content="0 urlish url=/real"></head>'
    # "urlish" starts with "url" and has no '=' → empty target, span dropped
    # downstream (find_meta_refresh requires truthy text); the reference
    # would likewise extract "" there
    got = [s["text"] for s in html_to_spans(spaced) if s["kind"] == "meta_refresh"]
    assert got == [""]


def test_forms_nested_sections_one_close_ends_all():
    """Forms.hs isolateForms = sections of open tags, each running to the
    FIRST subsequent </form>: a nested open yields overlapping sections,
    inputs after it belong to both, one close ends them all."""
    html = (
        '<form action="/outer"><input name="a" value="1">'
        '<form action="/inner"><input name="b"></form>'
        '<input name="after">'
    )
    forms = [json.loads(s["text"]) for s in html_to_spans(html) if s["kind"] == "form"]
    assert [f["action"] for f in forms] == ["/outer", "/inner"]
    # one </form> closed BOTH sections, so neither saw input 'after';
    # input 'b' (after the nested open) belongs to both
    assert [i["key"] for i in forms[0]["inputs"]] == ["a", "b"]
    assert [i["key"] for i in forms[1]["inputs"]] == ["b"]
    # unclosed trailing form at EOF still emitted, with the tail input
    html2 = '<form action="/tail"><input name="z">'
    forms2 = [json.loads(s["text"]) for s in html_to_spans(html2) if s["kind"] == "form"]
    assert forms2 and [i["key"] for i in forms2[0]["inputs"]] == ["z"]


def test_form_defaults_and_input_discovery():
    """Forms.hs:31-42: method defaults GET, action defaults ''; inputs
    without a name dropped; value attr or null (Forms.hs:92-97)."""
    html = '<form><input value="orphan"><input NAME="k" VALUE="v"><input name="nv"></form>'
    (f,) = [json.loads(s["text"]) for s in html_to_spans(html) if s["kind"] == "form"]
    assert f["method"] == "GET" and f["action"] == ""
    assert f["inputs"] == [{"key": "k", "value": "v"}, {"key": "nv", "value": None}]


def test_script_style_text_skipped_and_hostile_never_raises():
    spans = html_to_spans("<script>var a='<b>';</script><style>p{}</style>real")
    assert [(s["kind"], s["text"]) for s in spans] == [("text", "real")]
    # pathological soup: unclosed everything, stray close tags, null-ish
    for soup in ("", "<", "</form></head><a", "<a href='/x'", "\x00<meta>", "<<<>>>"):
        html_to_spans(soup)  # must not raise


def test_html_crawl_trace_matches_span_web(spark, tmp_state):
    """Real HTML over real sockets: the engine crawls tag-soup pages
    (links, meta refresh, a POST login form, a 301, a 404 image) and
    produces EXACTLY the trace the simulator produces on the equivalent
    span web — the converter output itself (pinned by the unit tests
    above) is the equivalence bridge."""
    h = "http://h.example.org"
    pages = {
        f"{h}/p0": (
            "<html><body>welcome zero"
            '<a href="/p1">one</a><a HREF="/p2">two</a><a href="/r0">r</a>'
            '<img src="/m1.png"></body></html>'
        ),
        f"{h}/p1": (
            '<html><head><meta http-equiv="refresh" content="0;url=/p3"></head>'
            "<body>interim page</body></html>"
        ),
        f"{h}/p2": (
            "<html><body>login here"
            '<form method="POST" action="/do_login">'
            '<input name="user" value="u0"><input name="token">'
            "</form></body></html>"
        ),
        f"{h}/p3": "<html><body>destination reached</body></html>",
        f"{h}/do_login\x00token=&user=admin": "<html><body>logged in fine</body></html>",
    }
    redirects = {f"{h}/r0": f"{h}/p3"}
    inst = FormInstruction(
        label="login", url_regex="/p2", form_action_regex="/do_login",
        params=(("user", "admin"),),
    )
    web = {
        "documents": pd.DataFrame(
            [{"doc_id": u, "spans": html_to_spans(html)} for u, html in pages.items()]
        ),
        "redirects": pd.DataFrame(
            [{"src_url": s, "dst_url": d, "status_code": 301} for s, d in redirects.items()]
        ),
        "robots_rules": pd.DataFrame(
            columns=["host", "allow_prefixes", "disallow_prefixes", "crawl_delay"]
        ),
        "seeds": pd.DataFrame({"seq": [0], "url": [f"{h}/p0"]}),
        "form_instructions": [inst],
        "href_directions": [],
    }
    base = CrawlConfig(
        seeds=(f"{h}/p0",), domain_include_patterns=("example.org",),
        per_host_budget=4,
    )
    sim = Simulator(web, base)
    sim.seed(list(base.seeds))
    sim_res = sim.run(max_rounds=5)
    # the scenario actually exercised everything it claims to
    assert any("Fetch failed" in e["message"] for e in sim_res.errors)  # /m1.png 404
    stored = {u for (_, _, u) in sim_res.fetch_order}
    assert f"{h}/p2" in stored

    docs, rdf, robots = web_to_spark(spark, web)
    with HtmlWebServer(pages, redirects) as srv:
        cfg = dataclasses.replace(base, proxy=srv.proxy_addr)
        run = CrawlRun(
            spark, cfg, os.path.join(tmp_state, "html"), docs, rdf, robots,
            form_instructions=[inst], bloom_buckets=8, http_fetch=True,
        )
        run.seed(list(cfg.seeds))
        run.run(max_rounds=5)

    assert_equivalent(spark, sim_res, run)
    # the login form was actually submitted over the wire and stored
    stored_urls = {
        r["final_url"] for r in run.catalog.crawled_docs.read(spark).collect()
    }
    assert f"{h}/do_login" in stored_urls


def test_converter_never_raises_property():
    """Hypothesis sweep: arbitrary text through the converter must never
    raise, and emitted spans must carry the schema shape with strictly
    increasing offsets (html.parser degrades like tagsoup)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=400))
    def run(soup):
        spans = html_to_spans(soup)
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs)
        for s in spans:
            assert set(s) == {"kind", "text", "media_ref", "offset"}
            assert s["kind"] in {"text", "link", "media", "meta_refresh", "form"}
            assert s["text"] is None or isinstance(s["text"], str)
            assert s["media_ref"] is None or isinstance(s["media_ref"], str)
            assert isinstance(s["offset"], int)

    run()
