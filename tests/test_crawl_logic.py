"""Pure-Python unit tests for the shared crawl semantics (crawl_logic.py)
— the SURVEY.md §5.1 operator checklist items with no Spark dependency."""

from __future__ import annotations

import pytest

from crawler_spark import crawl_logic as cl
from crawler_spark.config import (
    FormInstruction,
    HrefDirection,
    parse_form_instructions,
    parse_href_directions,
)


def span(kind, text=None, media_ref=None, offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


# -- body/link extraction (H2) ----------------------------------------------

def test_extract_links_order_and_media():
    spans = [
        span("link", text=" /b ", offset=2),
        span("text", text="hello", offset=0),
        span("media", media_ref="http://x/m.bin", offset=3),
        span("link", text="/a", offset=1),
    ]
    assert cl.extract_raw_links(spans) == ["/a", "/b", "http://x/m.bin"]


def test_body_text_concatenates_text_spans_in_offset_order():
    spans = [span("text", text="b", offset=1), span("text", text="a", offset=0), span("link", text="/x", offset=2)]
    assert cl.body_text(spans) == "a\nb"


# -- directions (A3/H5, src/Directions.hs:20-43) ----------------------------

def test_direction_first_rule_wins_and_capture_group():
    spans = [span("text", text="go NEXT:/p5 now", offset=0)]
    ds = [
        HrefDirection("no-match", url_regex="/nope$", href_regex="NEXT:(\\S+)"),
        HrefDirection("hit", url_regex="/p[0-9]+$", href_regex="NEXT:(\\S+)"),
        HrefDirection("later", url_regex=".", href_regex="(never)"),
    ]
    assert cl.find_direction("http://h/p1", spans, ds) == "http://h/p5"


def test_direction_no_capture_is_skipped():
    spans = [span("text", text="NEXT:/p5", offset=0)]
    ds = [HrefDirection("nocap", url_regex=".", href_regex="NEXT:\\S+")]
    assert cl.find_direction("http://h/p1", spans, ds) is None


# -- forms (src/Forms.hs) ----------------------------------------------------

def test_form_merge_override_and_order():
    discovered = [
        {"key": "b", "value": "2"},
        {"key": "a", "value": None},
        {"key": "b", "value": "3"},  # later duplicate wins (Map.fromList)
    ]
    merged = cl.merge_form_params(discovered, [("a", "x")])
    assert merged == [("a", "x"), ("b", "3")]


def test_form_override_missing_key_raises():
    with pytest.raises(KeyError):
        cl.merge_form_params([{"key": "a", "value": "1"}], [("zz", "v")])


def test_select_form_first_form_first_instruction():
    import json

    # POST ⇒ urlencoded BODY behind the NUL separator, action URL plain
    # (DownloadRequest.hs:27-33 urlEncodedBody)
    f1 = json.dumps({"method": "POST", "action": "/login", "inputs": [{"key": "u", "value": ""}]})
    spans = [span("form", text=f1, offset=0)]
    inst = [FormInstruction("l", url_regex="/p", form_action_regex="/login$", params=(("u", "me"),))]
    url, label, errs = cl.select_form("http://h/p1", spans, inst)
    assert url == "http://h/login\x00u=me"
    assert cl.strip_post_key(url) == "http://h/login"
    assert label == "l" and errs == []


def test_select_form_get_query_string():
    import json

    # GET ⇒ setQueryString semantics: params land in the URL itself
    f1 = json.dumps({"method": "GET", "action": "/login", "inputs": [{"key": "u", "value": ""}]})
    spans = [span("form", text=f1, offset=0)]
    inst = [FormInstruction("l", url_regex="/p", form_action_regex="/login$", params=(("u", "me"),))]
    url, label, errs = cl.select_form("http://h/p1", spans, inst)
    assert url == "http://h/login?u=me"
    assert cl.strip_post_key(url) == url
    assert label == "l" and errs == []


def test_select_form_bad_override_logs_and_skips():
    import json

    f1 = json.dumps({"method": "GET", "action": "/login", "inputs": []})
    spans = [span("form", text=f1, offset=0)]
    inst = [FormInstruction("l", url_regex=".", form_action_regex="/login$", params=(("u", "x"),))]
    url, label, errs = cl.select_form("http://h/p", spans, inst)
    assert url is None and len(errs) == 1 and "non-existing key" in errs[0]


# -- robots (F6) -------------------------------------------------------------

@pytest.mark.parametrize(
    "path,allow,dis,expected",
    [
        ("/private/p1x", ["/private/p1"], ["/private"], True),  # longer allow wins
        ("/private/z", ["/private/p1"], ["/private"], False),
        ("/public", ["/private/p1"], ["/private"], True),  # no match ⇒ allow
        ("/x", ["/x"], ["/x"], True),  # tie ⇒ allow
        ("/", [], [], True),
    ],
)
def test_robots_longest_prefix(path, allow, dis, expected):
    assert cl.robots_allowed(f"http://h.org{path}", "h.org", allow, dis) is expected


# -- budgets (P7) ------------------------------------------------------------

@pytest.mark.parametrize(
    "budget,delay,expected",
    [(10, None, 10), (10, 2.0, 5), (10, 3.0, 3), (1, 100.0, 1), (10, 0.5, 10), (10, 1.0, 10)],
)
def test_host_budget(budget, delay, expected):
    assert cl.host_budget(budget, delay) == expected


# -- include filter (F1) -----------------------------------------------------

def test_include_empty_sets_reject():
    assert cl.include_match("http://a/x", "a", [], []) is False


def test_include_url_or_domain():
    assert cl.include_match("http://a/x", "a.org", ["/x"], []) is True
    assert cl.include_match("http://a/y", "a.org", ["/x"], ["a.org"]) is True
    assert cl.include_match("http://a/y", "a.org", ["/x"], ["b.org"]) is False


# -- config parsers (S4/S5) --------------------------------------------------

def test_parse_form_instructions_stanzas():
    text = """
Label=login
UrlRegex=/p
FormActionRegex=/login
user=admin
pass=hunter%32

Label=two
UrlRegex=/q
FormActionRegex=/submit
"""
    out = parse_form_instructions(text)
    assert len(out) == 2
    assert out[0].params == (("user", "admin"), ("pass", "hunter2"))  # %32 unescaped


def test_parse_href_directions_stops_at_malformed():
    # mirrors the deliberate typo in the reference's
    # eg/direction_instructions.cfg:5-7 (refDirection vs HrefDirection)
    text = """HrefDirection=a
UrlRegex=/x
HrefRegex=(y)
refDirection=b
UrlRegex=/z
HrefRegex=(w)
"""
    out = parse_href_directions(text)
    assert [d.label for d in out] == ["a"]


def test_doc_cookies_and_required_cookie():
    from crawler_spark.crawl_logic import doc_cookies, required_cookie

    spans = [
        {"kind": "text", "text": "hi", "media_ref": None, "offset": 0},
        {"kind": "set_cookie", "text": "b", "media_ref": None, "offset": 2},
        {"kind": "set_cookie", "text": "a", "media_ref": None, "offset": 1},
        {"kind": "require_cookie", "text": "gate2", "media_ref": None, "offset": 4},
        {"kind": "require_cookie", "text": "gate1", "media_ref": None, "offset": 3},
        {"kind": "set_cookie", "text": None, "media_ref": None, "offset": 5},
    ]
    # offset order, null-text spans skipped
    assert doc_cookies(spans) == ["a", "b"]
    # first require_cookie in offset order wins
    assert required_cookie(spans) == "gate1"
    assert required_cookie(spans[:1]) is None
    assert doc_cookies([]) == []
