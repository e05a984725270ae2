"""Row-level parity between the JVM fast path (plans/extract.py) and the
Python decide loop (plans/parse.make_decide) — the fast path's contract
is value-identity on every row it claims (SURVEY.md H1-H2, F1, U5-U7).

The trace suite proves the same thing end-to-end; this test isolates the
split itself: generate fetch-join rows mixing fast-language hrefs with
every routing trigger, assert (a) the route predicate sends exactly the
rows the fast path can't prove, and (b) on the plain rows both paths
emit byte-identical decision rows.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark.config import CrawlConfig
from crawler_spark.plans.extract import plain_decisions, route_python_col
from crawler_spark.plans.parse import DECISION_SCHEMA, make_decide

FETCH_SCHEMA = (
    "rank bigint, scheduled_url string, current_url string, hops int, "
    "chain_cookies array<string>, final string, visited array<string>, "
    "aborted boolean, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "too_big boolean"
)


def sp(kind, text=None, media_ref=None, offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def row(rank, url, spans, final=None, visited=None, aborted=False, too_big=False,
        hops=0, chain_cookies=()):
    final = final or url
    return {
        "rank": rank, "scheduled_url": url, "current_url": url, "hops": hops,
        "chain_cookies": list(chain_cookies), "final": final,
        "visited": visited or [url], "aborted": aborted, "spans": spans,
        "too_big": too_big,
    }


# rows the fast path must claim (route = False): fast-language hrefs only
PLAIN_ROWS = [
    # ordinary page: relative + absolute links, media ref, offset shuffle
    row(1, "http://a.example.org/p1", [
        sp("text", "hello", offset=0),
        sp("link", "/p2", offset=3),
        sp("link", "http://b.example.org/x", offset=1),
        sp("media", media_ref="http://a.example.org/img-1.bin", offset=2),
        sp("link", "/", offset=3),  # offset tie → original order breaks it
    ]),
    # no links at all
    row(2, "http://a.example.org/empty", [sp("text", "just text", offset=0)]),
    # store_drop: include filter fails on the final URL
    row(3, "http://other.example.net/q", [sp("link", "/next", offset=0)]),
    # link span with null text + media span with null ref are skipped
    row(4, "http://a.example.org/nulls", [
        sp("link", None, offset=0),
        sp("media", media_ref=None, offset=1),
        sp("link", "/ok", offset=2),
    ]),
    # redirect chain: final differs from scheduled, visited multi-entry
    row(5, "http://a.example.org/r0", [sp("link", "/p9", offset=0)],
        final="http://a.example.org/r2",
        visited=["http://a.example.org/r0", "http://a.example.org/r1",
                 "http://a.example.org/r2"]),
    # chain cookies ride through untouched (set on an earlier hop)
    row(6, "http://a.example.org/after-login", [sp("link", "/members2", offset=0)],
        hops=2, chain_cookies=["sess=1"]),
]

# rows that must route to Python, one trigger each
ROUTED_ROWS = [
    row(10, "http://a.example.org/f1", None, aborted=True),          # redirect abort
    row(11, "http://a.example.org/f2", None),                        # missing doc
    row(12, "http://a.example.org/f3", [sp("text", "x")], too_big=True),
    row(13, "http://a.example.org/f4", [sp("set_cookie", "c=1")]),   # cookie setter
    row(14, "http://a.example.org/f5", [sp("require_cookie", "c=1")]),
    row(15, "http://a.example.org/f6", [sp("meta_refresh", "/next")]),
    row(16, "http://a.example.org/f7", [sp("form", '{"method":"GET","action":"/s","inputs":[]}')]),
    row(17, "http://a.example.org/f8", [sp("link", "mailto:x@y.z")]),  # slow href
    row(18, "http://a.example.org/f9", [sp("link", "/has space")]),
    row(19, "http://a.example.org/fA", [sp("link", "../rel")]),
    row(20, "http://a.example.org/fB", [sp("link", "/dot/./seg")]),
    row(21, "http://a.example.org/fC", [sp("link", "/q?x=1")]),        # query char
    row(22, "http://A.example.org/fD", [sp("link", "/x")]),            # base not canonical
    row(23, "http://a.example.org:8080/fE", [sp("link", "/x")]),       # base has port
    row(24, "http://a.example.org/fF", [sp("link", " /padded ")]),     # needs trim
]

CFG = CrawlConfig(
    url_include_patterns=("example.org",),
    domain_include_patterns=(),
    vectorized_extract=True,
)


def _fetched(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows), FETCH_SCHEMA)


def _canon(df):
    pdf = df.toPandas()
    recs = []
    for r in pdf.sort_values("rank").itertuples(index=False):
        d = r._asdict()
        for k, v in list(d.items()):
            if isinstance(v, (list, tuple)) or v.__class__.__name__ == "ndarray":
                d[k] = tuple(
                    tuple(sorted(e.asDict().items())) if hasattr(e, "asDict") else e
                    for e in v
                )
        recs.append(tuple(sorted(d.items(), key=lambda kv: kv[0])))
    return recs


def test_route_predicate(spark):
    fetched = _fetched(spark, PLAIN_ROWS + ROUTED_ROWS)
    routed = {
        r["rank"]
        for r in fetched.where(route_python_col([])).select("rank").collect()
    }
    assert routed == {r["rank"] for r in ROUTED_ROWS}


def test_route_all_python_when_directions_exist(spark):
    from crawler_spark.config import HrefDirection

    fetched = _fetched(spark, PLAIN_ROWS)
    route = route_python_col([HrefDirection(label="l", url_regex="nomatch", href_regex="x")])
    assert fetched.where(route).count() == len(PLAIN_ROWS)


@pytest.mark.parametrize("rows", [PLAIN_ROWS], ids=["plain"])
def test_plain_rows_value_identical_to_python_decide(spark, rows):
    fetched = _fetched(spark, rows)
    decide = make_decide(CFG, [], [], None, frozenset())
    via_python = fetched.mapInPandas(decide, DECISION_SCHEMA)
    via_jvm = plain_decisions(fetched, CFG).to(via_python.schema)
    assert _canon(via_jvm) == _canon(via_python)


def test_split_union_covers_every_row_once(spark):
    fetched = _fetched(spark, PLAIN_ROWS + ROUTED_ROWS)
    route = route_python_col([])
    n_py = fetched.where(route).count()
    n_plain = fetched.where(~route).count()
    assert n_py + n_plain == len(PLAIN_ROWS) + len(ROUTED_ROWS)
