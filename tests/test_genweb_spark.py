"""Distributed benchweb generator: the bench input's integrity gates.

genweb_spark builds the bench corpus JVM-side as pure hash functions of
the doc index; these tests pin the properties the bench relies on:
deterministic output, schema conformance with the engine's documents
shape, and a fully resolvable link universe (every absolute target is a
real page, every relative href is same-host resolvable).
"""

from __future__ import annotations

N_DOCS, N_HOSTS, LINKS = 2000, 20, 3


def _gen(spark):
    from crawler_spark.genweb_spark import generate_spark

    return generate_spark(
        spark, n_docs=N_DOCS, n_hosts=N_HOSTS, links_per_doc=LINKS, seed=7
    )


def test_generator_deterministic_and_shaped(spark):
    from crawler_spark.schema import DOCUMENTS

    a = sorted(map(repr, _gen(spark).collect()))
    b = sorted(map(repr, _gen(spark).collect()))
    assert a == b and len(a) == N_DOCS
    df = _gen(spark)
    assert [f.name for f in df.schema.fields] == [f.name for f in DOCUMENTS.fields]
    span_t = df.schema["spans"].dataType.elementType
    assert [f.name for f in span_t.fields] == ["kind", "text", "media_ref", "offset"]


def test_generator_links_resolve_inside_universe(spark):
    import re

    rows = _gen(spark).collect()
    pages_per_host = N_DOCS // N_HOSTS
    urls = {r["doc_id"] for r in rows}
    for r in rows:
        kinds = [s["kind"] for s in r["spans"]]
        assert kinds[0] == "text" and set(kinds[1:]) == {"link"}
        host = re.match(r"http://(host\d+\.example\.org)/", r["doc_id"]).group(1)
        for s in r["spans"][1:]:
            href = s["text"]
            if href.startswith("/"):  # relative: same-host page
                target = f"http://{host}{href}"
            else:
                target = href
            assert target in urls, (r["doc_id"], href)
        assert int(re.search(r"/p(\d+)$", r["doc_id"]).group(1)) < pages_per_host
