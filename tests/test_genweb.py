"""Generator determinism + shape invariants (FIXTURES.md contract)."""

from __future__ import annotations

from crawler_spark.genweb import generate


def test_deterministic_same_seed():
    a = generate(n_docs=80, n_hosts=8, seed=5)
    b = generate(n_docs=80, n_hosts=8, seed=5)
    assert a["documents"].equals(b["documents"])
    assert a["redirects"].equals(b["redirects"])
    assert a["seeds"].equals(b["seeds"])


def test_different_seed_differs():
    a = generate(n_docs=80, n_hosts=8, seed=5)
    b = generate(n_docs=80, n_hosts=8, seed=6)
    assert not a["documents"].equals(b["documents"])


def test_shapes_and_invariants():
    web = generate(n_docs=100, n_hosts=10, seed=1)
    docs = web["documents"]
    assert docs["doc_id"].is_unique
    # span offsets strictly ordered per doc; every span kind is known
    kinds = {"text", "link", "media", "form", "meta_refresh", "set_cookie", "require_cookie"}
    for rec in docs.to_dict("records"):
        offs = [s["offset"] for s in rec["spans"]]
        assert offs == sorted(offs) == list(range(len(offs)))
        assert all(s["kind"] in kinds for s in rec["spans"])
    # redirects functional: one outgoing edge per src
    red = web["redirects"]
    assert red["src_url"].is_unique
    # the >20-hop abort chain exists (src/Settings.hs:17-18 fixture)
    assert (red["src_url"].str.contains("rlong")).sum() >= 21
    # seeds reference real documents
    doc_ids = set(docs["doc_id"])
    assert set(web["seeds"]["url"][:-1]).issubset(doc_ids)
