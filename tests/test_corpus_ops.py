"""Corpus-analytics op tests: properties and brute-force parity checks the
DuckDB value-hash gate can't express (or that pin the semantics against an
independent pure-Python reference rather than a second SQL engine)."""

from __future__ import annotations

import hashlib
import re

import duckdb

SF = "/root/testdata/sf0.001"


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def _tokens(text):
    return [t for t in re.split(r"\s+", text) if t]


def _shingles(text):
    toks = _tokens(text)
    out, seen = [], set()
    for i in range(max(len(toks) - 2, 0)):
        s = " ".join(toks[i : i + 3])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _nibble(doc_id):
    return hashlib.md5(str(doc_id).encode()).hexdigest()[31]


def test_pagerank_matches_pure_python_integer_reference(spark):
    """Bit-exact parity with an independent single-threaded integer
    PageRank — proves the distributed plan's join/agg ordering can never
    change the result (all-long arithmetic), not just that two SQL
    engines agree."""
    from crawler_spark.queries.corpus_ops import PAGERANK_ITERS, _PR_TOTAL, q_pagerank

    ids = [r[0] for r in _docs()]
    id_set = set(ids)
    m = max(ids) + 1
    n = len(ids)
    edges = {}
    for v in ids:
        tgts = [(v * 31 + j) % m for j in range(1, 2 + v % 3)]
        tgts = [t for t in tgts if t in id_set]
        if tgts:
            edges[v] = tgts
    t = (15 * _PR_TOTAL) // (100 * n)
    rank = {v: _PR_TOTAL // n for v in ids}
    for _ in range(PAGERANK_ITERS):
        inflow = {v: 0 for v in ids}
        for src, tgts in edges.items():
            c = (rank[src] * 85) // (100 * len(tgts))
            for dst in tgts:
                inflow[dst] += c
        rank = {v: t + inflow[v] for v in ids}

    got = {r["doc_id"]: r["rank_ppt"] for r in q_pagerank(spark, SF).collect()}
    assert got == rank


def test_tfidf_topk_shape_and_planted_rare_term(spark):
    """rk is dense 1..k with scores non-increasing per doc, and a planted
    corpus ranks a document's unique rare term first."""
    from pyspark.sql import functions as F  # noqa: F401
    import pandas as pd

    from crawler_spark.queries.corpus_ops import TFIDF_TOPK, q_tfidf_topterms

    rows = q_tfidf_topterms(spark, SF).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in per_doc.values():
        rks = [r["rk"] for r in sorted(doc_rows, key=lambda r: r["rk"])]
        assert rks == list(range(1, len(rks) + 1))
        assert len(rks) <= TFIDF_TOPK
        scores = [r["score_ppm"] for r in sorted(doc_rows, key=lambda r: r["rk"])]
        assert scores == sorted(scores, reverse=True)

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pdf = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "common words everywhere zyzzyva zyzzyva zyzzyva",
                    "common words everywhere again and again",
                    "common words everywhere more common words",
                ],
                "lang": ["en"] * 3,
                "source": ["s"] * 3,
                "n_chars": [10, 10, 10],
            }
        )
        spark.createDataFrame(pdf).write.parquet(os.path.join(d, "documents.parquet"))
        top = q_tfidf_topterms(spark, d).collect()
        doc0 = sorted((r for r in top if r["doc_id"] == 0), key=lambda r: r["rk"])
        assert doc0[0]["term"] == "zyzzyva"  # unique rare term wins
        assert doc0[0]["df"] == 1


def test_decontaminate_matches_pure_python_sets(spark):
    """Exact parity with a pure-Python shingle-overlap computation over
    the same md5-nibble split."""
    from crawler_spark.queries.corpus_ops import q_decontaminate

    bench = set()
    train = {}
    for doc_id, text in _docs():
        nib = _nibble(doc_id)
        sh = _shingles(text)
        if nib in "ef":
            bench.update(sh)
        elif nib in "0123456789ab":
            train[doc_id] = sh
    expect = {}
    for doc_id, sh in train.items():
        hits = sum(1 for s in sh if s in bench)
        if hits:
            expect[doc_id] = hits

    got = {
        r["doc_id"]: r["n_shared_shingles"]
        for r in q_decontaminate(spark, SF).collect()
    }
    assert got == expect
    assert got  # fixture corpus must actually exercise the overlap path


def test_snapshot_delta_closed_form(spark):
    """Every id's status follows the closed-form snapshot derivation."""
    from crawler_spark.queries.corpus_ops import q_snapshot_delta

    ids = {r[0] for r in _docs()}
    got = {r["doc_id"]: r["status"] for r in q_snapshot_delta(spark, SF).collect()}
    expect = {}
    for doc_id in ids:
        if doc_id % 7 == 0:
            expect[doc_id] = "added"  # absent from prev snapshot
        elif doc_id % 5 == 0:
            expect[doc_id] = "changed"  # prev content hash differs
        else:
            expect[doc_id] = "unchanged"
        if doc_id % 11 == 0:
            expect[doc_id + 1000000] = "removed"  # shadow id gone from cur
    assert got == expect
