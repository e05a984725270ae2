"""Link-graph op tests: pure-Python reference parity for the pieces the
DuckDB value-hash gate shares arithmetic with (window lags, integer
ratios), plus cap/shape invariants the gate can't express."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import duckdb

SF = "/root/testdata/sf0.001"


def _orders():
    return duckdb.sql(
        f"SELECT o_orderkey, o_custkey FROM '{SF}/orders.parquet' ORDER BY o_orderkey"
    ).fetchall()


def test_politeness_audit_matches_pure_python_gap_scan(spark):
    """Per-host gap audit == a single-threaded scan over the same virtual
    fetch log — pins the lag-window semantics (first fetch has no gap,
    ties produce gap 0) independently of both SQL engines."""
    from crawler_spark.queries.linkgraph_ops import q_politeness_audit

    logs = defaultdict(list)
    delays = {}
    for okey, ckey in _orders():
        hid = ckey % 13
        host = f"h{hid}.example.org"
        logs[host].append((okey * 37) % 60000 + hid * 7)
        delays[host] = 100 + (hid % 5) * 50
    expect = {}
    for host, ts in logs.items():
        ts.sort()
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        expect[host] = (
            delays[host],
            len(ts),
            sum(1 for g in gaps if g < delays[host]),
            min(gaps) if gaps else None,
        )

    rows = q_politeness_audit(spark, SF).collect()
    got = {r["host"]: (r["crawl_delay_ms"], r["n_fetches"], r["n_violations"],
                       r["min_gap_ms"]) for r in rows}
    assert got == expect


def test_crawl_traps_matches_pure_python_ratio_scan(spark):
    """Integer growth-ratio flagging == brute-force dict arithmetic."""
    from crawler_spark.queries.linkgraph_ops import TRAP_RATIO_PCT, q_crawl_traps

    counts = Counter()
    for okey, ckey in _orders():
        counts[(f"h{ckey % 19}.example.org", okey % 6 + ckey % 3)] += 1
    per_host = defaultdict(dict)
    for (host, depth), n in counts.items():
        per_host[host][depth] = n
    expect = {}
    for host, by_depth in per_host.items():
        worst, first = None, None
        for d in sorted(by_depth):
            if d - 1 in by_depth:
                r = (100 * by_depth[d]) // by_depth[d - 1]
                worst = r if worst is None else max(worst, r)
                if r >= TRAP_RATIO_PCT and first is None:
                    first = d
        if worst is not None and worst >= TRAP_RATIO_PCT:
            expect[host] = (worst, first)

    rows = q_crawl_traps(spark, SF).collect()
    got = {r["host"]: (r["worst_ratio_pct"], r["first_trap_depth"]) for r in rows}
    assert got == expect


def test_inverted_index_caps_and_orders_postings(spark):
    """Every posting list is sorted, duplicate-free, and ≤ INDEX_MAX_DF
    long with df == len(postings) — the bounded-row contract that makes
    the index safe to build at corpus scale."""
    from crawler_spark.queries.linkgraph_ops import INDEX_MAX_DF, q_inverted_index

    rows = q_inverted_index(spark, SF).collect()
    assert rows, "index must keep some terms"
    for r in rows:
        # postings is a comma-joined string (driver hasher needs scalar
        # output columns); split it back for the invariant checks
        p = [int(x) for x in r["postings"].split(",")]
        assert r["df"] == len(p) <= INDEX_MAX_DF
        assert p == sorted(set(p))

    # and the cap genuinely drops something: the raw bigram term count
    # exceeds the kept term count
    docs = duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'"
    ).fetchall()
    raw_terms = set()
    for (text,) in docs:
        toks = [t for t in re.split(r"\s+", text) if t]
        raw_terms.update(
            f"{a} {b}".lower() for a, b in zip(toks, toks[1:])
        )
    assert len(rows) < len(raw_terms)


def test_anchor_text_top_anchor_ties_break_lexicographically(spark):
    """Top-anchor choice == brute-force Counter with (count desc, anchor
    asc) ordering, over the same deterministic link universe."""
    from crawler_spark.queries.linkgraph_ops import _ANCHORS, q_anchor_text

    li = duckdb.sql(
        f"SELECT l_orderkey, l_linenumber, l_suppkey, l_partkey "
        f"FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    hist = defaultdict(Counter)
    hosts = defaultdict(set)
    for okey, lnum, skey, pkey in li:
        dst = f"http://h{pkey % 29}.example.org/p{pkey}"
        hist[dst][_ANCHORS[(okey + lnum) % len(_ANCHORS)]] += 1
        hosts[dst].add(f"h{skey % 23}.example.org")
    expect = {}
    for dst, c in hist.items():
        top = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        expect[dst] = (sum(c.values()), len(hosts[dst]), top[0], top[1])

    rows = q_anchor_text(spark, SF).collect()
    got = {r["dst"]: (r["n_links"], r["n_src_hosts"], r["top_anchor"],
                      r["top_anchor_count"]) for r in rows}
    assert got == expect


def test_distinct_sketch_estimator_properties(spark):
    """KMV semantics: hosts under K distinct hashes report exactly; hosts
    over K estimate within KMV's expected error envelope (~1/sqrt(K));
    and the sketch is MERGEABLE — min-K of a union equals min-K over the
    parts' min-Ks (the property that makes it a distributed sketch)."""
    import hashlib
    import random

    from crawler_spark.queries.linkgraph_ops import _KMV_K, q_distinct_sketch

    rows = q_distinct_sketch(spark, "/root/testdata/sf0.001").collect()
    assert rows
    saw_big = False
    for r in rows:
        if r["k_eff"] < _KMV_K:
            assert r["est"] == r["n_exact"] == r["k_eff"]
        else:
            saw_big = True
            assert abs(r["est"] - r["n_exact"]) <= 0.5 * r["n_exact"], (
                r["host"], r["est"], r["n_exact"])
    assert saw_big, "no host exceeded K distinct URLs — estimator untested"

    # mergeability, pure python: union-of-parts min-K == min-K of whole
    rng = random.Random(5)
    vals = [int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
            for i in range(5000)]
    rng.shuffle(vals)
    parts = [vals[:2000], vals[2000:]]
    part_minks = [sorted(set(p))[:_KMV_K] for p in parts]
    merged_mink = sorted(set(part_minks[0]) | set(part_minks[1]))[:_KMV_K]
    whole_mink = sorted(set(vals))[:_KMV_K]
    assert merged_mink == whole_mink


def test_bm25_topk_matches_pure_python_float_ranking(spark):
    """The integer fixed-point BM25 must produce the same top-k ORDER a
    pure-Python float BM25 (same rational idf) produces — fixed-point is
    for cross-engine bit-exactness, not a different ranking. Allows only
    adjacent swaps where the float scores are within fixed-point
    resolution."""
    from crawler_spark.queries.linkgraph_ops import (
        BM25_B_MILLI,
        BM25_K1_MILLI,
        BM25_QUERY_TERMS,
        BM25_TOP_K,
        q_bm25_topk,
    )

    rows = q_bm25_topk(spark, SF).collect()
    assert len(rows) == BM25_TOP_K
    scores = [r["score_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] > 0

    docs = duckdb.sql(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    toks = {d: [t for t in re.split(r"\s+", txt) if t] for d, txt in docs}
    n = len(toks)
    total_dl = sum(len(v) for v in toks.values())
    avgdl = total_dl / n
    k1, b = BM25_K1_MILLI / 1000, BM25_B_MILLI / 1000
    df = {
        term: sum(1 for v in toks.values() if term in (t.lower() for t in v))
        for term in BM25_QUERY_TERMS
    }

    def score(d):
        dl = len(toks[d])
        s = 0.0
        for term in BM25_QUERY_TERMS:
            tf = sum(1 for t in toks[d] if t.lower() == term)
            idf = (n - df[term] + 1) / (df[term] + 1)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        return s

    ref = sorted(toks, key=lambda d: (-score(d), d))[:BM25_TOP_K]
    got = [r["doc_id"] for r in rows]
    # identical membership; order may differ only where float scores tie
    # within fixed-point resolution (~1e-3 of the idf*tf unit)
    assert set(got) == set(ref)
    for a, g in zip(ref, got):
        if a != g:
            assert abs(score(a) - score(g)) < 0.05
