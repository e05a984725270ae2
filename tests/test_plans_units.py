"""Unit tests for the plan building blocks: redirect closure, scalable
global rank, JVM expressions vs their pure-Python twins."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from crawler_spark import crawl_logic as cl
from crawler_spark.plans import expressions as X
from crawler_spark.plans.closure import build_redirect_closure
from crawler_spark.plans.ranking import global_rank, rank_bucket
from crawler_spark.schema import REDIRECTS


def test_closure_chain_and_abort(spark):
    # n5 → n4 → ... → n0 (terminal) plus a 2-cycle a↔b
    edges = [(f"n{k}", f"n{k-1}", 301) for k in range(1, 6)]
    edges += [("a", "b", 301), ("b", "a", 301)]
    df = spark.createDataFrame(edges, REDIRECTS)
    rows = {r["src_url"]: r for r in build_redirect_closure(df, max_redirects=3).collect()}
    assert rows["n1"]["final_url"] == "n0" and not rows["n1"]["aborted"]
    assert rows["n3"]["final_url"] == "n0" and not rows["n3"]["aborted"]
    assert list(rows["n3"]["visited"]) == ["n3", "n2", "n1", "n0"]
    assert rows["n5"]["aborted"]  # 5 hops > 3
    assert list(rows["n5"]["visited"]) == ["n5", "n4", "n3", "n2"]  # max+1 entries
    assert rows["a"]["aborted"] and rows["b"]["aborted"]  # cycles abort


def test_closure_matches_simulator_follow(spark):
    """Random functional graph: closure rows must equal the simulator's
    imperative _follow_redirects for every source."""
    rng = random.Random(4)
    nodes = [f"u{i}" for i in range(60)]
    edges = []
    for i, src in enumerate(nodes[:40]):
        edges.append((src, nodes[rng.randrange(60)], 301))
    df = spark.createDataFrame(edges, REDIRECTS)
    max_r = 7
    closure = {r["src_url"]: r for r in build_redirect_closure(df, max_redirects=max_r).collect()}

    redirect_map = {s: d for s, d, _ in edges}

    def follow(requested):
        visited = [requested]
        cur, hops = requested, 0
        while cur in redirect_map:
            hops += 1
            if hops > max_r:
                return None, visited
            cur = redirect_map[cur]
            visited.append(cur)
        return cur, visited

    for src, _, _ in edges:
        final, visited = follow(src)
        row = closure[src]
        if final is None:
            assert row["aborted"], src
            assert list(row["visited"]) == visited
        else:
            assert not row["aborted"], src
            assert row["final_url"] == final
            assert list(row["visited"]) == visited


def test_global_rank_matches_sorted_order(spark):
    rng = random.Random(9)
    rows = [(rng.randrange(5), rng.random(), i) for i in range(5000)]
    df = spark.createDataFrame(rows, "p int, x double, i long")
    ranked = global_rank(df, ["p", "x", "i"], "rk").collect()
    expected = sorted(rows)
    got = sorted(((r["rk"], (r["p"], r["x"], r["i"])) for r in ranked))
    assert [g[1] for g in got] == expected
    assert [g[0] for g in got] == list(range(1, 5001))


def test_global_cumsum_matches_python_prefix_sum(spark):
    """global_cumsum's two-level (bucketed) exclusive prefix sum must match
    a pure-Python running total across MANY buckets, with sparse/empty
    buckets, zeros, and an unordered input."""
    from crawler_spark.plans.ranking import global_cumsum

    rng = random.Random(17)
    keys = rng.sample(range(100000), 3000)  # sparse: most buckets missing
    rows = [(k, rng.randrange(0, 50)) for k in keys]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, v long").repartition(16)
    got = {
        r["k"]: r["cum"]
        for r in global_cumsum(
            df, "k", "v", "cum", bucket=F.expr("k div 1000")
        ).collect()
    }
    total = 0
    for k, v in sorted(rows):
        assert got[k] == total, k
        total += v


def test_global_rank_start_offset(spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], "v int")
    got = {r["v"]: r["rk"] for r in global_rank(df, ["v"], "rk", start=10).collect()}
    assert got == {1: 10, 2: 11, 3: 12}


def test_global_rank_bucketed_matches_range_path(spark):
    """The deterministic-bucket fast path (known key domain — the round
    plan's schedule/admission use it) must produce byte-identical ranks
    to the repartitionByRange path, including degenerate widths."""
    rng = random.Random(21)
    rows = [(rng.randrange(0, 4), s) for s in rng.sample(range(100000), 4000)]
    df = spark.createDataFrame(rows, "priority int, seq long")
    base = global_rank(df, ["priority", "seq"], "rank")
    for minor_max in (100000, 1):  # honest width and degenerate one-bucket
        b = global_rank(
            df, ["priority", "seq"], "rank",
            bucket=rank_bucket(F.col("seq"), minor_max, major=F.col("priority")),
        )
        assert base.exceptAll(b).count() == 0 and b.exceptAll(base).count() == 0
    # minor-only bucket (admission's ord_rank shape, ord_sub tiebreak)
    rows2 = [(rng.randrange(0, 500), i) for i in range(3000)]
    df2 = spark.createDataFrame(rows2, "ord_rank long, ord_sub long")
    base2 = global_rank(df2, ["ord_rank", "ord_sub"], "s", start=7)
    b2 = global_rank(
        df2, ["ord_rank", "ord_sub"], "s", start=7,
        bucket=rank_bucket(F.col("ord_rank"), 500),
    )
    assert base2.exceptAll(b2).count() == 0 and b2.exceptAll(base2).count() == 0


def test_expressions_match_pure_python(spark):
    """JVM column twins vs crawl_logic on the same inputs."""
    rng = random.Random(3)
    hosts = [f"h{i}.org" for i in range(6)]
    rows = []
    for i in range(300):
        h = hosts[rng.randrange(6)]
        path = rng.choice(["/private/p1x", "/private/z", "/pub", "/p", "/private/p1"])
        rows.append((f"http://{h}{path}", h))
    df = spark.createDataFrame(rows, "url string, host string")

    url_pats, dom_pats = ["/pub"], ["h1.org", "h3.org"]
    got = df.withColumn(
        "inc", X.include_match_col(F.col("url"), F.col("host"), url_pats, dom_pats)
    ).withColumn(
        "allowed",
        X.robots_allowed_col(
            X.url_path_col(F.col("url"), F.col("host")),
            F.array(F.lit("/private/p1")),
            F.array(F.lit("/private")),
        ),
    ).collect()
    for r in got:
        assert r["inc"] == cl.include_match(r["url"], r["host"], url_pats, dom_pats)
        assert r["allowed"] == cl.robots_allowed(r["url"], r["host"], ["/private/p1"], ["/private"])


def test_doc_size_and_budget_cols(spark):
    rows = [
        ([{"kind": "text", "text": "abc", "media_ref": None, "offset": 0},
          {"kind": "media", "text": None, "media_ref": "xy", "offset": 1}], 2.0),
        ([], None),
    ]
    from crawler_spark.schema import SPAN
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    schema = StructType([StructField("spans", ArrayType(SPAN)), StructField("d", DoubleType())])
    df = spark.createDataFrame(rows, schema)
    got = df.select(
        X.doc_size_col(F.col("spans")).alias("sz"),
        X.host_budget_col(10, F.col("d")).alias("b"),
    ).collect()
    assert got[0]["sz"] == 5 and got[0]["b"] == cl.host_budget(10, 2.0) == 5
    assert got[1]["sz"] == 0 and got[1]["b"] == cl.host_budget(10, None) == 10


def test_doc_index_encode_decode_roundtrip(spark, tmp_path):
    """The bucketed index's string-encoded links decode back to exactly
    extract._resolved_links' array<struct> shape, and the bucket lookup
    returns each probed final once (per-partition dedup) — the fetch
    hop's left join must never fan out."""
    from crawler_spark.plans.doc_index import (
        LOOKUP_SCHEMA,
        bucket_col,
        build_doc_index,
        decode_links_col,
        make_bucket_lookup,
        write_bucketed_index,
    )
    from crawler_spark.plans.extract import _resolved_links

    rows = []
    for i in range(40):
        host = f"h{i % 7}.example.org"
        spans = [
            ("link", f"/p{j}", None, j * 10) for j in range(i % 4)
        ] + [("text", "words", None, 1), ("media", f"http://{host}/m{i}", None, 99)]
        rows.append((f"http://{host}/d{i}", [
            {"kind": k, "text": t, "media_ref": m, "offset": o} for k, t, m, o in spans
        ]))
    docs = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    # decode(encode(links)) == _resolved_links for every non-routed doc
    enc = build_doc_index(docs)
    dec = enc.where(~F.col("route")).select(
        "final",
        decode_links_col(F.col("links_urls"), F.col("links_hosts")).alias("links"),
    )
    ref = docs.select(
        F.col("doc_id").alias("final"), _resolved_links(F.col("doc_id")).alias("links")
    ).join(dec.select("final"), "final", "left_semi")
    got = {r["final"]: r["links"] for r in dec.collect()}
    want = {r["final"]: r["links"] for r in ref.collect()}
    assert got == want and got

    # bucket lookup: duplicate probes (within and across rows) emit one
    # row per final, misses emit nothing
    path = str(tmp_path / "idx")
    write_bucketed_index(docs, path)
    probes = [(r,) for r in list(got) * 3] + [("http://h0.example.org/missing",)]
    keys = spark.createDataFrame(probes, "final string").select(
        bucket_col(F.col("final")).alias("_bkt"), "final"
    )
    out = keys.repartition(8, "_bkt").mapInPandas(
        make_bucket_lookup(path), LOOKUP_SCHEMA
    ).collect()
    finals = [r["final"] for r in out]
    assert sorted(finals) == sorted(set(finals)) == sorted(got)
