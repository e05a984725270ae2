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


def test_hits_matches_pure_python_integer_reference(spark):
    """Bit-exact parity with a single-threaded integer HITS — same
    guarantee as the pagerank test: normalize-by-max in exact ppm
    integers means shuffle order can never move a score."""
    from crawler_spark.queries.corpus_ops import HITS_ITERS, _HITS_SCALE, q_hits

    ids = [r[0] for r in _docs()]
    id_set = set(ids)
    m = max(ids) + 1
    edges = []
    for v in ids:
        for j in range(1, 2 + v % 3):
            t = (v * 31 + j) % m
            if t in id_set:
                edges.append((v, t))

    hub = {v: _HITS_SCALE for v in ids}
    auth = {}
    for _ in range(HITS_ITERS):
        auth = {}
        for s, d in edges:
            if s in hub:
                auth[d] = auth.get(d, 0) + hub[s]
        amax = max(auth.values())
        auth = {k: (v * _HITS_SCALE) // amax for k, v in auth.items()}
        hub = {}
        for s, d in edges:
            if d in auth:
                hub[s] = hub.get(s, 0) + auth[d]
        hmax = max(hub.values())
        hub = {k: (v * _HITS_SCALE) // hmax for k, v in hub.items()}

    expected = [(v, hub.get(v, 0), auth.get(v, 0)) for v in sorted(ids)]
    got = [tuple(r) for r in q_hits(spark, SF).collect()]
    assert got == expected
    # non-degenerate: scores actually spread, max is hit exactly
    assert len({h for _, h, _ in expected}) > 3
    assert max(h for _, h, _ in expected) == _HITS_SCALE


def test_passage_dedup_matches_pure_python(spark):
    """Counts AND the rebuilt kept-text hash against a single-threaded
    reference; also proves the corpus actually exercises the drop path."""
    from crawler_spark.queries.corpus_ops import (
        PASSAGE_MAX_DF,
        PASSAGE_W,
        q_passage_dedup,
    )

    per_doc = {}
    for doc_id, text in _docs():
        toks = _tokens(text)
        if not toks:
            continue
        per_doc[doc_id] = [
            " ".join(toks[i : i + PASSAGE_W]) for i in range(0, len(toks), PASSAGE_W)
        ]
    df = {}
    for doc_id, ps in per_doc.items():
        for p in set(ps):
            df[p] = df.get(p, 0) + 1

    expected = []
    for doc_id in sorted(per_doc):
        ps = per_doc[doc_id]
        kept = [p for p in ps if df[p] <= PASSAGE_MAX_DF]
        expected.append(
            (
                doc_id,
                len(ps),
                len(ps) - len(kept),
                hashlib.md5(" ".join(kept).encode()).hexdigest(),
            )
        )
    got = [tuple(r) for r in q_passage_dedup(spark, SF).collect()]
    assert got == expected
    assert sum(r[2] for r in expected) > 0  # drop path exercised
    assert any(r[2] == 0 for r in expected)  # keep-everything path too


def test_top_ngrams_matches_pure_python_counter(spark):
    from collections import Counter

    from crawler_spark.queries.corpus_ops import TOP_NGRAMS_K, q_top_ngrams

    cnt = Counter()
    for _, text in _docs():
        toks = _tokens(text)
        for i in range(len(toks) - 1):
            cnt[f"{toks[i]} {toks[i + 1]}".lower()] += 1
    expected = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_NGRAMS_K]
    got = [tuple(r) for r in q_top_ngrams(spark, SF).collect()]
    assert got == expected


def test_embedding_centroids_exact_integer_sums(spark):
    """Fixed-point parity with numpy-free pure Python over the raw
    parquet floats — the sum must be exact (order-independent), and the
    truncating div must match."""
    import math

    from crawler_spark.queries.pipeline_ops import (
        _CENTROID_SCALE,
        q_embedding_centroids,
    )

    rows = duckdb.sql(
        f"SELECT label, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    acc = {}
    for label, emb in rows:
        for dim, v in enumerate(emb):
            n, s = acc.get((label, dim), (0, 0))
            acc[(label, dim)] = (n + 1, s + math.floor(float(v) * _CENTROID_SCALE))
    expected = []
    for (label, dim), (n, s) in sorted(acc.items()):
        q = abs(s) // n
        expected.append((label, dim, n, s, q if s >= 0 else -q))
    got = [tuple(r) for r in q_embedding_centroids(spark, SF).collect()]
    assert got == expected


def test_recrawl_schedule_matches_pure_python_hash_diff(spark):
    """Recompute the epoch hashes with hashlib and diff — pins both the
    transition-count semantics (a revert IS a change) and the backoff."""
    from crawler_spark.queries.corpus_ops import RECRAWL_EPOCHS, q_recrawl_schedule

    expected = []
    for doc_id, text in _docs():
        hs = [hashlib.md5(text.encode()).hexdigest()]
        for e in range(1, RECRAWL_EPOCHS + 1):
            body = text + f" [epoch{e}]" if doc_id % (e + 2) == 0 else text
            hs.append(hashlib.md5(body.encode()).hexdigest())
        n_changes = sum(1 for i in range(RECRAWL_EPOCHS) if hs[i] != hs[i + 1])
        expected.append((doc_id, n_changes, 1 << (RECRAWL_EPOCHS - n_changes)))
    got = [tuple(r) for r in q_recrawl_schedule(spark, SF).collect()]
    assert got == expected
    assert {r[1] for r in expected} != {0}  # changes actually occur


def test_reciprocal_links_matches_pure_python(spark):
    from crawler_spark.queries.corpus_ops import q_reciprocal_links

    ids = [r[0] for r in _docs()]
    id_set = set(ids)
    m = max(ids) + 1
    edges = set()
    for v in ids:
        for j in range(1, 2 + v % 3):
            t = (v * 31 + j) % m
            if t in id_set:
                edges.add((v, t))
    planted = {(d, s) for (s, d) in edges if s % 9 == 0}
    all_edges = edges | planted
    expected = sorted(
        (a, b) for (a, b) in all_edges if a < b and (b, a) in all_edges
    )
    got = [tuple(r) for r in q_reciprocal_links(spark, SF).collect()]
    assert got == expected
    assert len(expected) > 0


def test_dedup_keep_best_picks_max_quality_member(spark):
    """The kept doc must be the (n_words desc, doc_id asc) argmax of its
    component, with the member count right — checked against the
    components query plus raw token counts."""
    from crawler_spark.queries.pipeline_ops import (
        q_dedup_components,
        q_dedup_keep_best,
    )

    comp = {
        r.node: r.component for r in q_dedup_components(spark, SF).collect()
    }
    n_words = {doc_id: len(_tokens(text)) for doc_id, text in _docs()}
    by_comp = {}
    for node, c in comp.items():
        by_comp.setdefault(c, []).append(node)
    expected = sorted(
        (
            c,
            min(members, key=lambda n: (-n_words[n], n)),
            n_words[min(members, key=lambda n: (-n_words[n], n))],
            len(members),
        )
        for c, members in by_comp.items()
    )
    got = [tuple(r) for r in q_dedup_keep_best(spark, SF).collect()]
    assert got == expected


def test_winnowing_guarantee_on_planted_duplicate_run(spark):
    """The winnowing property substring_dup_spans relies on: two documents
    sharing a run of >= W + S - 1 chars ALWAYS share a selected
    fingerprint gram, at ANY alignment of the run inside either document
    (the failure mode of positional stride sampling). Pure-Python
    winnowing replica + the Spark op over planted docs."""
    import pandas as pd

    from crawler_spark.queries.corpus_ops import _SUB_S, _SUB_W, q_substring_dup_spans

    run = "The quick brown fox jumps over the lazy dog near the riverbank"  # 63 chars
    assert len(run) >= _SUB_W + _SUB_S - 1
    docs = []
    # embed the SAME run at deliberately different offsets (all 8
    # alignment classes) inside otherwise-unique filler
    for i in range(8):
        filler = f"unique filler {i} " * 3
        docs.append((i, filler[: 30 + i] + run + f" tail {i} tail tail"))
    docs.append((100, "a completely unrelated document with no repeats at all here"))

    def winnow(text):
        n = len(text) - _SUB_W
        keys = [
            hashlib.md5(text[k : k + _SUB_W].encode()).hexdigest()[:15] + "-" + str(k).zfill(10)
            for k in range(n + 1)
        ]
        sel = {min(keys[w : w + _SUB_S]) for w in range(n - _SUB_S + 2)}
        return {text[int(k[16:]) : int(k[16:]) + _SUB_W] for k in sel}

    # pure-python guarantee check: every pair of run-carrying docs shares
    # a fingerprint gram
    fps = {i: winnow(t) for i, t in docs}
    for i in range(8):
        for j in range(i + 1, 8):
            assert fps[i] & fps[j], f"docs {i},{j} share no fingerprint"

    # the Spark op agrees: some reported dup gram is a substring of the run,
    # covering every doc pair through the gram table
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        pdf = pd.DataFrame(
            {"doc_id": [d for d, _ in docs], "text": [t for _, t in docs],
             "lang": "en", "source": "s", "n_chars": [len(t) for _, t in docs]}
        )
        pdf.to_parquet(os.path.join(td, "documents.parquet"))
        out = q_substring_dup_spans(spark, td).collect()
    assert out, "planted duplicates produced no dup grams"
    assert all(r["n_docs"] >= 2 for r in out)
    assert any(r["gram"] in run for r in out)
    # the unrelated doc never appears: total distinct docs across grams <= 8
    assert max(r["n_docs"] for r in out) <= 8


def test_caption_pairs_nearest_and_tie_semantics(spark):
    """Caption assignment vs a brute-force replica over the synthesized
    spans: nearest text span by offset, tie -> preceding, no-text -> NULL
    caption with offset -1. Also pins that odd doc_ids exercise the
    media-first (no preceding text) branch."""
    from crawler_spark.queries.crawl_ops import q_caption_pairs

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id LIMIT 400"
    ).fetchall()
    expect = {}
    saw_media_first = False
    for doc_id, text in rows:
        spans = []
        for i in range(doc_id % 5 + 1):
            if (i + doc_id) % 2 == 0:
                spans.append(("text", text[i * 7 : i * 7 + 7], None, i))
            else:
                spans.append(("media", None, f"/m{doc_id}_{i}", i))
        texts = [(off, t) for k, t, _, off in spans if k == "text"]
        for k, _, ref, off in spans:
            if k != "media":
                continue
            if off == 0:
                saw_media_first = True
            prev = [(o, t) for o, t in texts if o < off]
            nxt = [(o, t) for o, t in texts if o > off]
            if prev and (not nxt or off - prev[-1][0] <= nxt[0][0] - off):
                expect[(doc_id, ref)] = (prev[-1][1], prev[-1][0])
            elif nxt:
                expect[(doc_id, ref)] = (nxt[0][1], nxt[0][0])
            else:
                expect[(doc_id, ref)] = (None, -1)
    assert saw_media_first
    got = {
        (r["doc_id"], r["media_ref"]): (r["caption"], r["caption_offset"])
        for r in q_caption_pairs(spark, SF).collect()
        if r["doc_id"] in {d for d, _ in rows}
    }
    assert got == expect


def test_span_packing_continuity(spark):
    """Packing invariants over the interleaved-span layout: offsets are a
    gapless exact prefix sum of costs in doc_id order (media spans at
    the fixed 64-token budget), pack_offset < pack length, and
    n_spanned_packs covers exactly the cost interval."""
    from crawler_spark.queries.crawl_ops import (
        _SPAN_MEDIA_COST,
        _SPAN_PACK_LEN,
        q_span_packing,
    )

    rows = q_span_packing(spark, SF).orderBy("doc_id").collect()
    assert rows
    cum = 0
    for r in rows:
        assert r["pack_id"] * _SPAN_PACK_LEN + r["pack_offset"] == cum
        assert 0 <= r["pack_offset"] < _SPAN_PACK_LEN
        if r["doc_cost"]:
            last = cum + r["doc_cost"] - 1
            assert r["n_spanned_packs"] == last // _SPAN_PACK_LEN - cum // _SPAN_PACK_LEN + 1
        assert r["doc_cost"] >= r["n_media"] * _SPAN_MEDIA_COST
        cum += r["doc_cost"]


def test_intradoc_repetition_matches_brute_force_counter(spark):
    """repeat_ppm == brute-force Counter over each doc's trigrams (every
    occurrence after the first is a repeat), including the planted
    boilerplate-free and repetition-heavy extremes."""
    import re
    from collections import Counter

    import duckdb

    from crawler_spark.queries.corpus_ops import _REP_W, q_intradoc_repetition

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    expect = {}
    for doc_id, text in docs:
        toks = [t for t in re.split(r"\s+", text) if t]
        if len(toks) < _REP_W:
            continue
        grams = Counter(
            " ".join(toks[i:i + _REP_W]).lower()
            for i in range(len(toks) - _REP_W + 1)
        )
        n = sum(grams.values())
        rep = sum(c - 1 for c in grams.values())
        expect[doc_id] = (n, rep, (1_000_000 * rep) // n)

    rows = q_intradoc_repetition(spark, SF).collect()
    got = {r["doc_id"]: (r["n_grams"], r["n_repeats"], r["repeat_ppm"]) for r in rows}
    assert got == expect
    assert any(v[1] > 0 for v in expect.values()), "no repetition in fixture"
