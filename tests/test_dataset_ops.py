"""Dataset-op tests: pure-Python reference parity for semantics the
DuckDB value-hash gate shares arithmetic with (as-of carry-forward,
integer ppm ratios, md5-threshold sampling), plus the invariants the
gate can't express (append-stability, quantile element-membership)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import duckdb

SF = "/root/testdata/sf0.001"


def _events():
    return duckdb.sql(
        f"SELECT event_id, user_id, ts, event_type FROM '{SF}/events.parquet'"
        " ORDER BY event_id"
    ).fetchall()


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, source, lang, text FROM '{SF}/documents.parquet'"
        " ORDER BY doc_id"
    ).fetchall()


def test_asof_join_matches_pure_python_carry_scan(spark):
    """Spark's union-tag + last(ignorenulls) window == a single-threaded
    per-user carry scan: every probe gets the max-id snapshot at-or-before
    its ts (inclusive ties -> snapshot wins)."""
    from crawler_spark.queries.dataset_ops import q_asof_join

    snaps = defaultdict(dict)  # user -> ts -> max snap_id
    probes = []
    for eid, uid, ts, etype in _events():
        if etype == "error":
            cur = snaps[uid].get(ts)
            snaps[uid][ts] = eid if cur is None else max(cur, eid)
        else:
            probes.append((eid, uid, ts))
    expect = {}
    for eid, uid, ts in probes:
        best = None
        for sts, sid in snaps[uid].items():
            if sts <= ts and (best is None or sts > best[0]):
                best = (sts, sid)
        if best is None:
            expect[eid] = (uid, None, None)
        else:
            us = int((ts - best[0]).total_seconds() * 1_000_000)
            expect[eid] = (uid, best[1], us // 1000)

    rows = q_asof_join(spark, SF).collect()
    got = {r["event_id"]: (r["user_id"], r["snap_id"], r["staleness_ms"]) for r in rows}
    assert got == expect


def _tokens(text):
    """Mirror of pipeline_ops._docs_tokens: non-empty whitespace splits."""
    return [t for t in re.split(r"\s+", text) if t]


def test_gopher_quality_matches_pure_python_ratios(spark):
    """dup-bigram ppm and top-token ppm == brute-force Counter arithmetic
    over the shared tokenizer."""
    from crawler_spark.queries.dataset_ops import q_gopher_quality

    expect = {}
    for doc_id, _src, _lang, text in _docs():
        toks = _tokens(text)
        if len(toks) < 2:
            continue
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        total = len(bigrams)
        dup_ppm = (total - len(set(bigrams))) * 1_000_000 // total
        top_ppm = max(Counter(toks).values()) * 1_000_000 // len(toks)
        expect[doc_id] = (len(toks), dup_ppm, top_ppm)

    rows = q_gopher_quality(spark, SF).collect()
    got = {r["doc_id"]: (r["n_tokens"], r["dup_bigram_ppm"], r["top_token_ppm"])
           for r in rows}
    assert got == expect


def test_domain_sample_matches_pure_python_threshold(spark):
    """keep iff md5-uniform * n_source < cap * 1e6, recomputed in pure
    Python — pins the md5 nibble slice and the integer comparison."""
    from crawler_spark.queries.dataset_ops import DOMAIN_SAMPLE_CAP, q_domain_sample

    per_source = Counter(src for _id, src, _l, _t in _docs())
    expect = set()
    for doc_id, src, _lang, _text in _docs():
        u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 1_000_000
        if u * per_source[src] < DOMAIN_SAMPLE_CAP * 1_000_000:
            expect.add((doc_id, src, u, per_source[src]))

    rows = q_domain_sample(spark, SF).collect()
    got = {(r["doc_id"], r["source"], r["u"], r["n_source"]) for r in rows}
    assert got == expect


def test_domain_sample_append_stable_per_source(spark):
    """Growing OTHER sources never flips a doc's keep bit; growing a
    doc's OWN source only ever evicts (monotone tightening) — the
    property that makes the sample re-derivable per partition."""
    from crawler_spark.queries.dataset_ops import DOMAIN_SAMPLE_CAP

    cap = DOMAIN_SAMPLE_CAP * 1_000_000

    def keep(doc_id, n_source):
        u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 1_000_000
        return u * n_source < cap

    for doc_id in (1, 7, 42, 999, 12345):
        kept = [keep(doc_id, n) for n in (1, 10, 100, 1000, 10_000)]
        # monotone non-increasing in own-source size
        assert all(a >= b for a, b in zip(kept, kept[1:]))


def test_length_quantiles_are_data_elements_and_ordered(spark):
    """Nearest-rank quantiles are ELEMENTS of the per-lang count multiset
    and monotone p50 <= p90 <= p99 <= max."""
    from crawler_spark.queries.dataset_ops import q_length_quantiles

    per_lang = defaultdict(list)
    for _id, _src, lang, text in _docs():
        per_lang[lang].append(len([t for t in re.split(r"\s+", text) if t]))

    rows = q_length_quantiles(spark, SF).collect()
    assert {r["lang"] for r in rows} == set(per_lang)
    for r in rows:
        counts = per_lang[r["lang"]]
        assert r["n_docs"] == len(counts)
        for q in ("p50_tokens", "p90_tokens", "p99_tokens"):
            assert r[q] in counts
        assert r["p50_tokens"] <= r["p90_tokens"] <= r["p99_tokens"] <= max(counts)
        # exact nearest-rank positions
        s = sorted(counts)
        n = len(s)
        assert r["p50_tokens"] == s[(n - 1) // 2]
        assert r["p90_tokens"] == s[((n - 1) * 9) // 10]
        assert r["p99_tokens"] == s[((n - 1) * 99) // 100]


def test_normalize_dedup_catches_all_planted_variants(spark):
    """Every planted uppercase+punctuation copy collapses onto its
    original: each doc_id % 6 == 0 source doc appears in some group whose
    canonical_id is the ORIGINAL id (min over {id, id + 2_000_000})."""
    from crawler_spark.queries.dataset_ops import q_normalize_dedup

    rows = q_normalize_dedup(spark, SF).collect()
    canon = {r["canonical_id"] for r in rows}
    norm_groups = defaultdict(list)
    for doc_id, _src, _lang, text in _docs():
        key = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
        norm_groups[key].append(doc_id)
    for key, ids in norm_groups.items():
        planted = [i for i in ids if i % 6 == 0]
        if planted:
            # the group exists and its canonical is the min original id
            assert min(ids) in canon
    total_copies = sum(r["n_copies"] for r in rows)
    assert total_copies > len(rows)  # every reported group is a real dup group


def test_pii_scrub_counts_and_redacts(spark):
    """Synthesized contact lines are counted and the scrub hash equals a
    pure-Python re.sub of the same text."""
    from crawler_spark.queries.dataset_ops import _EMAIL_RE, q_pii_scrub

    pat = re.compile(_EMAIL_RE)
    expect = {}
    for doc_id, _src, _lang, text in _docs():
        if doc_id % 4 == 0:
            text = f"{text} contact user{doc_id}@example.org or u{doc_id}@test.net"
        elif doc_id % 7 == 0:
            text = f"{text} mail admin@example.org"
        scrubbed = pat.sub("<EMAIL>", text)
        expect[doc_id] = (
            len(pat.findall(text)),
            hashlib.md5(scrubbed.encode()).hexdigest(),
        )

    rows = q_pii_scrub(spark, SF).collect()
    got = {r["doc_id"]: (r["n_emails"], r["scrubbed_md5"]) for r in rows}
    assert got == expect
    assert any(n >= 2 for n, _h in got.values())


def test_source_temperature_sample_counts_and_determinism(spark):
    """Per-source kept count must be min(n_source, 4*floor(sqrt(n))),
    and the kept set must be the lowest-md5-rank docs of each source."""
    import hashlib
    import math

    import duckdb

    from crawler_spark.queries.dataset_ops import (
        SAMPLE_MULT,
        q_source_temperature_sample,
    )

    rows = duckdb.sql(
        f"SELECT doc_id, source FROM '{SF}/documents.parquet'"
    ).fetchall()
    by_src = {}
    for doc_id, src in rows:
        by_src.setdefault(src, []).append(doc_id)
    expected = []
    for src, ids in by_src.items():
        n = len(ids)
        target = SAMPLE_MULT * math.floor(math.sqrt(n))
        ranked = sorted(ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
        for d in ranked[:target]:
            expected.append((d, src, n, target))
    expected.sort()
    got = [tuple(r) for r in q_source_temperature_sample(spark, SF).collect()]
    assert got == expected
    # the big sources are actually downsampled (temperature < 1)
    assert any(len(ids) > SAMPLE_MULT * math.floor(math.sqrt(len(ids))) for ids in by_src.values())
