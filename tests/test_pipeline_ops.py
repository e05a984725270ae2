"""Training-data pipeline op tests: properties the DuckDB value-hash gate
can't express — ANN recall, LSH candidate quality, multimodal plumbing."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_ann_lsh_recall_vs_bruteforce(spark):
    from crawler_spark.queries.pipeline_ops import q_ann_cosine_topk, q_ann_lsh_topk

    exact = q_ann_cosine_topk(spark, SF).collect()
    approx = q_ann_lsh_topk(spark, SF).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets)
    total = sum(len(v) for v in exact_sets.values())
    assert hits / total >= 0.5  # 4-bit SRP buckets keep ≥ half the true top-5


def test_ann_ivf_recall_vs_bruteforce(spark):
    """IVF with nprobe/cells = 1/4 of the corpus scanned must keep a
    useful fraction of the true top-5 (near-random embeddings make this a
    hard case; the oracle gate already checks exact agreement with the
    index definition — this checks the index is WORTH probing)."""
    from crawler_spark.queries.pipeline_ops import q_ann_cosine_topk, q_ann_ivf_topk

    exact = q_ann_cosine_topk(spark, SF).collect()
    approx = q_ann_ivf_topk(spark, SF).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets)
    total = sum(len(v) for v in exact_sets.values())
    assert hits / total >= 0.3


def test_minhash_lsh_catches_planted_near_dups(spark):
    """Plant near-duplicate texts; LSH candidate pairs must include them."""
    import pandas as pd

    base = (
        "the quick brown fox jumps over the lazy dog and keeps running through "
        "the quiet field towards the old stone bridge near the river bank"
    )
    near = base.replace("quiet", "silent")  # one-token change
    far = "completely different words having nothing in common with anything here at all"
    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": [base, near, far], "lang": ["en"] * 3,
         "source": ["s"] * 3, "n_chars": [len(base), len(near), len(far)]}
    )
    import os
    import tempfile

    d = tempfile.mkdtemp(dir="/root/repo/_data" if os.path.isdir("/root/repo/_data") else None)
    pdf.to_parquet(os.path.join(d, "documents.parquet"))
    from crawler_spark.queries.pipeline_ops import q_dedup_minhash_lsh

    pairs = {(r["a"], r["b"]) for r in q_dedup_minhash_lsh(spark, d).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_media_decode_stub_plumbing(spark):
    """Binary column → mapInPandas decode → typed metadata; frame sampler
    expands rows (UDTF shape)."""
    from pyspark.sql import functions as F

    from crawler_spark.functions.media import sample_frames_batch

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    frames = payloads.mapInPandas(
        sample_frames_batch, "doc_id bigint, frame_idx int, feature_hash int"
    ).collect()
    assert len(frames) >= 50  # every doc yields ≥1 sampled frame (idx 0)
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for idxs in by_doc.values():
        assert idxs == sorted(idxs) and idxs[0] == 0
        assert all(i % 10 == 0 for i in idxs)


def test_simhash_near_dup_property(spark):
    """A one-token change must keep hamming distance small; unrelated text
    should be farther away (on average)."""
    import os
    import tempfile

    import pandas as pd

    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok30", "tokX")
    far = " ".join(f"zzz{i}" for i in range(60))
    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": [base, near, far], "lang": ["en"] * 3,
         "source": ["s"] * 3, "n_chars": [1, 1, 1]}
    )
    d = tempfile.mkdtemp(dir="/root/repo/_data" if os.path.isdir("/root/repo/_data") else None)
    pdf.to_parquet(os.path.join(d, "documents.parquet"))
    from crawler_spark.queries.pipeline_ops import q_simhash

    sig = {r["doc_id"]: r["simhash"] for r in q_simhash(spark, d).collect()}
    ham_near = bin(sig[0] ^ sig[1]).count("1")
    ham_far = bin(sig[0] ^ sig[2]).count("1")
    assert ham_near < ham_far
    assert ham_near <= 8


def _tmpdir():
    import os
    import tempfile

    return tempfile.mkdtemp(dir="/root/repo/_data" if os.path.isdir("/root/repo/_data") else None)


def _oracle_rows(d, name):
    """Run the query's DuckDB oracle over a tmp table dir."""
    import os

    import duckdb

    from crawler_spark.queries.pipeline_ops import ORACLES

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        p = os.path.join(d, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return sorted(tuple(r) for r in con.execute(ORACLES[name]).fetchall())


def test_ngram_jaccard_stop_shingle_cap(spark):
    """Planted hot key: one viral shingle shared by every doc must NOT
    create quadratic candidate pairs (df cap drops it); a genuine
    near-dup pair sharing ordinary shingles still comes through. Oracle
    stays value-exact under the same capped semantics."""
    import os

    import pandas as pd

    from crawler_spark.queries.pipeline_ops import NGRAM_MAX_DF, q_dedup_ngram_jaccard

    n_viral = NGRAM_MAX_DF + 10  # viral shingle df > cap
    rows = [
        {"doc_id": i, "text": f"click here now unique{i} filler{i} words{i} end{i}"}
        for i in range(n_viral)
    ]
    base = (
        "the quick brown fox jumps over the lazy dog and keeps running through "
        "the quiet field towards the old stone bridge near the river bank"
    )
    rows.append({"doc_id": 100, "text": base})
    rows.append({"doc_id": 101, "text": base.replace("quiet", "silent")})
    pdf = pd.DataFrame(rows)
    pdf["lang"] = "en"
    pdf["source"] = "s"
    pdf["n_chars"] = pdf["text"].str.len()
    d = _tmpdir()
    pdf.to_parquet(os.path.join(d, "documents.parquet"))

    got = [(r["a"], r["b"], r["jaccard_micro"]) for r in q_dedup_ngram_jaccard(spark, d).collect()]
    pairs = {(a, b) for a, b, _ in got}
    assert (100, 101) in pairs  # the real near-dup survives
    # no viral-only pair: the shared "click here now" shingle is capped out
    assert all(a >= 100 for a, b in pairs)
    assert sorted((a, b, j) for a, b, j in got) == _oracle_rows(d, "dedup_ngram_jaccard")


def test_embedding_neardup_group_cap(spark):
    """Planted mega-label: identical vectors beyond the per-label cap are
    excluded from the pair join (bounded candidates), identical vectors
    inside the cap are found; oracle mirrors the capped semantics."""
    import os

    import numpy as np
    import pandas as pd

    from crawler_spark.queries.pipeline_ops import EMBED_GROUP_CAP, q_embedding_neardup

    rng = np.random.RandomState(0)
    n = EMBED_GROUP_CAP + 400  # one label, larger than the cap
    vecs = rng.normal(size=(n, 8)).astype("float32")
    vecs[11] = vecs[10]  # duplicate inside the cap
    vecs[n - 2] = vecs[n - 1]  # duplicate beyond the cap (rank > CAP)
    pdf = pd.DataFrame(
        {"vec_id": range(n), "embedding": [v.tolist() for v in vecs], "label": [0] * n}
    )
    d = _tmpdir()
    pdf.to_parquet(os.path.join(d, "embeddings.parquet"))

    got = [(r["a"], r["b"], r["cos_micro"]) for r in q_embedding_neardup(spark, d).collect()]
    pairs = {(a, b) for a, b, _ in got}
    assert (10, 11) in pairs  # in-cap duplicate found
    assert (n - 2, n - 1) not in pairs  # beyond-cap rows never enter the join
    assert all(a < EMBED_GROUP_CAP and b < EMBED_GROUP_CAP for a, b in pairs)
    assert sorted(got) == _oracle_rows(d, "embedding_neardup")


def test_media_capability_report():
    """The media stack must declare honestly whether decoding is real —
    a green media_* oracle row only certifies the plumbing otherwise."""
    from crawler_spark.functions.media import _HAVE_REAL_DECODER, capability_report

    rep = capability_report()
    assert rep["real_decoder"] == _HAVE_REAL_DECODER
    assert set(rep["operations"]) == {"decode", "resize", "features", "frame_sample"}
    if not rep["real_decoder"]:
        assert "stub" in rep["operations"]["decode"]
