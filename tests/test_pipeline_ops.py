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


def test_simhash_hot_band_subbanding_bounded_and_lossless(spark):
    """Planted templated corpus: 300+ docs share band 0's value (the
    shape that made the plain band equi-join quadratic — VERDICT r2 #3).
    The sub-banded candidate generator must (a) keep the candidate count
    far below the in-band quadratic, and (b) return EXACTLY the pairs
    the brute-force hamming filter returns — the escape hatch is
    lossless, not a cap-and-drop."""
    import itertools
    import random

    from pyspark.sql import functions as F

    from crawler_spark.queries.pipeline_ops import (
        SIMHASH_MAX_HAM,
        _simhash_candidate_pairs,
    )

    rng = random.Random(5)
    shared_band0 = 0x155  # 9-bit band value every template doc shares
    sigs = {}
    for i in range(300):
        sigs[i] = shared_band0 | (rng.getrandbits(51) << 9)
    # a genuinely near pair inside the hot group (hamming 2)
    sigs[9000] = sigs[0] ^ (0b101 << 40)  # flip bits 40 and 42
    assert bin(sigs[0] ^ sigs[9000]).count("1") == 2

    expected = sorted(
        (a, b)
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= SIMHASH_MAX_HAM
    )
    assert (0, 9000) in expected

    sig_df = spark.createDataFrame(
        [(i, s) for i, s in sigs.items()], "doc_id long, simhash long"
    )
    cand = _simhash_candidate_pairs(sig_df, cap=64).localCheckpoint()
    n_cand = cand.count()
    in_band_quadratic = 301 * 302 // 2  # what the old plan would generate
    assert n_cand < in_band_quadratic / 4, (n_cand, in_band_quadratic)

    got = sorted(
        (r["a"], r["b"])
        for r in cand.withColumn(
            "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
        ).where(F.col("hamming") <= SIMHASH_MAX_HAM).collect()
    )
    assert got == expected

    # sanity: an effectively-infinite cap (pure cold path) agrees too
    cold_only = _simhash_candidate_pairs(sig_df, cap=1 << 40)
    got_cold = sorted(
        (r["a"], r["b"])
        for r in cold_only.withColumn(
            "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
        ).where(F.col("hamming") <= SIMHASH_MAX_HAM).collect()
    )
    assert got_cold == expected


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


def test_neardup_lsh_bits_autoscale_with_corpus(spark):
    """VERDICT r2 #4: embedding_neardup_lsh's blocking strength must be
    parameterized from corpus size, with the oracle choosing the SAME
    bits from count(*). Two corpora whose auto-chosen bits differ must
    both match the oracle exactly."""
    import os
    import random

    import pandas as pd

    from crawler_spark.queries.pipeline_ops import (
        _neardup_bits,
        q_embedding_neardup_lsh,
    )

    assert _neardup_bits(100) != _neardup_bits(600)

    rng = random.Random(7)
    for n in (100, 600):
        vecs = []
        for i in range(n):
            if i % 10 == 9:  # planted near-dup of the previous vector
                v = [x + rng.uniform(-0.01, 0.01) for x in vecs[-1][1]]
            else:
                v = [rng.uniform(-1, 1) for _ in range(64)]
            vecs.append((i, v))
        d = _tmpdir()
        pd.DataFrame({"vec_id": [i for i, _ in vecs],
                      "embedding": [v for _, v in vecs]}).to_parquet(
            os.path.join(d, "embeddings.parquet")
        )
        got = sorted(
            tuple(r) for r in q_embedding_neardup_lsh(spark, d)
            .select("a", "b", "cos_micro").collect()
        )
        want = [
            (int(a), int(b), int(c))
            for a, b, c in _oracle_rows(d, "embedding_neardup_lsh")
        ]
        assert got == want, f"n={n}: {len(got)} spark vs {len(want)} oracle rows"
        assert len(got) >= n // 10 - 2  # the planted near-dups were found


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
    a green media_* oracle row only certifies the plumbing otherwise.
    PNG decode is real (pure stdlib) in every environment."""
    from crawler_spark.functions.media import _HAVE_REAL_DECODER, capability_report

    rep = capability_report()
    assert rep["real_decoder"] == _HAVE_REAL_DECODER
    assert set(rep["operations"]) == {
        "decode", "decode_png", "decode_gif", "decode_wav",
        "resize", "features", "frame_sample",
    }
    assert rep["operations"]["decode_png"] == "real"
    assert rep["operations"]["decode_gif"].startswith("real")
    assert rep["operations"]["decode_wav"].startswith("real")
    for op in ("resize", "features", "frame_sample"):
        assert rep["operations"][op].startswith("real for")
    assert "real for PNG" in rep["operations"]["decode"]
    if not rep["real_decoder"]:
        assert "stub" in rep["operations"]["decode"]


def test_png_codec_round_trip_all_filters():
    """decode_png must reconstruct pixels exactly through zlib inflate +
    all five scanline filters (the encoder cycles filter type per row),
    and must reject corrupted chunk CRCs — the properties that separate
    a real decoder from byte arithmetic."""
    import pytest

    from crawler_spark.functions.media import decode_png, encode_png_gray

    for (w, h, seed) in [(2, 2, 1), (8, 6, 12345), (3, 7, 999999999), (1, 5, 7), (16, 16, 42)]:
        px = bytes((seed * 31 + i * 7) % 256 for i in range(w * h))
        png = encode_png_gray(w, h, px)
        rw, rh, depth, ctype, psum = decode_png(png)
        assert (rw, rh, depth, ctype) == (w, h, 8, 0)
        assert psum == sum(px)

    corrupted = bytearray(encode_png_gray(4, 4, bytes(16)))
    corrupted[20] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(corrupted))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_decode_media_batch_real_png_path():
    """decode_media_batch routes PNG-signed payloads through the real
    decoder (true dimensions) and everything else through the stub."""
    import pandas as pd

    from crawler_spark.functions.media import decode_media_batch, encode_png_gray

    png = encode_png_gray(5, 3, bytes(15))
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [png, b"hello world"]})
    out = next(decode_media_batch(iter([pdf])))
    assert tuple(out.iloc[0][["width", "height", "n_frames"]]) == (5, 3, 1)
    assert out.iloc[1]["width"] == len(b"hello world") % 1024  # stub path


def test_gif_codec_round_trip_real_lzw():
    """decode_gif must reconstruct pixels exactly through variable-width
    LZW — dictionary growth across the 9→10→11→12-bit boundaries, the
    4096-entry clear-code reset, and the KwKwK one-ahead case — the
    properties that separate a real LZW decoder from byte arithmetic."""
    import random

    import pytest

    from crawler_spark.functions.media import (
        _lzw_decode,
        _lzw_encode,
        decode_gif,
        encode_gif_gray,
    )

    rng = random.Random(7)
    for px in (
        b"",
        b"\x00",
        b"abcabcabcabc" * 50,                                 # dictionary reuse
        bytes(rng.randrange(256) for _ in range(20_000)),     # forces 4096 resets
        bytes([5]) * 10_000,                                  # KwKwK-heavy run
    ):
        assert _lzw_decode(_lzw_encode(px)) == px
    # compression must be real: a constant run shrinks dramatically
    assert len(_lzw_encode(bytes([5]) * 10_000)) < 400

    for (w, h, seed) in [(3, 3, 0), (8, 6, 42), (120, 90, 7), (1, 5, 999)]:
        px = bytes((seed * 37 + i * 11) % 256 for i in range(w * h))
        gif = encode_gif_gray(w, h, px)
        assert decode_gif(gif) == (w, h, 256, sum(px))

    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 16)  # only 87a supported
    with pytest.raises(ValueError):
        decode_gif(b"not a gif")


def test_decode_media_batch_real_gif_path():
    """decode_media_batch routes GIF87a-signed payloads through the real
    LZW decoder (true dimensions), alongside the PNG and stub paths."""
    import pandas as pd

    from crawler_spark.functions.media import decode_media_batch, encode_gif_gray

    gif = encode_gif_gray(7, 4, bytes(range(28)))
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [gif, b"GIF87a???"]})
    out = next(decode_media_batch(iter([pdf])))
    assert tuple(out.iloc[0][["width", "height", "n_frames"]]) == (7, 4, 1)
    # a truncated/corrupt GIF falls back to the stub, not a crash
    assert out.iloc[1]["width"] == len(b"GIF87a???") % 1024


def test_gif_multi_frame_round_trip():
    """decode_gif_frames must LZW-reconstruct EVERY image block; the
    sampler emits every 3rd frame with the real per-frame sum."""
    import pandas as pd
    import pytest

    from crawler_spark.functions.media import (
        FRAME_STRIDE,
        decode_gif_frames,
        encode_gif_multi,
        sample_gif_frames_batch,
    )

    for w, h, nf in [(2, 2, 1), (5, 3, 7), (4, 6, 12)]:
        frames = [
            bytes((3 * 41 + f * 19 + i * 11) % 256 for i in range(w * h))
            for f in range(nf)
        ]
        sw, sh, sums = decode_gif_frames(encode_gif_multi(w, h, frames))
        assert (sw, sh) == (w, h)
        assert sums == [sum(f) for f in frames]
        # strided decode: grid frames get the SAME real sum, skipped
        # frames are None (their LZW decode never runs)
        _, _, strided = decode_gif_frames(encode_gif_multi(w, h, frames), stride=3)
        assert len(strided) == nf
        for f in range(nf):
            assert strided[f] == (sum(frames[f]) if f % 3 == 0 else None)
    pdf = pd.DataFrame({
        "doc_id": [3],
        "payload": [encode_gif_multi(2, 2, [bytes([f] * 4) for f in range(8)])],
    })
    out = next(sample_gif_frames_batch(iter([pdf])))
    assert list(out["frame_idx"]) == list(range(0, 8, FRAME_STRIDE))
    assert list(out["pixel_sum"]) == [4 * f for f in range(0, 8, FRAME_STRIDE)]
    with pytest.raises(ValueError):
        decode_gif_frames(b"GIF87a" + b"\x00" * 7)  # no global palette bit


def test_resize_png_nn_exact_grid():
    """Real resize: per-pixel equality with the reference grid sample,
    identity below the box, and the re-encoded output decodes to the
    same pixels."""
    from crawler_spark.functions.media import (
        decode_png_pixels,
        encode_png_gray,
        resize_png_nn,
    )

    w, h = 21, 13
    px = bytes((11 * 31 + i * 7) % 256 for i in range(w * h))
    out_w, out_h, psum, resized = resize_png_nn(encode_png_gray(w, h, px), box=8)
    assert (out_w, out_h) == (8, (13 * 8) // 21)
    rw, rh, _d, _c, rpx = decode_png_pixels(resized)
    assert (rw, rh) == (out_w, out_h)
    expect = bytes(
        px[(oy * h // out_h) * w + (ox * w // out_w)]
        for oy in range(out_h) for ox in range(out_w)
    )
    assert rpx == expect and psum == sum(expect)
    # image already inside the box: identity
    small = encode_png_gray(4, 3, bytes(range(12)))
    assert resize_png_nn(small, box=8)[:2] == (4, 3)


def test_media_dispatch_real_branches():
    """The generic resize/frame-sample entry points route PNG/GIF payloads
    through the real codecs, stub otherwise."""
    import pandas as pd

    from crawler_spark.functions.media import (
        encode_gif_multi,
        encode_png_gray,
        resize_media_batch,
        sample_frames_batch,
    )

    png = encode_png_gray(20, 10, bytes(200))
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [png, b"not an image"]})
    out = next(resize_media_batch(iter([pdf])))
    assert tuple(out.iloc[0][["out_w", "out_h", "resized_hash"]]) == (8, 4, 0)
    gif = encode_gif_multi(2, 2, [bytes([9] * 4)] * 4)
    out2 = next(sample_frames_batch(iter([pd.DataFrame(
        {"doc_id": [1], "payload": [gif]})])))
    assert list(out2["frame_idx"]) == [0, 3]
    assert list(out2["feature_hash"]) == [36, 36]
    # a TRUNCATED GIF (interrupted download) must fall back to the stub,
    # not crash the task with an IndexError escaping the walker
    out3 = next(sample_frames_batch(iter([pd.DataFrame(
        {"doc_id": [1], "payload": [gif[:-3]]})])))
    fake_n = len(gif[:-3]) % 30 + 1
    assert list(out3["frame_idx"]) == list(range(0, fake_n, 10))  # stub path


def test_wav_multi_data_chunk_consistency():
    """A WAV with two data chunks: count AND features must come from the
    same (first) chunk — decode_wav and audio_features_batch agree."""
    import struct

    import pandas as pd

    from crawler_spark.functions.media import (
        audio_features_batch,
        decode_wav,
        encode_wav_pcm16,
    )

    a, b = [100, -100], [7, 8]
    wav = encode_wav_pcm16(8000, a)
    extra = b"data" + struct.pack("<I", 4) + struct.pack("<2h", *b)
    doubled = wav + extra
    doubled = b"RIFF" + struct.pack("<I", len(doubled) - 8) + doubled[8:]
    assert decode_wav(doubled)[3:] == (2, 0, 20000)  # chunk A
    out = next(audio_features_batch(iter([pd.DataFrame(
        {"doc_id": [1], "payload": [doubled]})])))
    r = out.iloc[0]
    assert (r["n_samples"], r["peak_abs"], r["zero_crossings"], r["autocorr1"]) == (
        2, 100, 1, -10000)  # same chunk A series


def test_wav_codec_round_trip_real_pcm():
    """decode_wav must recover exact signed 16-bit samples through a real
    RIFF chunk walk — extremes, zeros, junk-chunk skipping, pad bytes."""
    import struct

    import pytest

    from crawler_spark.functions.media import decode_wav, encode_wav_pcm16

    cases = [
        [0, 1, -1, 32767, -32768],
        [((7 * 13 + i * 17) % 65536) - 32768 for i in range(53)],
        [],
    ]
    for samples in cases:
        b = encode_wav_pcm16(22050, samples)
        assert decode_wav(b) == (
            22050, 1, 16, len(samples), sum(samples),
            sum(v * v for v in samples),
        )
    # unknown chunk with odd size: walker must skip it + its pad byte
    b = encode_wav_pcm16(8000, [5, -5])
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = b[:12] + junk + b[12:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced)[3:] == (2, 0, 50)
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00NOPE")
    with pytest.raises(ValueError):
        decode_wav(b"not audio")


def test_decode_media_batch_real_wav_path():
    """decode_media_batch routes RIFF/WAVE payloads through the real PCM
    decoder (frames → width, channels → height), stub otherwise."""
    import pandas as pd

    from crawler_spark.functions.media import decode_media_batch, encode_wav_pcm16

    wav = encode_wav_pcm16(16000, list(range(-10, 11)))
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [wav, b"RIFFxxxxNOPE"]})
    out = next(decode_media_batch(iter([pdf])))
    assert tuple(out.iloc[0][["width", "height", "n_frames"]]) == (21, 1, 1)
    assert out.iloc[1]["width"] == len(b"RIFFxxxxNOPE") % 1024


def test_corpus_split_deterministic_and_stratified(spark):
    """Properties beyond the oracle gate: the split is a pure function of
    doc_id (append-stability), every split is non-empty at 500 docs, and
    realized fractions sit near the 12/2/2 nibble weights."""
    from crawler_spark.queries.pipeline_ops import q_corpus_split

    rows = q_corpus_split(spark, SF).collect()
    again = q_corpus_split(spark, SF).collect()
    assert rows == again  # deterministic, no sampling state
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) == {"train", "dev", "test"}
    n = len(rows)
    assert counts["train"] / n == pytest.approx(12 / 16, abs=0.08)
    assert counts["dev"] / n == pytest.approx(2 / 16, abs=0.06)
    assert counts["test"] / n == pytest.approx(2 / 16, abs=0.06)


def test_depth_priority_bfs_properties(spark):
    """Seeds get depth 0; depths are capped; every depth-d node has an
    in-edge from a depth-(d-1) node (valid BFS layering)."""
    from crawler_spark.queries.crawl_ops import (
        DEPTH_CAP,
        _BFS_NODES,
        _BFS_SEED_STEP,
        _bfs_edges,
        q_depth_priority,
    )

    rows = q_depth_priority(spark, SF).collect()
    depth = {
        int(r["url"].rsplit("/n", 1)[1]): r["depth"] for r in rows
    }
    seeds = set(range(0, _BFS_NODES, _BFS_SEED_STEP))
    assert seeds <= set(depth) and all(depth[s] == 0 for s in seeds)
    assert all(0 <= d <= DEPTH_CAP for d in depth.values())
    edges = [(r["src_k"], r["dst_k"]) for r in _bfs_edges(spark, SF).collect()]
    parents = {}
    for s, t in edges:
        parents.setdefault(t, set()).add(s)
    for k, d in depth.items():
        if d == 0:
            continue
        assert any(depth.get(p) == d - 1 for p in parents.get(k, ())), k


def test_dedup_components_match_bruteforce_bfs(spark):
    """Label propagation must produce exactly the BFS connected components
    of the verified-pair graph, with min-id canonicals."""
    from crawler_spark.queries.pipeline_ops import (
        q_dedup_components,
        q_dedup_minhash_verify,
    )

    pairs = [(r["a"], r["b"]) for r in q_dedup_minhash_verify(spark, SF).collect()]
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = {}
    for start in adj:
        if start in expected:
            continue
        seen, todo = {start}, [start]
        while todo:
            n = todo.pop()
            for m in adj[n]:
                if m not in seen:
                    seen.add(m)
                    todo.append(m)
        root = min(seen)
        for n in seen:
            expected[n] = root
    got = {
        r["node"]: (r["component"], r["is_canonical"])
        for r in q_dedup_components(spark, SF).collect()
    }
    assert {n: c for n, (c, _) in got.items()} == expected
    assert all(canon == (n == c) for n, (c, canon) in got.items())


def test_approx_count_distinct_within_tolerance(spark):
    """Metrics-path sketch sanity (SURVEY §2.8: approx_count_distinct where
    exactness is not needed): HLL++ estimate within its configured rsd of
    the exact distinct count on the doc-id universe."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SF}/documents.parquet")
    row = d.agg(
        F.countDistinct("doc_id").alias("exact"),
        F.approx_count_distinct("doc_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= max(3, 0.06 * row["exact"])


def test_setsim_ppjoin_is_lossless_vs_brute_force(spark):
    """PPJoin prefix filtering must equal the ALL-PAIRS answer exactly —
    that is its whole claim vs the LSH generators. Brute force here is an
    independent pure-Python pass over the raw parquet."""
    import re

    import duckdb

    from crawler_spark.queries.pipeline_ops import q_setsim_ppjoin

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    sets = {}
    for doc_id, text in docs:
        toks = [t for t in re.split(r"\s+", text) if t]
        if len(toks) < 3:
            continue
        sets[doc_id] = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    ids = sorted(sets)
    expected = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            jac = (1000000 * inter) // union
            if jac >= 500000:
                expected.append((a, b, jac))
    got = [tuple(r) for r in q_setsim_ppjoin(spark, SF).collect()]
    assert got == sorted(expected)
    assert len(expected) > 0  # the corpus exercises the join


def test_span_stats_is_shuffle_free(spark):
    """The interleaved-span analytics must stay row-local: no hash
    exchange anywhere in the plan (the only exchange allowed is the
    final presentation sort's range partitioning)."""
    from crawler_spark.queries.crawl_ops import q_span_stats

    df = q_span_stats(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    rows = df.collect()
    assert len(rows) == 500
    # closed-form spot checks: doc k has k%5+1 spans, media at odd offsets
    for r in rows[:25]:
        assert r.n_spans == r.doc_id % 5 + 1
        assert r.n_media == r.n_spans // 2
        assert r.first_media_offset == (1 if r.n_spans >= 2 else -1)


def test_event_dedup_windowed_matches_pure_python(spark):
    import duckdb

    from crawler_spark.queries.pipeline_ops import q_event_dedup_windowed

    rows = duckdb.sql(
        f"SELECT event_id, user_id, event_type, ts FROM '{SF}/events.parquet'"
    ).fetchall()
    groups = {}
    for eid, uid, etype, ts in rows:
        win = ts.replace(minute=0, second=0, microsecond=0)
        groups.setdefault((uid, etype, win), []).append((ts, eid))
    expected = []
    for (uid, etype, win), members in groups.items():
        members.sort()
        expected.append((members[0][1], uid, etype, win, len(members) - 1))
    expected.sort()
    got = [tuple(r) for r in q_event_dedup_windowed(spark, SF).collect()]
    assert got == expected
    assert any(r[4] > 0 for r in expected)  # duplicates actually absorbed


def test_ahash_png_properties():
    """aHash over the real codec: identical pixels → identical hash
    regardless of dimensions-equal re-encodes; a large bright region vs
    dark region flips the corresponding grid bits; hash words stay in
    unsigned-32 range (signed-int64-safe on both engines)."""
    from crawler_spark.functions.media import ahash_png, encode_png_gray

    w, h = 20, 18
    px = bytes((i * 7 + 3) % 256 for i in range(w * h))
    h1 = ahash_png(encode_png_gray(w, h, px))
    h2 = ahash_png(encode_png_gray(w, h, px))
    assert h1 == h2
    for word in h1:
        assert 0 <= word < (1 << 32)

    # half-bright / half-dark: top rows >= mean (bits set), bottom clear
    split = bytes([200] * (w * (h // 2)) + [10] * (w * (h - h // 2)))
    hi, lo = ahash_png(encode_png_gray(w, h, split))
    assert hi == 0xFFFFFFFF  # grid rows 0-3 sample y in {0,2,4,6}: bright
    assert lo == 0  # rows 4-7 sample y in {9,11,13,15}: dark half
