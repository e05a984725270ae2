"""Bloom sidecar unit tests: no false negatives ever; versioned rollback."""

from __future__ import annotations

import numpy as np

from crawler_spark.bloom import BloomSidecar


def test_no_false_negatives(tmp_path):
    b = BloomSidecar(str(tmp_path), n_buckets=4, bits_per_bucket=1 << 14)
    rng = np.random.default_rng(7)
    inserted = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    b.merge_hashes(inserted, round_=0)
    import pandas as pd

    res = b.maybe_seen(pd.Series(inserted), b.manifest())
    assert res.all()  # every inserted hash must report maybe-seen


def test_false_positive_rate_bounded(tmp_path):
    b = BloomSidecar(str(tmp_path), n_buckets=4, bits_per_bucket=1 << 17)
    rng = np.random.default_rng(11)
    inserted = rng.integers(-(2**62), 2**62, size=10000, dtype=np.int64)
    b.merge_hashes(inserted, round_=0)
    import pandas as pd

    probe = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    probe = np.setdiff1d(probe, inserted)
    fp = b.maybe_seen(pd.Series(probe), b.manifest()).mean()
    # k=7, m/n = 4*2^17/10^4 ≈ 52 bits/key → fp ≪ 1%
    assert fp < 0.01


def test_incremental_merge_and_rollback(tmp_path):
    import pandas as pd

    b = BloomSidecar(str(tmp_path), n_buckets=2, bits_per_bucket=1 << 12)
    r0 = np.array([1, 2, 3], dtype=np.int64)
    r1 = np.array([100, 200], dtype=np.int64)
    b.merge_hashes(r0, round_=0)
    b.merge_hashes(r1, round_=1)
    assert b.maybe_seen(pd.Series(np.concatenate([r0, r1])), b.manifest()).all()
    # roll back round 1: r1 may (bloom) or may not report, but r0 must
    b.rollback_to_round(0)
    assert b.latest_round() == 0
    assert b.maybe_seen(pd.Series(r0), b.manifest()).all()


def test_manifest_skips_missing_rounds(tmp_path):
    import pandas as pd

    b = BloomSidecar(str(tmp_path), n_buckets=2, bits_per_bucket=1 << 12)
    b.merge_hashes(np.array([5], dtype=np.int64), round_=0)
    # round 3 manifest written after skipping rounds 1-2
    b.merge_hashes(np.array([7], dtype=np.int64), round_=3)
    m = b.manifest(2)  # asks for round 2 → falls back to round 0
    assert b.maybe_seen(pd.Series(np.array([5], dtype=np.int64)), m).all()


def test_distributed_merge_matches_driver_merge(spark, tmp_path):
    """merge_dir_distributed (applyInPandas per bucket) must produce
    byte-identical bitmaps and identical maybe_seen answers to the
    driver-side merge over the same delta."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_spark.bloom import BloomSidecar

    rng = np.random.RandomState(7)
    h0 = rng.randint(-(2**62), 2**62, size=5000, dtype=np.int64)
    h1 = rng.randint(-(2**62), 2**62, size=3000, dtype=np.int64)
    probe = np.concatenate([h1[:500], rng.randint(-(2**62), 2**62, size=2000, dtype=np.int64)])

    delta_dir = str(tmp_path / "delta")
    os.makedirs(delta_dir)
    pq.write_table(pa.table({"url_hash": h1}), os.path.join(delta_dir, "part-0.parquet"))

    a = BloomSidecar(str(tmp_path / "a"), n_buckets=8)
    b = BloomSidecar(str(tmp_path / "b"), n_buckets=8)
    a.merge_hashes(h0, 0)
    b.merge_hashes(h0, 0)
    a.merge_hashes(h1, 1)  # driver path
    b.merge_dir_distributed(spark, delta_dir, 1)  # executor path

    ma, mb = a.manifest(), b.manifest()
    assert ma.keys() == mb.keys()
    for k in ma:
        ba = np.fromfile(ma[k], dtype=np.uint8)
        bb = np.fromfile(mb[k], dtype=np.uint8)
        assert np.array_equal(ba, bb), f"bucket {k} bitmaps differ"

    sa = a.maybe_seen(pd.Series(probe), ma)
    sb = b.maybe_seen(pd.Series(probe), mb)
    assert sa.equals(sb)
    assert sa[:500].all()  # every truly-inserted hash is maybe-seen


def test_crawl_with_distributed_bloom_merge(spark, tmp_path):
    """A crawl with the executor-side bloom merge matches the simulator
    exactly (the merge path must not change admission semantics)."""
    from crawler_spark.config import CrawlConfig
    from crawler_spark.driver import CrawlRun
    from crawler_spark.genweb import generate
    from crawler_spark.simulator import Simulator
    from tests.conftest import web_to_spark

    web = generate(n_docs=50, n_hosts=5, seed=9, n_redirects=3)
    docs, redirects, robots = web_to_spark(spark, web)
    cfg = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=2,
    )
    run = CrawlRun(
        spark, cfg, str(tmp_path / "st"), docs, redirects, robots,
        bloom_buckets=8, distributed_bloom_merge=True,
    )
    run.seed(list(cfg.seeds))
    run.run(max_rounds=4)
    sim = Simulator(web, cfg)
    sim.seed(list(cfg.seeds))
    res = sim.run(max_rounds=4)
    assert run.fetch_order() == res.fetch_order
    assert run.url_seen_state() == res.url_seen
