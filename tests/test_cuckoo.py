"""Cuckoo sidecar tests: no false negatives (incl. saturation → stash),
bounded FPR, deletion, byte-identical distributed merge, crawl parity."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from crawler_spark.cuckoo import CuckooSidecar


def test_no_false_negatives(tmp_path):
    c = CuckooSidecar(str(tmp_path), n_buckets=4, entries_per_bucket=1 << 12)
    rng = np.random.default_rng(7)
    inserted = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    c.merge_hashes(inserted, round_=0)
    res = c.maybe_seen(pd.Series(inserted), c.manifest())
    assert res.all()


def test_no_false_negatives_under_saturation(tmp_path):
    """Tables far beyond capacity (16 slots/partition, hundreds of keys)
    must still answer maybe-seen for every inserted hash — the stash is
    the exactness backstop when eviction chains fail."""
    c = CuckooSidecar(str(tmp_path), n_buckets=2, entries_per_bucket=4)
    rng = np.random.default_rng(3)
    inserted = rng.integers(-(2**62), 2**62, size=400, dtype=np.int64)
    c.merge_hashes(inserted[:150], round_=0)
    c.merge_hashes(inserted[150:], round_=1)
    res = c.maybe_seen(pd.Series(inserted), c.manifest())
    assert res.all()


def test_false_positive_rate_bounded(tmp_path):
    c = CuckooSidecar(str(tmp_path), n_buckets=4, entries_per_bucket=1 << 13)
    rng = np.random.default_rng(11)
    inserted = rng.integers(-(2**62), 2**62, size=10000, dtype=np.int64)
    c.merge_hashes(inserted, round_=0)
    probe = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    probe = np.setdiff1d(probe, inserted)
    fp = c.maybe_seen(pd.Series(probe), c.manifest()).mean()
    # 16-bit fingerprints, 2 buckets x 4 slots probed: fp ≈ 8/2^16 ≈ 0.012%
    assert fp < 0.01


def test_incremental_merge_and_rollback(tmp_path):
    c = CuckooSidecar(str(tmp_path), n_buckets=2, entries_per_bucket=1 << 8)
    r0 = np.array([1, 2, 3], dtype=np.int64)
    r1 = np.array([100, 200], dtype=np.int64)
    c.merge_hashes(r0, round_=0)
    c.merge_hashes(r1, round_=1)
    assert c.maybe_seen(pd.Series(np.concatenate([r0, r1])), c.manifest()).all()
    c.rollback_to_round(0)
    assert c.latest_round() == 0
    assert c.maybe_seen(pd.Series(r0), c.manifest()).all()


def test_deletion(tmp_path):
    """The capability bloom lacks: evicted hashes stop reporting seen
    (modulo fingerprint collisions), survivors never gain a false
    negative, and a deleted hash can be re-inserted."""
    c = CuckooSidecar(str(tmp_path), n_buckets=4, entries_per_bucket=1 << 12)
    rng = np.random.default_rng(23)
    inserted = np.unique(rng.integers(-(2**62), 2**62, size=4000, dtype=np.int64))
    c.merge_hashes(inserted, round_=0)
    gone, kept = inserted[:1000], inserted[1000:]
    removed = c.delete_hashes(gone, round_=1)
    assert removed == len(gone)  # every inserted hash finds its fingerprint
    m = c.manifest()
    assert c.maybe_seen(pd.Series(kept), m).all()  # survivors: exactness holds
    # deleted: mostly not-seen (residual hits are fp collisions with kept)
    assert c.maybe_seen(pd.Series(gone), m).mean() < 0.05
    # re-insert works and versioning keeps rolling forward
    c.merge_hashes(gone[:10], round_=2)
    assert c.maybe_seen(pd.Series(gone[:10]), c.manifest()).all()


def test_distributed_merge_matches_driver_merge(spark, tmp_path):
    """applyInPandas-per-partition merge must produce byte-identical table
    files and identical maybe_seen answers to the driver-side merge —
    both paths sort the partition delta, so insertion order agrees."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    h0 = rng.randint(-(2**62), 2**62, size=5000, dtype=np.int64)
    h1 = rng.randint(-(2**62), 2**62, size=3000, dtype=np.int64)
    probe = np.concatenate([h1[:500], rng.randint(-(2**62), 2**62, size=2000, dtype=np.int64)])

    delta_dir = str(tmp_path / "delta")
    os.makedirs(delta_dir)
    pq.write_table(pa.table({"url_hash": h1}), os.path.join(delta_dir, "part-0.parquet"))

    a = CuckooSidecar(str(tmp_path / "a"), n_buckets=8, entries_per_bucket=1 << 11)
    b = CuckooSidecar(str(tmp_path / "b"), n_buckets=8, entries_per_bucket=1 << 11)
    a.merge_hashes(h0, 0)
    b.merge_hashes(h0, 0)
    a.merge_hashes(h1, 1)  # driver path
    b.merge_dir_distributed(spark, delta_dir, 1)  # executor path

    ma, mb = a.manifest(), b.manifest()
    assert ma.keys() == mb.keys()
    for k in ma:
        with open(ma[k], "rb") as fa, open(mb[k], "rb") as fb:
            assert fa.read() == fb.read(), f"partition {k} tables differ"

    sa = a.maybe_seen(pd.Series(probe), ma)
    sb = b.maybe_seen(pd.Series(probe), mb)
    assert sa.equals(sb)
    assert sa[:500].all()


def test_crawl_with_cuckoo_seen_filter(spark, tmp_path):
    """A crawl with seen_filter='cuckoo' (driver merge) AND one with the
    executor-side merge both match the simulator exactly — the filter
    choice must not change admission semantics."""
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
    sim = Simulator(web, cfg)
    sim.seed(list(cfg.seeds))
    res = sim.run(max_rounds=4)
    for i, distributed in enumerate([False, True]):
        run = CrawlRun(
            spark, cfg, str(tmp_path / f"st{i}"), docs, redirects, robots,
            bloom_buckets=8, seen_filter="cuckoo",
            distributed_bloom_merge=distributed,
        )
        run.seed(list(cfg.seeds))
        run.run(max_rounds=4)
        assert run.fetch_order() == res.fetch_order
        assert run.url_seen_state() == res.url_seen


def test_deletion_survives_fingerprint_collision(tmp_path):
    """Regression: two DISTINCT hashes colliding on (partition,
    fingerprint, bucket) must each keep their own stored copy, so
    deleting one never makes the other report not-seen. (With
    presence-skip insert semantics the pair shared one copy and deletion
    produced a false negative.)"""
    import numpy as np

    from crawler_spark.cuckoo import CuckooSidecar, _derive

    m, nb = 1 << 8, 2
    c = CuckooSidecar(str(tmp_path), n_buckets=nb, entries_per_bucket=m)
    # search a colliding pair: same partition, same fp, same i1
    cand = np.arange(1, 400000, dtype=np.int64)
    part = (cand.view(np.uint64) % np.uint64(nb)).astype(np.int64)
    fp, i1, _ = _derive(cand, m)
    key = part * (1 << 28) + fp.astype(np.int64) * (1 << 9) + i1
    order = np.argsort(key, kind="stable")
    ks = key[order]
    dup = np.flatnonzero(ks[1:] == ks[:-1])
    assert dup.size, "no colliding pair in search range"
    x, y = int(cand[order[dup[0]]]), int(cand[order[dup[0] + 1]])
    assert x != y

    c.merge_hashes(np.array([x, y], dtype=np.int64), round_=0)
    removed = c.delete_hashes(np.array([x], dtype=np.int64), round_=1)
    assert removed == 1
    import pandas as pd

    assert c.maybe_seen(pd.Series([y]), c.manifest()).all(), (
        "collision survivor lost its copy after deleting its twin")
