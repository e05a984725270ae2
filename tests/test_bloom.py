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
