"""Catalog-table contract suite (VERDICT r2 #7).

Every assertion here is a semantic the engine RELIES on from its table
layer — the exact promises tables.py makes (atomic multi-table commit at
the round barrier, staged-write invisibility, parent-chain snapshot
rollback, append-only / MERGE-free discipline). The suite is
parameterized over the parquet SnapshotTable model AND an in-memory
double (tests/table_double.py), so a real Iceberg catalog adapter can be
swapped in test-guided: make it pass this suite and every Catalog call
site works unchanged.
"""

from __future__ import annotations

import pytest

from crawler_spark.tables import Catalog, SnapshotTable
from tests.table_double import InMemoryTable


@pytest.fixture(params=["parquet", "mock"])
def make_catalog(request, tmp_path):
    n = [0]

    def make() -> Catalog:
        n[0] += 1
        factory = SnapshotTable if request.param == "parquet" else InMemoryTable
        return Catalog(str(tmp_path / f"cat{n[0]}"), table_factory=factory)

    return make


def _metric_rows(spark, rows):
    return spark.createDataFrame(
        [(int(r), str(n), float(v)) for r, n, v in rows],
        "round int, name string, value double",
    )


def _read_metrics(cat, spark):
    return sorted(
        (r["round"], r["name"], r["value"]) for r in cat.metrics.read(spark).collect()
    )


def test_append_visible_and_append_only(make_catalog, spark):
    cat = make_catalog()
    assert cat.metrics.read(spark).count() == 0  # empty table readable
    cat.metrics.append(_metric_rows(spark, [(0, "a", 1.0)]), 0)
    cat.metrics.append(_metric_rows(spark, [(1, "b", 2.0)]), 1)
    assert _read_metrics(cat, spark) == [(0, "a", 1.0), (1, "b", 2.0)]
    # append-only: earlier snapshots are immutable — the second append
    # added a NEW snapshot (lineage grew) instead of rewriting the first
    lin = cat.metrics.lineage()
    assert [m["round"] for m in lin] == [0, 1]
    assert lin[0]["dirs"] == lin[1]["dirs"][: len(lin[0]["dirs"])]


def test_append_is_not_merge(make_catalog, spark):
    """MERGE-free discipline: re-appending the same key must yield BOTH
    rows (the engine's dedup is the url_seen anti-join, never an upsert
    hidden in the storage layer)."""
    cat = make_catalog()
    cat.metrics.append(_metric_rows(spark, [(0, "k", 1.0)]), 0)
    cat.metrics.append(_metric_rows(spark, [(0, "k", 9.0)]), 1)
    vals = sorted(r["value"] for r in cat.metrics.read(spark).collect())
    assert vals == [1.0, 9.0]


def test_staged_write_invisible_until_commit(make_catalog, spark):
    cat = make_catalog()
    target, count = cat.metrics.stage(_metric_rows(spark, [(0, "x", 5.0)]))
    assert count == 1
    assert cat.metrics.read(spark).count() == 0  # not committed yet
    # ...but the stager can read its own staged dir (round-internal reuse)
    assert cat.metrics.read_dir(spark, target).count() == 1
    cat.metrics.commit_staged(target, 0)
    assert _read_metrics(cat, spark) == [(0, "x", 5.0)]


def test_atomic_multi_table_commit_via_runs_barrier(make_catalog, spark):
    """The round barrier: data for round r lands in any order, but the
    runs row is LAST — a crash anywhere before it must leave a state
    rollback_to_last_completed fully discards."""
    cat = make_catalog()
    # round 0 commits completely (runs row last)
    cat.metrics.append(_metric_rows(spark, [(0, "a", 1.0)]), 0)
    cat.errors.append(
        spark.createDataFrame(
            [("CrawlError", "u", "m", 0)], "kind string, url string, message string, round int"
        ),
        0,
    )
    cat.runs.append_local([("run", 0, "running", 0, 0, 0)], 0)
    # round 1 crashes mid-commit: metrics landed, errors staged-but-lost,
    # and the runs row never happened
    cat.metrics.append(_metric_rows(spark, [(1, "b", 2.0)]), 1)
    cat.errors.stage(
        spark.createDataFrame(
            [("CrawlError", "v", "m2", 1)], "kind string, url string, message string, round int"
        )
    )
    r = cat.rollback_to_last_completed(spark)
    assert r == 0
    assert _read_metrics(cat, spark) == [(0, "a", 1.0)]  # round-1 row gone
    assert cat.errors.read(spark).count() == 1


def test_rollback_walks_parent_chain(make_catalog, spark):
    cat = make_catalog()
    for rnd in range(3):
        cat.metrics.append(_metric_rows(spark, [(rnd, "m", float(rnd))]), rnd)
    cat.metrics.rollback_to_round(1)
    assert [r for (r, _, _) in _read_metrics(cat, spark)] == [0, 1]
    # lineage reflects the restored version's ancestry only
    assert [m["round"] for m in cat.metrics.lineage()] == [0, 1]
    # rolling FORWARD is not a thing: appends after rollback fork history
    cat.metrics.append(_metric_rows(spark, [(2, "m2", 9.0)]), 2)
    got = _read_metrics(cat, spark)
    assert (2, "m", 2.0) not in got and (2, "m2", 9.0) in got


def test_overwrite_replaces_whole_table(make_catalog, spark):
    cat = make_catalog()
    cat.metrics.append(_metric_rows(spark, [(0, "a", 1.0)]), 0)
    cat.metrics.overwrite(_metric_rows(spark, [(1, "b", 2.0)]), 1)
    assert _read_metrics(cat, spark) == [(1, "b", 2.0)]


def test_append_local_reads_back_through_table(make_catalog, spark):
    cat = make_catalog()
    cat.runs.append_local([("run", 0, "running", 3, 4, 5)], 0)
    row = cat.runs.read(spark).collect()[0]
    assert (row["run_id"], row["round"], row["next_seq"]) == ("run", 0, 5)
