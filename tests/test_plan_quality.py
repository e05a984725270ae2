"""Plan-shape gates over every driver-contract query.

The correctness gate proves VALUES; these prove the PLANS stay scalable:
no physical CartesianProduct anywhere (an unbroadcast cross join is a
cluster-killer at 100 TB — the intentional rule/query cross joins must
stay BroadcastNestedLoopJoin), and no BatchEvalPython (the row-at-a-time
Python UDF path; the engine's contract is vectorized Arrow stages only —
ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).
"""

from __future__ import annotations

import contextlib
import io

SF = "/root/testdata/sf0.001"


def _physical_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_no_cartesian_and_no_rowwise_python_in_any_query_plan(spark):
    from crawler_spark.queries import all_queries

    bad = {}
    for name, fn in all_queries().items():
        plan = _physical_plan(fn(spark, SF))
        hits = [
            marker
            for marker in ("CartesianProduct", "BatchEvalPython")
            if marker in plan
        ]
        if hits:
            bad[name] = hits
    assert not bad, bad


def test_crawl_round_plan_has_no_cartesian_or_rowwise_python(spark):
    """Same gates over the REAL round plan: build a round's fetch/admission
    DataFrames on a small web and check the physical plans."""
    import shutil

    from crawler_spark.config import CrawlConfig
    from crawler_spark.driver import CrawlRun
    from crawler_spark.genweb import generate
    from tests.conftest import web_to_spark

    web = generate(n_docs=150, n_hosts=12, seed=7)
    docs, redirects, robots = web_to_spark(spark, web)
    cfg = CrawlConfig(
        seeds=tuple(web["seeds"]["url"]),
        domain_include_patterns=("example.org",),
        per_host_budget=3,
    )
    state = "/root/repo/_data/plan_quality_state"
    shutil.rmtree(state, ignore_errors=True)
    run = CrawlRun(spark, cfg, state, docs, redirects, robots)
    run.seed(list(cfg.seeds))
    run.run_one_round()
    for tname in ("frontier", "scheduled", "url_seen", "crawled_docs"):
        plan = _physical_plan(run.catalog.tables[tname].read(spark))
        assert "CartesianProduct" not in plan, tname
        assert "BatchEvalPython" not in plan, tname


def test_every_query_output_column_is_scalar(spark):
    """The driver's value hasher canonicalizes results with pandas
    sort_values, which cannot hash list/map/struct cells — r04's only red
    row (inverted_index) was exactly this, not a value bug. Gate: every
    contract query's output schema is scalar-only."""
    from pyspark.sql import types as T

    from crawler_spark.queries import all_queries

    bad = {}
    for name, fn in all_queries().items():
        nonscalar = [
            f.name
            for f in fn(spark, SF).schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if nonscalar:
            bad[name] = nonscalar
    assert not bad, f"non-scalar output columns break the driver hasher: {bad}"


def test_rotation_front_loads_least_recently_green():
    """The registry orders queries by last driver-green round (committed
    CORRECTNESS_r*.json artifacts), never-green/red first; engine-changed
    queries are pinned ONLY until an artifact of the change round or later
    re-certifies them — so the driver's 50-query window cycles on a
    least-recently-verified schedule with no hand-maintained list."""
    import json

    from crawler_spark.queries import (
        _ENGINE_CHANGED,
        _artifact_paths,
        _is_green,
        _last_green_rounds,
        all_queries,
    )

    last = _last_green_rounds()
    names = list(all_queries())
    active_pins = [
        n for n, changed in _ENGINE_CHANGED.items() if last.get(n, -1) < changed
    ]
    # active pins lead, in declared order
    assert names[: len(active_pins)] == active_pins
    # after the pinned prefix, last-green rounds are non-decreasing
    rounds = [last.get(n, -1) for n in names[len(active_pins):]]
    assert rounds == sorted(rounds)

    # every query green in the NEWEST committed artifact is AFTER every
    # staler query — read the artifact via the same enumeration the
    # rotation uses (no padding/naming assumptions), shared _is_green
    paths = _artifact_paths()
    assert paths, "no committed CORRECTNESS artifacts found"
    newest, newest_path = paths[-1]
    with open(newest_path) as f:
        newest_set = {q for q, v in json.load(f).items() if _is_green(v)}
    idx = {n: i for i, n in enumerate(names)}
    newest_green = [
        idx[q] for q in newest_set
        if q in idx and last.get(q, -1) == newest and q not in active_pins
    ]
    stale = [
        idx[q] for q in names
        if last.get(q, -1) < newest and q not in active_pins
    ]
    # non-vacuous by construction for the committed artifact set: r04
    # certified dozens of queries and round 5 added never-green ones
    assert newest_green and stale
    assert max(stale) < min(newest_green)


def test_global_windows_only_over_partition_level_aggregates(spark):
    """Some query plans legitimately contain an UNPARTITIONED window — the
    two-phase global rank / prefix sum (plans/ranking.py) runs its phase-2
    cumulative sum over ONE ROW PER BUCKET. That is the bounded,
    scale-safe shape (input cardinality == bucket count, never corpus
    rows); Spark's 'No Partition Defined' warning for it is expected.
    This gate pins the invariant: every global window in every contract
    query plan must consume only the ranking module's partition-level
    aggregate columns (_pid/_cb + _cnt/_bsum), so a future op cannot
    introduce a global window over row-level data unnoticed."""
    import contextlib
    import io
    import re

    from crawler_spark.queries import all_queries

    offenders = {}
    for name, fn in all_queries().items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, SF).explain(True)
        plan = buf.getvalue()
        for line in plan.splitlines():
            for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", line):
                first = m.group(1).split(",")[0]
                is_global = " ASC" in first or " DESC" in first
                if is_global and not re.search(r"_pid#|_cb#", line):
                    offenders.setdefault(name, []).append(line.strip()[:120])
    assert not offenders, (
        f"global window over non-partition-level data: {offenders}"
    )
