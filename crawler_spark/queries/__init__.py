"""Driver-contract queries: every implemented operator from SURVEY.md §2
(and the training-data pipeline ops) as a (spark, sf_dir) -> DataFrame
callable plus a DuckDB oracle SQL string.

Inputs are the driver-generated parquet tables (TESTDATA.md). Crawl
operators run over a deterministic URL universe synthesized in-query from
those tables (no external data), so the DuckDB oracle can reproduce the
expected output exactly. Column names/types are aligned on both sides;
float aggregates are floored to ints at row level so value hashes match
bit-exactly.
"""

from __future__ import annotations

from crawler_spark.queries import (
    corpus_ops,
    crawl_ops,
    dataset_ops,
    linkgraph_ops,
    pipeline_ops,
)


def all_queries():
    q = {}
    q.update(crawl_ops.QUERIES)
    q.update(pipeline_ops.QUERIES)
    q.update(corpus_ops.QUERIES)
    q.update(linkgraph_ops.QUERIES)
    q.update(dataset_ops.QUERIES)
    return q


def all_oracles():
    o = {}
    o.update(crawl_ops.ORACLES)
    o.update(pipeline_ops.ORACLES)
    o.update(corpus_ops.ORACLES)
    o.update(linkgraph_ops.ORACLES)
    o.update(dataset_ops.ORACLES)
    return o
