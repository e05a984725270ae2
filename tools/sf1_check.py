"""Asymptotic guard (VERDICT r04 #6): build a deterministic sf1.0 dataset
(10× sf0.1) and time every contract query on it vs sf0.1. A query whose
sf1.0 time exceeds ~10× its sf0.1 time (plus fixed-cost slack) has a
constant factor hiding a bad asymptotic — the winnowing HOF chain and the
caption windows were the named suspects.

The scale-up replicates sf0.1 ten times with key shifts that preserve
referential integrity (orderkey↔orders, partkey↔part, suppkey↔supplier,
custkey↔customer, user_id per replica), so every join keeps its
selectivity. Document texts get a per-replica suffix token: replicas stay
NEAR-duplicates (a realistic hard case for the dedup family — 10-deep
near-dup clusters) without collapsing into exact duplicates. region and
nation stay single-copy (dimension leaves, as in TPC-H at any sf).

Usage: python tools/sf1_check.py            # build (cached) + time both
       python tools/sf1_check.py --build    # just build
Writes BENCH/BENCH_sf1.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, "_data", "sf1.0")
REPLICAS = 10

# key columns to shift per replica, per table: col -> domain-size source
# (table whose max value defines the shift stride, so FKs stay aligned)
_SHIFTS = {
    "customer": {"c_custkey": "customer.c_custkey"},
    "supplier": {"s_suppkey": "supplier.s_suppkey"},
    "part": {"p_partkey": "part.p_partkey"},
    "orders": {"o_orderkey": "orders.o_orderkey", "o_custkey": "customer.c_custkey"},
    "lineitem": {
        "l_orderkey": "orders.o_orderkey",
        "l_partkey": "part.p_partkey",
        "l_suppkey": "supplier.s_suppkey",
    },
    "events": {"event_id": "events.event_id", "user_id": "events.user_id"},
    "documents": {"doc_id": "documents.doc_id"},
    "embeddings": {"vec_id": "embeddings.vec_id"},
}
_COPY = ("region", "nation")


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    strides: dict[str, int] = {}

    def stride(ref: str) -> int:
        if ref not in strides:
            tbl, col = ref.split(".")
            df = spark.read.parquet(f"{SRC}/{tbl}.parquet")
            strides[ref] = int(df.agg(F.max(col)).collect()[0][0]) + 1
        return strides[ref]

    for tbl in _COPY:
        spark.read.parquet(f"{SRC}/{tbl}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{tbl}.parquet"
        )
    for tbl, shifts in _SHIFTS.items():
        df = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        parts = []
        for i in range(REPLICAS):
            rep = df
            for col, ref in shifts.items():
                rep = rep.withColumn(col, (F.col(col) + F.lit(i * stride(ref))).cast(
                    dict(df.dtypes)[col]
                ))
            if tbl == "documents" and i > 0:
                # near-duplicate (not exact) replicas; keep n_chars honest
                rep = rep.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" zrep{i}"))
                ).withColumn("n_chars", F.length("text").cast("long"))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{tbl}.parquet")
    with open(os.path.join(DST, "_complete"), "w") as f:
        f.write("ok")


def main() -> None:
    sys.path.insert(0, REPO)
    from bench import run_queries

    from crawler_spark.session import build_session

    spark = build_session(
        app_name="sf1_check", master="local[32]", shuffle_partitions=64
    )
    if not os.path.exists(os.path.join(DST, "_complete")):
        t0 = time.time()
        build(spark)
        print(f"built {DST} in {time.time() - t0:.0f}s")
    if "--build" in sys.argv:
        return

    t0 = time.time()
    base = run_queries(spark, SRC)
    t_base = time.time() - t0
    t0 = time.time()
    big = run_queries(spark, DST)
    t_big = time.time() - t0

    report = {
        "sf_base": 0.1,
        "sf_big": 1.0,
        "total_sec_base": round(t_base, 1),
        "total_sec_big": round(t_big, 1),
        "queries": {
            q: {
                "sf0_1": round(base[q], 2),
                "sf1_0": round(big.get(q, float("nan")), 2),
                "ratio": round(big[q] / base[q], 1) if base.get(q) and q in big else None,
            }
            for q in base
        },
    }
    # flag: ratio beyond the 10× data ratio with slack for per-query fixed
    # cost (a 0.3 s floor keeps sub-second queries from tripping on noise)
    flagged = {
        q: v for q, v in report["queries"].items()
        if v["ratio"] is not None and v["sf1_0"] > 10 * max(v["sf0_1"], 0.3) * 1.5
    }
    report["flagged_superlinear"] = flagged
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BENCH_sf1.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"total_base": report["total_sec_base"],
                      "total_big": report["total_sec_big"],
                      "flagged": list(flagged)}, indent=1))


if __name__ == "__main__":
    main()
