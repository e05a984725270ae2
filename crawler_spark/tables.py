"""Snapshot-committed table layer (the engine's "Iceberg").

The container has no Iceberg runtime jar, so this module provides the same
contract over plain parquet: every table is a directory of immutable data
snapshots plus a version manifest; a commit is an atomic rename of the
version pointer; resume = roll every table back to the last round recorded
in the `runs` table. The layout mirrors Iceberg's snapshot model
(manifest → data files, append = new snapshot referencing parent's files),
so a real deployment swaps `SnapshotTable` for an Iceberg catalog table
with identical call sites (append/overwrite/read/rollback).

This replaces the reference's STM containers (src/Types.hs:24-38) as the
engine's durable state, and gives the north_rule's "resumable from
checkpoint with per-partition lineage": each version manifest records the
round that produced it and the data directories (lineage) it references.

Real-Iceberg drop-in path (attempted round 4; blocked — the container has
no iceberg-spark-runtime jar and no network: resolving
org.apache.iceberg:iceberg-spark-runtime-3.5_2.13 via Maven fails with
DNS errors, verified against repo1.maven.org). On a cluster with the jar:

    spark.sql.extensions = org.apache.iceberg.spark.extensions
                            .IcebergSparkSessionExtensions
    spark.sql.catalog.crawl = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.crawl.type = hadoop   # or rest/hive
    spark.sql.catalog.crawl.warehouse = <state root>

then implement the 6-method table protocol (append/overwrite/read/
current_version/rollback_to/read_version) over `crawl.<ns>.<table>` using
`df.writeTo(...).append()` and `CALL crawl.system.rollback_to_snapshot`,
and pass it as `Catalog(table_factory=...)`. The contract suite
(tests/test_table_contract.py) runs every invariant — snapshot isolation,
atomic commit, orphan rollback, resume — against any factory, and already
passes on two independent implementations, so the adapter lands
test-guided with zero call-site changes.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_CURRENT = "_current"


def _dir_row_count(path: str) -> int:
    """Row count from parquet footers (no data read)."""
    import pyarrow.parquet as pq

    total = 0
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
    return total


def dir_column(path: str, column: str) -> list:
    """Driver-local read of one column from a snapshot data dir (for tiny
    per-round deltas — cookies, hashes — without a Spark collect)."""
    import pyarrow.parquet as pq

    vals: list = []
    for f in sorted(os.listdir(path)):
        if f.endswith(".parquet"):
            vals.extend(pq.read_table(os.path.join(path, f), columns=[column])[column].to_pylist())
    return vals


class SnapshotTable:
    def __init__(self, root: str, name: str, schema: StructType):
        self.name = name
        self.schema = schema
        self.path = os.path.join(root, name)
        os.makedirs(os.path.join(self.path, "_versions"), exist_ok=True)
        os.makedirs(os.path.join(self.path, "data"), exist_ok=True)

    # -- version bookkeeping -------------------------------------------------
    def _current_version(self) -> int:
        p = os.path.join(self.path, _CURRENT)
        if not os.path.exists(p):
            return 0
        with open(p) as f:
            return int(f.read().strip())

    def _manifest(self, version: int) -> dict:
        if version == 0:
            return {"version": 0, "round": -1, "dirs": [], "parent": None}
        with open(os.path.join(self.path, "_versions", f"{version}.json")) as f:
            return json.load(f)

    def _set_current(self, version: int) -> None:
        tmp = os.path.join(self.path, _CURRENT + ".tmp")
        with open(tmp, "w") as f:
            f.write(str(version))
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(self.path, _CURRENT))  # atomic commit

    def _commit(self, dirs: list[str], round_: int) -> None:
        parent = self._current_version()
        version = len(os.listdir(os.path.join(self.path, "_versions"))) + 1
        manifest = {"version": version, "round": round_, "dirs": dirs, "parent": parent}
        with open(os.path.join(self.path, "_versions", f"{version}.json"), "w") as f:
            json.dump(manifest, f)
        self._set_current(version)

    # -- public API ----------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        dirs = self._manifest(self._current_version())["dirs"]
        if not dirs:
            return spark.createDataFrame([], self.schema)
        return spark.read.schema(self.schema).parquet(*dirs)

    def _write_snapshot(self, df: DataFrame) -> str:
        target = os.path.join(self.path, "data", f"s-{uuid.uuid4().hex[:12]}")
        # data files land fully before the manifest references them; a crash
        # mid-write leaves an orphan dir the manifest never points at
        df.select(*[f.name for f in self.schema.fields]).write.mode("error").parquet(target)
        return target

    def append(self, df: DataFrame, round_: int) -> int:
        """Append a snapshot; returns the appended row count (read from
        the written parquet footers — no plan re-execution)."""
        target, count = self.stage(df)
        self.commit_staged(target, round_)
        return count

    # -- staged (two-phase) appends ------------------------------------------
    # Splitting data-write from manifest-commit lets the driver (a) use the
    # written snapshot dir itself as the round's materialization point —
    # one Spark job instead of localCheckpoint + append writing the same
    # rows twice — and (b) stage independent tables from concurrent driver
    # threads, committing all manifests (cheap file renames) at the round
    # barrier with the runs row last. A crash mid-staging leaves orphan
    # data dirs no manifest references — exactly the append crash story.
    def stage(self, df: DataFrame) -> tuple[str, int]:
        """Write the snapshot data dir without committing it."""
        target = self._write_snapshot(df)
        return target, _dir_row_count(target)

    def commit_staged(self, target: str, round_: int) -> None:
        prev = self._manifest(self._current_version())["dirs"]
        self._commit(prev + [target], round_)

    def read_dir(self, spark: SparkSession, target: str) -> DataFrame:
        """Read one staged/committed snapshot dir with the table schema."""
        return spark.read.schema(self.schema).parquet(target)

    def append_local(self, rows: list[tuple], round_: int) -> int:
        """Driver-local append for tiny bookkeeping tables (metrics, runs):
        a pyarrow write, no Spark job at all. Readable by the normal
        `read()` path because the schema is identical."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.types import DoubleType, IntegerType, LongType, StringType

        _PA = {StringType: pa.string(), IntegerType: pa.int32(), LongType: pa.int64(), DoubleType: pa.float64()}
        fields = [pa.field(f.name, _PA[type(f.dataType)]) for f in self.schema.fields]
        cols = list(zip(*rows)) if rows else [[] for _ in fields]
        table = pa.table(
            {f.name: pa.array(list(c), type=f.type) for f, c in zip(fields, cols)}
        )
        target = os.path.join(self.path, "data", f"s-{uuid.uuid4().hex[:12]}")
        os.makedirs(target)
        pq.write_table(table, os.path.join(target, "part-00000.parquet"))
        self.commit_staged(target, round_)
        return len(rows)

    def overwrite(self, df: DataFrame, round_: int) -> int:
        target = self._write_snapshot(df)
        self._commit([target], round_)
        return _dir_row_count(target)

    def rollback_to_round(self, round_: int) -> None:
        """Walk the parent chain to the newest ancestor whose round ≤ round_."""
        v = self._current_version()
        while v > 0 and self._manifest(v)["round"] > round_:
            v = self._manifest(v)["parent"]
        self._set_current(v)

    def lineage(self) -> list[dict]:
        """Parent-chain (round, data-dir) lineage — north_rule bookkeeping."""
        out, v = [], self._current_version()
        while v > 0:
            m = self._manifest(v)
            out.append(m)
            v = m["parent"]
        return list(reversed(out))


class Catalog:
    """All engine state tables rooted at one directory.

    `table_factory` is the catalog seam: anything honoring the
    SnapshotTable interface (append/stage/commit_staged/read/read_dir/
    overwrite/rollback_to_round/lineage/append_local) plugs in — the
    contract suite (tests/test_table_contract.py) runs the SAME
    assertions against this parquet model and an in-memory double, so an
    Iceberg catalog adapter is a test-guided drop-in."""

    def __init__(self, root: str, table_factory=None):
        from crawler_spark.schema import ALL_TABLES

        factory = table_factory or SnapshotTable
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.tables = {name: factory(root, name, schema) for name, schema in ALL_TABLES.items()}

    def __getattr__(self, name: str) -> SnapshotTable:
        try:
            return self.tables[name]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(name) from e

    def last_completed_round(self, spark: SparkSession) -> int:
        runs = self.runs.read(spark)
        row = runs.agg({"round": "max"}).collect()[0][0]
        return -1 if row is None else int(row)

    def rollback_to_last_completed(self, spark: SparkSession) -> int:
        """Resume point: discard any partial writes from an interrupted
        round (the `runs` append is always the final commit of a round)."""
        r = self.last_completed_round(spark)
        for t in self.tables.values():
            if t.name != "runs":
                t.rollback_to_round(r)
        return r
