"""In-memory catalog-table double for the contract suite.

Implements the SnapshotTable interface (tables.py) the way an external
catalog (e.g. Iceberg) would behave: immutable snapshots, a version
pointer advanced only by commit, parent-chain rollback, staged data
invisible until its manifest lands. Rows live in driver memory (test
scale only) — the point is the SEMANTICS, so the same contract tests
run against this double and the parquet model; an Iceberg adapter that
passes the suite is a drop-in at every Catalog call site.
"""

from __future__ import annotations

import itertools

_ids = itertools.count(1)


class InMemoryTable:
    def __init__(self, root: str, name: str, schema):
        self.name = name
        self.schema = schema
        self._staged: dict[str, list] = {}   # token -> rows
        self._snapshots: dict[str, list] = {}  # committed token -> rows
        self._manifests: list[dict] = []     # version i+1 = _manifests[i]
        self._current = 0

    # -- version bookkeeping (commit = advancing the pointer) ---------------
    def _manifest(self, version: int) -> dict:
        if version == 0:
            return {"version": 0, "round": -1, "dirs": [], "parent": None}
        return self._manifests[version - 1]

    def _commit(self, dirs: list[str], round_: int) -> None:
        parent = self._current
        manifest = {
            "version": len(self._manifests) + 1, "round": round_,
            "dirs": dirs, "parent": parent,
        }
        self._manifests.append(manifest)
        self._current = manifest["version"]

    # -- public interface ----------------------------------------------------
    def read(self, spark):
        rows = []
        for d in self._manifest(self._current)["dirs"]:
            rows.extend(self._snapshots[d])
        return spark.createDataFrame(rows, self.schema)

    def stage(self, df) -> tuple[str, int]:
        token = f"mem-{next(_ids)}"
        rows = [tuple(r) for r in df.select(
            *[f.name for f in self.schema.fields]
        ).collect()]
        self._staged[token] = rows
        return token, len(rows)

    def commit_staged(self, target: str, round_: int) -> None:
        self._snapshots[target] = self._staged.pop(target)
        prev = self._manifest(self._current)["dirs"]
        self._commit(prev + [target], round_)

    def append(self, df, round_: int) -> int:
        target, count = self.stage(df)
        self.commit_staged(target, round_)
        return count

    def append_local(self, rows: list[tuple], round_: int) -> int:
        token = f"mem-{next(_ids)}"
        self._snapshots[token] = list(rows)
        prev = self._manifest(self._current)["dirs"]
        self._commit(prev + [token], round_)
        return len(rows)

    def read_dir(self, spark, target: str):
        rows = self._snapshots.get(target, self._staged.get(target, []))
        return spark.createDataFrame(rows, self.schema)

    def overwrite(self, df, round_: int) -> int:
        target, count = self.stage(df)
        self._snapshots[target] = self._staged.pop(target)
        self._commit([target], round_)
        return count

    def rollback_to_round(self, round_: int) -> None:
        v = self._current
        while v > 0 and self._manifest(v)["round"] > round_:
            v = self._manifest(v)["parent"]
        self._current = v

    def lineage(self) -> list[dict]:
        out, v = [], self._current
        while v > 0:
            m = self._manifest(v)
            out.append(m)
            v = m["parent"]
        return list(reversed(out))
