"""Shared scaffold for partitioned URL-seen filter sidecars (bloom.py /
cuckoo.py): the versioned-manifest scheme (copy-on-write files, one JSON
manifest per committed round, rollback by manifest deletion), the
parquet-delta driver-side merge entry point, and the executor-side
applyInPandas-per-partition distributed merge.

Subclasses supply only the filter math:
- merge_hashes(url_hashes, round_): driver-side merge of raw hashes
- _bucket_merger(prior, round_):   a picklable fn(pdf)->pdf[bucket,path]
  that rebuilds ONE partition's file executor-side; it must produce
  byte-identical output to merge_hashes on the same delta (bloom: OR is
  order-free; cuckoo: both paths sort the partition delta first)

n_buckets must be a power of two so the JVM's signed pmod (used to
group the delta) and numpy's uint64 modulo (used everywhere else)
assign every hash the same partition.
"""

from __future__ import annotations

import json
import os

import numpy as np


class FilterSidecar:
    FILES_SUBDIR = "files"

    def __init__(self, root: str, n_buckets: int):
        if n_buckets & (n_buckets - 1):
            raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
        self.root = root
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(root, self.FILES_SUBDIR), exist_ok=True)
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)

    # -- manifests ----------------------------------------------------------
    def _manifest_path(self, round_: int) -> str:
        return os.path.join(self.root, "manifests", f"r{round_}.json")

    def latest_round(self) -> int:
        rounds = [
            int(f[1:-5])
            for f in os.listdir(os.path.join(self.root, "manifests"))
            if f.startswith("r") and f.endswith(".json")
        ]
        return max(rounds, default=-1)

    def manifest(self, round_: int | None = None) -> dict[str, str]:
        r = self.latest_round() if round_ is None else round_
        # walk back to the newest manifest ≤ r (rounds with no merge skip)
        while r >= 0 and not os.path.exists(self._manifest_path(r)):
            r -= 1
        if r < 0:
            return {}
        with open(self._manifest_path(r)) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict[str, str], round_: int) -> None:
        # atomic tmp+rename: eviction (delete_hashes) REPLACES the manifest
        # of an already-committed round, so a torn in-place write would
        # destroy the only valid copy — rollback can't recover a manifest
        # whose round is not past the resume point. os.replace is atomic
        # on POSIX; a crash before it leaves the old manifest intact (the
        # safe stale-filter-entry direction).
        path = self._manifest_path(round_)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, path)

    def rollback_to_round(self, round_: int) -> None:
        for f in os.listdir(os.path.join(self.root, "manifests")):
            if f.startswith("r") and f.endswith(".json") and int(f[1:-5]) > round_:
                os.remove(os.path.join(self.root, "manifests", f))

    # -- merge entry points -------------------------------------------------
    def merge_hashes(self, url_hashes: np.ndarray, round_: int) -> None:
        raise NotImplementedError

    def _bucket_merger(self, prior: dict[int, str], round_: int):
        raise NotImplementedError

    def merge_dir(self, snapshot_dir: str, round_: int) -> None:
        """Merge the url_hash column of one staged/committed snapshot dir
        (the round's url_seen delta) — parquet footers only list the
        delta, so the per-round merge cost is O(new URLs), never
        O(table)."""
        import pyarrow.parquet as pq

        files = [
            os.path.join(snapshot_dir, f)
            for f in os.listdir(snapshot_dir)
            if f.endswith(".parquet")
        ]
        if files:
            cols = [pq.read_table(f, columns=["url_hash"])["url_hash"] for f in files]
            hashes = np.concatenate([c.to_numpy(zero_copy_only=False) for c in cols])
        else:
            hashes = np.array([], dtype=np.int64)
        self.merge_hashes(hashes.astype(np.int64), round_)

    def merge_dir_distributed(self, spark, snapshot_dir: str, round_: int) -> None:
        """Cluster-path merge: the round's delta is grouped by partition
        and each partition's file is rebuilt EXECUTOR-side via
        applyInPandas (read prior file from shared storage, merge the
        partition's new hashes, write the new copy-on-write file); the
        driver only collects the (bucket, path) rows — one per touched
        partition — and commits the manifest. Requires storage shared
        between driver and executors (local FS here; object store / DFS
        on a cluster)."""
        from pyspark.sql import functions as F

        manifest = dict(self.manifest())
        prior = {int(b): p for b, p in manifest.items()}
        merge_bucket = self._bucket_merger(prior, round_)
        delta = (
            spark.read.parquet(snapshot_dir)
            .select("url_hash")
            .withColumn(
                "bucket",
                F.pmod(F.col("url_hash"), F.lit(self.n_buckets)).cast("int"),
            )
        )
        rows = (
            delta.groupBy("bucket")
            .applyInPandas(merge_bucket, "bucket int, path string")
            .collect()
        )
        for r in rows:
            manifest[str(r["bucket"])] = r["path"]
        self._write_manifest(manifest, round_)
