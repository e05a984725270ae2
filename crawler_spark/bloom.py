"""Partitioned bloom sidecar for the URL-seen set (D1, SURVEY.md §4).

The reference holds the seen set in an STM `Set` (src/Types.hs:35-36);
exact membership at 10^10 URLs can't live in memory. Our design: url_seen
is bucket-partitioned by `pmod(xxhash64(url), n_buckets)`, and each bucket
carries a bloom bitmap sidecar file. Candidate admission first consults
the bucket's bloom (executor-side, partition-local); only *maybe-seen*
candidates (a small, false-positive-rate-bounded fraction) proceed to the
exact anti-join, so most candidates never shuffle into it. False
positives fall through to the exact join — exactness preserved; false
negatives are impossible because every committed url_seen row is OR-ed
into its bucket's bitmap before the round commits.

Bit positions derive ONLY from the JVM-computed xxhash64 (splitmix64
remix, k double-hashed probes) — Python never re-hashes URL strings, so
JVM and sidecar always agree.

Versioning: one manifest per committed round (bucket → bitmap file);
resume rolls back to the manifest of the checkpoint round. Bitmaps are
written once per round per touched bucket (copy-on-write, like an Iceberg
rewrite of a small metadata file).
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pandas as pd


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


def _probes(url_hashes: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i*h2 (Kirsch-Mitzenmacher)."""
    h = url_hashes.astype(np.int64).view(np.uint64)
    h1 = _splitmix64(h)
    h2 = _splitmix64(h1) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


class BloomSidecar:
    def __init__(self, root: str, n_buckets: int = 32, bits_per_bucket: int = 1 << 20, k: int = 7):
        # power of two keeps signed pmod (JVM-side bucketing in the
        # distributed merge) and the uint64 modulo used everywhere else
        # assigning the SAME bucket to every hash
        if n_buckets & (n_buckets - 1):
            raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
        self.root = root
        self.n_buckets = n_buckets
        self.m_bits = bits_per_bucket
        self.k = k
        os.makedirs(os.path.join(root, "bitmaps"), exist_ok=True)
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
        if r < 0:
            return {}
        # walk back to the newest manifest ≤ r (rounds with no merge skip)
        while r >= 0 and not os.path.exists(self._manifest_path(r)):
            r -= 1
        if r < 0:
            return {}
        with open(self._manifest_path(r)) as f:
            return json.load(f)

    def rollback_to_round(self, round_: int) -> None:
        for f in os.listdir(os.path.join(self.root, "manifests")):
            if f.startswith("r") and f.endswith(".json") and int(f[1:-5]) > round_:
                os.remove(os.path.join(self.root, "manifests", f))

    # -- bitmap io ----------------------------------------------------------
    # worker-lifetime cache: executors consult the same bucket bitmaps for
    # every Arrow batch of every round — re-reading ~MB files per batch
    # would dominate the pre-filter. Bitmap files are immutable
    # (copy-on-write per round), so caching by path is always safe.
    _bitmap_cache: dict = {}

    def _load_bitmap(self, manifest: dict[str, str], bucket: int) -> np.ndarray:
        path = manifest.get(str(bucket))
        if path is None:
            return np.zeros(self.m_bits // 8, dtype=np.uint8)
        bm = BloomSidecar._bitmap_cache.get(path)
        if bm is None:
            bm = np.fromfile(path, dtype=np.uint8)
            if len(BloomSidecar._bitmap_cache) > 256:  # bound worker memory
                BloomSidecar._bitmap_cache.clear()
            BloomSidecar._bitmap_cache[path] = bm
        return bm

    # -- merge (per round, after D4) ----------------------------------------
    def merge_hashes(self, url_hashes: np.ndarray, round_: int) -> None:
        """OR the given xxhash64 values into their buckets; write a new
        manifest for `round_`. Driver-side here; at cluster scale this runs
        as applyInPandas per bucket writing to shared storage (same files,
        same format) — the per-bucket work is identical."""
        manifest = dict(self.manifest())
        if len(url_hashes):
            h = np.asarray(url_hashes, dtype=np.int64)
            buckets = (h.view(np.uint64) % np.uint64(self.n_buckets)).astype(np.int64)
            for b in np.unique(buckets):
                bits = _probes(h[buckets == b], self.k, self.m_bits).ravel()
                bm = self._load_bitmap(manifest, int(b)).copy()  # don't mutate cache
                np.bitwise_or.at(bm, bits // 8, (1 << (bits % 8)).astype(np.uint8))
                path = os.path.join(self.root, "bitmaps", f"b{int(b)}_r{round_}.npy")
                bm.tofile(path)
                manifest[str(int(b))] = path
        with open(self._manifest_path(round_), "w") as f:
            json.dump(manifest, f)

    def merge_dir(self, snapshot_dir: str, round_: int) -> None:
        """Merge the url_hash column of one staged/committed snapshot dir
        (the round's url_seen delta) — parquet footers only list the delta,
        so the per-round merge cost is O(new URLs), never O(table)."""
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
        """Cluster-path merge: the round's url_seen delta is grouped by
        bloom bucket and each bucket's bitmap is rebuilt EXECUTOR-side via
        applyInPandas (read prior bitmap from shared storage, OR the
        bucket's new probes, write the new copy-on-write file); the driver
        only collects the (bucket, path) rows — one per touched bucket —
        and commits the manifest. Byte-identical output to the
        driver-side `merge_dir` (OR is order-free and the probe positions
        depend only on the hashes), so the two paths are interchangeable
        per round. Requires storage shared between driver and executors
        (local FS here; object store / DFS on a cluster)."""
        import pandas as pd
        from pyspark.sql import functions as F

        manifest = dict(self.manifest())
        root, k, m_bits = self.root, self.k, self.m_bits
        prior = {int(b): p for b, p in manifest.items()}

        def merge_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(pdf["bucket"].iloc[0])
            h = pdf["url_hash"].to_numpy(dtype=np.int64)
            path = prior.get(b)
            bm = (
                np.fromfile(path, dtype=np.uint8)
                if path is not None
                else np.zeros(m_bits // 8, dtype=np.uint8)
            )
            bits = _probes(h, k, m_bits).ravel()
            np.bitwise_or.at(bm, bits // 8, (1 << (bits % 8)).astype(np.uint8))
            out = os.path.join(root, "bitmaps", f"b{b}_r{round_}.npy")
            # task-unique temp + atomic rename: a speculative/retried task
            # writing the final path directly could leave a truncated or
            # interleaved bitmap behind the committed manifest; rename races
            # are benign (content is deterministic per bucket/round)
            tmp = f"{out}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
            bm.tofile(tmp)
            os.replace(tmp, out)
            return pd.DataFrame([{"bucket": b, "path": out}])

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
        with open(self._manifest_path(round_), "w") as f:
            json.dump(manifest, f)

    # -- query (the pre-filter) ---------------------------------------------
    def maybe_seen(self, url_hashes: pd.Series, manifest: dict[str, str]) -> pd.Series:
        """Vectorized membership test. True = maybe seen (needs the exact
        anti-join); False = definitely new (skips it)."""
        h = url_hashes.to_numpy(dtype=np.int64)
        if len(h) == 0:
            return pd.Series([], dtype=bool)
        out = np.zeros(len(h), dtype=bool)
        buckets = (h.view(np.uint64) % np.uint64(self.n_buckets)).astype(np.int64)
        for b in np.unique(buckets):
            mask = buckets == b
            bm = self._load_bitmap(manifest, int(b))
            probes = _probes(h[mask], self.k, self.m_bits)
            bits_set = (bm[probes // 8] >> (probes % 8).astype(np.uint8)) & 1
            out[mask] = bits_set.all(axis=1)
        return pd.Series(out)
