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

Versioning (shared scheme, sidecar.FilterSidecar): one manifest per
committed round (bucket → bitmap file); resume rolls back to the
manifest of the checkpoint round. Bitmaps are written once per round per
touched bucket (copy-on-write, like an Iceberg rewrite of a small
metadata file).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd

from crawler_spark.sidecar import FilterSidecar


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


class BloomSidecar(FilterSidecar):
    FILES_SUBDIR = "bitmaps"

    def __init__(self, root: str, n_buckets: int = 32, bits_per_bucket: int = 1 << 20, k: int = 7):
        super().__init__(root, n_buckets)
        self.m_bits = bits_per_bucket
        self.k = k

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
        manifest for `round_`. Driver-side here; the executor-side path
        (FilterSidecar.merge_dir_distributed + _bucket_merger) produces
        byte-identical files — OR is order-free and the probe positions
        depend only on the hashes."""
        manifest = dict(self.manifest())
        if len(url_hashes):
            h = np.asarray(url_hashes, dtype=np.int64)
            buckets = (h.view(np.uint64) % np.uint64(self.n_buckets)).astype(np.int64)
            for b in np.unique(buckets):
                bits = _probes(h[buckets == b], self.k, self.m_bits).ravel()
                bm = self._load_bitmap(manifest, int(b)).copy()  # don't mutate cache
                np.bitwise_or.at(bm, bits // 8, (1 << (bits % 8)).astype(np.uint8))
                path = os.path.join(self.root, self.FILES_SUBDIR, f"b{int(b)}_r{round_}.npy")
                bm.tofile(path)
                manifest[str(int(b))] = path
        self._write_manifest(manifest, round_)

    def _bucket_merger(self, prior: dict[int, str], round_: int):
        files_dir, k, m_bits = os.path.join(self.root, self.FILES_SUBDIR), self.k, self.m_bits

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
            out = os.path.join(files_dir, f"b{b}_r{round_}.npy")
            # task-unique temp + atomic rename: a speculative/retried task
            # writing the final path directly could leave a truncated or
            # interleaved bitmap behind the committed manifest; rename races
            # are benign (content is deterministic per bucket/round)
            tmp = f"{out}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
            bm.tofile(tmp)
            os.replace(tmp, out)
            return pd.DataFrame([{"bucket": b, "path": out}])

        return merge_bucket

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
