"""Partitioned cuckoo-filter sidecar for the URL-seen set (D1, SURVEY §4).

The north rule names a "bloom/cuckoo URL-seen" filter; `bloom.py` is the
default, this module is the cuckoo alternative with the SAME duck-typed
interface (manifest / merge_hashes / merge_dir / merge_dir_distributed /
maybe_seen / rollback_to_round / latest_round), so `CrawlRun(
seen_filter="cuckoo")` swaps it in without touching the round plan.

Why a cuckoo filter at 10^10 (Fan et al., "Cuckoo Filter: Practically
Better Than Bloom", CoNEXT'14 — public paper, no code reused):
 - ~2 bytes/URL at a 2^-13 false-positive rate (vs ~2.3 bytes for an
   equivalent bloom) and only TWO cache-line probes per lookup (bloom
   does k=7 scattered reads);
 - supports deletion, which a recrawl scheduler needs to evict URLs
   whose freshness window expired (bloom bitmaps cannot unset bits).

Layout mirrors the bloom sidecar: the seen set is partitioned by
`xxhash64(url) % n_buckets` (power of two, so the JVM's signed `pmod`
and numpy's uint64 modulo agree bit-for-bit); each partition holds one
cuckoo table of `m` buckets x 4 slots of 16-bit fingerprints, written
copy-on-write per round behind the same JSON manifest scheme, so
kill/resume rollback is identical to bloom's.

Exactness contract (same as bloom): false positives fall through to the
exact anti-join; false negatives are impossible — an insert whose
eviction chain exceeds the kick budget lands the displaced fingerprint
in a per-partition STASH that `maybe_seen` also consults, so every
committed url_seen row is always findable. Inserts use MULTISET
semantics (one stored copy per insert) so deletion stays collision-safe.

Sizing: each partition holds entries_per_bucket x 4 fingerprint slots;
keep expected distinct URLs per partition under ~0.84 of that (the b=4
cuckoo load ceiling) — beyond it, inserts fall to the stash, which
preserves exactness but degrades maybe_seen toward O(|stash|) per probe.
At 10^10 URLs: n_buckets=4096, entries_per_bucket=2^20 gives 1.7e10
slots (~1.4e10 at the load ceiling) at 2 bytes each — 8 MB per
partition file, 34 GB total across the cluster's shared storage. Both
knobs are CrawlRun/run_crawl-configurable.

Determinism contract: the driver-side and executor-side
(applyInPandas-per-partition) merges must produce byte-identical files.
Cuckoo insertion is order-sensitive, so both paths sort the partition's
new hashes before inserting; victim-slot choice in the eviction loop is
a pure function of (fingerprint, kick), never random.

All index/fingerprint math derives ONLY from the JVM-computed xxhash64
(splitmix64 remix) — Python never re-hashes URL strings.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd

from crawler_spark.bloom import _splitmix64
from crawler_spark.sidecar import FilterSidecar

_U64 = np.uint64
_MASK16 = np.uint64(0xFFFF)
SLOTS = 4  # slots per cuckoo bucket (the paper's b=4 sweet spot)


def _derive(url_hashes: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(fp, i1, i2) for each hash. fp is a nonzero 16-bit fingerprint
    (0 marks an empty slot); i1/i2 are partial-key-cuckoo partners:
    i2 = i1 XOR spread(fp), an involution, so either index recovers the
    other without knowing the original hash."""
    h = np.asarray(url_hashes, dtype=np.int64).view(_U64)
    g = _splitmix64(h)
    fp = (g & _MASK16).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)
    i1 = ((g >> np.uint64(16)) & _U64(m - 1)).astype(np.int64)
    i2 = _alt_index(i1, fp, m)
    return fp, i1, i2


def _alt_index(i: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    spread = _splitmix64(fp.astype(np.uint16).view(np.uint16).astype(_U64))
    return (i.astype(np.int64) ^ (spread & _U64(m - 1)).astype(np.int64)) & (m - 1)


_SPREAD: list[int] | None = None


def _spread_table() -> list[int]:
    """fp -> splitmix64(fp) for all 2^16 fingerprints, as plain ints —
    built once per process so the insertion loop never allocates numpy
    scalars per kick. Identical values to _alt_index's vectorized path."""
    global _SPREAD
    if _SPREAD is None:
        _SPREAD = _splitmix64(np.arange(1 << 16, dtype=_U64)).tolist()
    return _SPREAD


def _stash_keys(idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
    """Stash membership key: (bucket_index << 16) | fingerprint."""
    return (idx.astype(np.int64) << 16) | fp.astype(np.int64)


class _Partition:
    """One partition's cuckoo table + overflow stash (mutable, in-memory)."""

    def __init__(self, m: int, table: np.ndarray | None = None, stash: np.ndarray | None = None):
        self.m = m
        self.table = table if table is not None else np.zeros((m, SLOTS), dtype=np.uint16)
        # sorted int64 array of (index << 16) | fp overflow keys
        self.stash = stash if stash is not None else np.zeros(0, dtype=np.int64)

    @classmethod
    def load(cls, path: str | None, m: int) -> "_Partition":
        if path is None:
            return cls(m)
        raw = np.fromfile(path, dtype=np.uint8)
        tbytes = m * SLOTS * 2
        table = raw[:tbytes].view(np.uint16).reshape(m, SLOTS).copy()
        stash = raw[tbytes:].view(np.int64).copy()
        return cls(m, table, stash)

    def save(self, path: str) -> None:
        # raw little-endian bytes (table then sorted stash): deterministic
        # content enables the byte-identical driver-vs-distributed merge
        # gate. Task-unique temp + atomic rename (same retry-safety
        # argument as bloom.merge_dir_distributed).
        tmp = f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(self.table.tobytes())
            f.write(np.sort(self.stash).tobytes())
        os.replace(tmp, path)

    # -- vectorized lookup --------------------------------------------------
    def contains(self, fp: np.ndarray, i1: np.ndarray, i2: np.ndarray) -> np.ndarray:
        hit = (self.table[i1] == fp[:, None]).any(axis=1)
        hit |= (self.table[i2] == fp[:, None]).any(axis=1)
        if self.stash.size:
            hit |= np.isin(_stash_keys(i1, fp), self.stash)
            hit |= np.isin(_stash_keys(i2, fp), self.stash)
        return hit

    # -- deterministic insertion -------------------------------------------
    def insert(self, fp: np.ndarray, i1: np.ndarray, i2: np.ndarray, max_kicks: int = 256) -> None:
        """MULTISET semantics (Fan et al. §3.2): every insert stores its
        own fingerprint copy, even when an identical one is resident.
        Copies are what make deletion collision-safe: two distinct hashes
        colliding on (partition, fp) share the SAME bucket pair {i1, i2}
        (the xor partner of a bucket under a fingerprint is unique), so
        after deleting one the other's copy is still in a bucket its
        lookup probes. The per-batch np.unique in merge_hashes keeps one
        copy per distinct hash per round.

        Runs on a flat python-int list with the precomputed spread table
        — per-item cost is a few list ops, no numpy scalar churn. For
        small deltas the list conversion would dominate (O(m*SLOTS) to
        touch a handful of slots), so those write the numpy buffer in
        place; the placement logic is shared, so both backends place
        identically."""
        m = self.m
        spread = _spread_table()
        flat = self.table.ravel()  # C-contiguous -> a view, not a copy
        use_list = len(fp) * 64 >= flat.size
        tbl = flat.tolist() if use_list else flat
        stash_new: list[int] = []
        for j in range(len(fp)):
            f, a, b = int(fp[j]), int(i1[j]), int(i2[j])
            placed = False
            for i in (a, b):
                base = i * SLOTS
                for s in range(SLOTS):
                    if tbl[base + s] == 0:
                        tbl[base + s] = f
                        placed = True
                        break
                if placed:
                    break
            if placed:
                continue
            # eviction chain: victim slot is a pure function of (fp, kick)
            i, cur = (a if (f & 1) == 0 else b), f
            for kick in range(max_kicks):
                slot = (cur + kick) % SLOTS
                base = i * SLOTS
                victim = int(tbl[base + slot])
                tbl[base + slot] = cur
                cur = victim
                i = (i ^ (spread[cur] & (m - 1))) & (m - 1)
                base = i * SLOTS
                for s in range(SLOTS):
                    if tbl[base + s] == 0:
                        tbl[base + s] = cur
                        cur = -1
                        break
                if cur == -1:
                    break
            if cur != -1:
                # saturation: keep exactness via the stash (cur is still a
                # valid (index, fp) residency for the displaced item)
                stash_new.append((i << 16) | cur)
        if use_list:
            self.table = np.asarray(tbl, dtype=np.uint16).reshape(m, SLOTS)
        if stash_new:
            self.stash = np.sort(np.concatenate([self.stash, np.asarray(stash_new, dtype=np.int64)]))

    def delete(self, fp: np.ndarray, i1: np.ndarray, i2: np.ndarray) -> np.ndarray:
        """Remove ONE resident copy of each (fp, i1/i2); returns a bool
        mask of which deletions found their target. Safe for any hash
        that was inserted: inserts store one copy each (see insert), and
        colliding (fp, partition) hashes share the same bucket pair, so
        the survivor's copy stays probe-visible. The standard caveat
        remains for hashes NEVER inserted — deleting one can evict a
        colliding real entry."""
        ok = np.zeros(len(fp), dtype=bool)
        for j in range(len(fp)):
            f = fp[j]
            done = False
            for i in (int(i1[j]), int(i2[j])):
                hits = np.flatnonzero(self.table[i] == f)
                if hits.size:
                    self.table[i, hits[0]] = 0
                    done = True
                    break
            if not done and self.stash.size:
                for i in (int(i1[j]), int(i2[j])):
                    key = int(_stash_keys(np.asarray([i]), np.asarray([f], dtype=np.uint16))[0])
                    pos = np.flatnonzero(self.stash == key)
                    if pos.size:
                        self.stash = np.delete(self.stash, pos[0])
                        done = True
                        break
            ok[j] = done
        return ok


class CuckooSidecar(FilterSidecar):
    """Drop-in alternative to BloomSidecar (same interface, see module doc)."""

    FILES_SUBDIR = "tables"

    def __init__(self, root: str, n_buckets: int = 32, entries_per_bucket: int = 1 << 14):
        super().__init__(root, n_buckets)
        if entries_per_bucket & (entries_per_bucket - 1):
            raise ValueError(f"entries_per_bucket must be a power of two, got {entries_per_bucket}")
        self.m = entries_per_bucket

    # -- table io -----------------------------------------------------------
    # worker-lifetime cache, same safety argument as bloom's (files are
    # immutable copy-on-write per round). Bounded by BYTES, not entries:
    # at production sizing (entries_per_bucket=2^20 → ~8 MB/partition) a
    # 256-entry cap would be ~2 GB per executor process; bloom's identical
    # scheme holds ~32 MB, which is the budget this bound preserves.
    _part_cache: dict = {}
    _part_cache_bytes: int = 0
    PART_CACHE_MAX_BYTES = 256 << 20  # 256 MB per executor process

    def _load_partition(self, manifest: dict[str, str], bucket: int) -> _Partition:
        path = manifest.get(str(bucket))
        if path is None:
            return _Partition(self.m)
        part = CuckooSidecar._part_cache.get(path)
        if part is None:
            part = _Partition.load(path, self.m)
            nbytes = part.table.nbytes + part.stash.nbytes
            if CuckooSidecar._part_cache_bytes + nbytes > self.PART_CACHE_MAX_BYTES:
                CuckooSidecar._part_cache.clear()
                CuckooSidecar._part_cache_bytes = 0
            CuckooSidecar._part_cache[path] = part
            CuckooSidecar._part_cache_bytes += nbytes
        return part

    def _partition_of(self, h: np.ndarray) -> np.ndarray:
        return (h.astype(np.int64).view(_U64) % _U64(self.n_buckets)).astype(np.int64)

    # -- merge (per round, after D4) ----------------------------------------
    def merge_hashes(self, url_hashes: np.ndarray, round_: int) -> None:
        manifest = dict(self.manifest())
        h = np.asarray(url_hashes, dtype=np.int64)
        if len(h):
            h = np.unique(h)  # sorted + deduped: insertion-order determinism
            buckets = self._partition_of(h)
            for b in np.unique(buckets):
                hb = h[buckets == b]
                cached = self._load_partition(manifest, int(b))
                part = _Partition(self.m, cached.table.copy(), cached.stash.copy())
                fp, i1, i2 = _derive(hb, self.m)
                part.insert(fp, i1, i2)
                path = os.path.join(self.root, self.FILES_SUBDIR, f"b{int(b)}_r{round_}.bin")
                part.save(path)
                manifest[str(int(b))] = path
        self._write_manifest(manifest, round_)

    def _bucket_merger(self, prior: dict[int, str], round_: int):
        """Executor-side per-partition merge (FilterSidecar.
        merge_dir_distributed) — byte-identical to `merge_hashes` because
        each group sorts its hashes before the deterministic insertion."""
        files_dir, m = os.path.join(self.root, self.FILES_SUBDIR), self.m

        def merge_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(pdf["bucket"].iloc[0])
            hb = np.unique(pdf["url_hash"].to_numpy(dtype=np.int64))
            part = _Partition.load(prior.get(b), m)
            fp, i1, i2 = _derive(hb, m)
            part.insert(fp, i1, i2)
            out = os.path.join(files_dir, f"b{b}_r{round_}.bin")
            part.save(out)
            return pd.DataFrame([{"bucket": b, "path": out}])

        return merge_bucket

    # -- deletion (the capability bloom lacks) ------------------------------
    def delete_hashes(self, url_hashes: np.ndarray, round_: int) -> int:
        """Evict previously-inserted hashes (e.g. recrawl-expired URLs) and
        commit a new manifest for `round_`. Returns how many found their
        resident fingerprint. Only pass hashes that were inserted."""
        manifest = dict(self.manifest())
        h = np.unique(np.asarray(url_hashes, dtype=np.int64))
        removed = 0
        if len(h):
            buckets = self._partition_of(h)
            for b in np.unique(buckets):
                hb = h[buckets == b]
                cached = self._load_partition(manifest, int(b))
                part = _Partition(self.m, cached.table.copy(), cached.stash.copy())
                fp, i1, i2 = _derive(hb, self.m)
                removed += int(part.delete(fp, i1, i2).sum())
                path = os.path.join(self.root, self.FILES_SUBDIR, f"b{int(b)}_d{round_}.bin")
                part.save(path)
                manifest[str(int(b))] = path
        self._write_manifest(manifest, round_)
        return removed

    # -- query (the pre-filter; same signature as bloom) --------------------
    def maybe_seen(self, url_hashes: pd.Series, manifest: dict[str, str]) -> pd.Series:
        h = url_hashes.to_numpy(dtype=np.int64)
        if len(h) == 0:
            return pd.Series([], dtype=bool)
        out = np.zeros(len(h), dtype=bool)
        buckets = self._partition_of(h)
        for b in np.unique(buckets):
            mask = buckets == b
            part = self._load_partition(manifest, int(b))
            fp, i1, i2 = _derive(h[mask], self.m)
            out[mask] = part.contains(fp, i1, i2)
        return pd.Series(out)
