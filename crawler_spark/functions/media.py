"""Multimodal column plumbing: decode / feature-extract over opaque
binary payloads via Arrow-batched mapInPandas.

The container has no image/audio libraries, so the actual decode is a
STUB: `_HAVE_REAL_DECODER` gates the real path (PIL/av), and the fallback
is a deterministic fake whose outputs are pure functions of the payload
bytes — making the Spark-side plumbing (schema, batching, UDF signature)
real and testable, and the results reproducible by the DuckDB oracle.

Swap `_fake_decode` for a real decoder on a cluster with the libs
installed; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

try:  # pragma: no cover - not installed in this container
    import PIL.Image  # noqa: F401

    _HAVE_REAL_DECODER = True
except ImportError:
    _HAVE_REAL_DECODER = False


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """(n_bytes, width, height, n_frames) — deterministic in the bytes."""
    n = len(payload)
    return n, n % 1024, (n * 7) % 768, n % 30 + 1


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas over (doc_id, payload: binary) → typed media metadata."""
    for pdf in batches:
        meta = [_fake_decode(bytes(p)) for p in pdf["payload"]]
        out = pd.DataFrame(meta, columns=["n_bytes", "width", "height", "n_frames"])
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def sample_frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame sampling stub: one row per sampled frame index (every 10th of
    n_frames), with a deterministic per-frame feature hash. Demonstrates
    the UDTF-shaped (row-expanding) mapInPandas pattern used for video."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n, _w, _h, n_frames = _fake_decode(bytes(payload))
            for idx in range(0, n_frames, 10):
                rows.append((doc_id, idx, (n * 31 + idx * 7) % 997))
        yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "feature_hash"])
