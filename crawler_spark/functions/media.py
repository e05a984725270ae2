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


def capability_report() -> dict:
    """What the media stack can actually do in this environment — so a
    green media_* query is never mistaken for real decoding. Surfaced in
    docs/driver output; the decode itself stays honestly stubbed until a
    real decoder is present."""
    return {
        "real_decoder": _HAVE_REAL_DECODER,
        "decode_backend": "PIL" if _HAVE_REAL_DECODER else "deterministic-stub",
        "operations": {
            "decode": "real" if _HAVE_REAL_DECODER else "stub (byte-derived metadata)",
            "resize": "stub (arithmetic on stub dims)",
            "features": "stub (byte-derived vector)",
            "frame_sample": "stub (every-10th index)",
        },
        "plumbing": "real (binary column, Arrow-batched mapInPandas, typed schemas)",
    }


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


def resize_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Resize stub: scale fake dims to fit a 256x256 box (integer math so
    the DuckDB oracle reproduces it bit-exactly), plus a deterministic
    content hash of the "resized" payload. Real path: PIL thumbnail."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n, in_w, in_h, _ = _fake_decode(bytes(payload))
            big = max(in_w, in_h, 1)
            out_w = max(1, (in_w * 256) // big)
            out_h = max(1, (in_h * 256) // big)
            rows.append((doc_id, out_w, out_h, (n * 131 + out_w * 17 + out_h * 13) % 100000))
        yield pd.DataFrame(rows, columns=["doc_id", "out_w", "out_h", "resized_hash"])


FEATURE_DIM = 8


def extract_features_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Feature-extraction stub: a FEATURE_DIM-dim vector deterministic in
    the payload bytes, emitted as milli-unit ints (a real extractor emits
    floats; ints keep the oracle value-hash comparison bit-exact)."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(bytes(payload))
            rows.append((doc_id, [(n * 31 + i * 17) % 1000 for i in range(FEATURE_DIM)]))
        yield pd.DataFrame(rows, columns=["doc_id", "feature_milli"])
