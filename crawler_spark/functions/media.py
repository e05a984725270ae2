"""Multimodal column plumbing: decode / feature-extract over opaque
binary payloads via Arrow-batched mapInPandas.

PNG and GIF decoding are REAL and pure-stdlib — `decode_png`: chunk walk
with CRC verification, zlib-inflated IDAT, per-scanline unfilter for all
five filter types; `decode_gif`: GIF87a palette + sub-block walk with a
real variable-width LZW decompressor (9→12-bit widening, clear-code
resets, KwKwK); `decode_wav`: RIFF chunk walk with real 16-bit PCM
sample parsing — no media library needed. Other payloads fall
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
            "decode": "real for PNG (pure-stdlib: chunk CRCs, inflate, unfilter) "
                      "and GIF87a (variable-width LZW); "
                      + ("real (PIL)" if _HAVE_REAL_DECODER else "stub (byte-derived metadata)")
                      + " for other formats",
            "decode_png": "real",
            "decode_gif": "real (GIF87a: palette, sub-blocks, 9-12 bit LZW "
                          "with clear-code resets and the KwKwK case)",
            "decode_wav": "real (RIFF chunk walk, 16-bit PCM two's-complement "
                          "samples, pad-byte/unknown-chunk handling)",
            "resize": "real for grayscale PNG (decode → integer "
                      "nearest-neighbor grid resample → re-encode); "
                      "stub (arithmetic on stub dims) for other formats",
            "features": "real for WAV audio (peak / zero-crossings / lag-1 "
                        "autocorrelation over decoded PCM); "
                        "stub (byte-derived vector) for images",
            "frame_sample": "real for multi-image GIF87a (per-frame LZW "
                            "decode, every-3rd-frame sample); "
                            "stub (every-10th index) for other formats",
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
    reconstruction) can produce. Chunk CRCs are verified. Streams line by
    line: the sum-only hot path (decode_media_batch) never materializes
    the whole pixel buffer."""
    w, h, depth, ctype, lines = _decode_png_lines(payload)
    return w, h, depth, ctype, sum(sum(line) for line in lines)


def decode_png_pixels(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """Full PNG decode returning the reconstructed sample bytes
    (row-major, channels interleaved) — the input to real resize."""
    w, h, depth, ctype, lines = _decode_png_lines(payload)
    return w, h, depth, ctype, b"".join(bytes(line) for line in lines)


def _decode_png_lines(payload: bytes):
    """Shared chunk walk + inflate + per-line unfilter; returns
    (w, h, depth, ctype, generator-of-reconstructed-lines)."""
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
    def lines():
        prev = bytearray(stride)
        off = 0
        for _ in range(h):
            ft = raw[off]
            line = bytearray(raw[off + 1:off + 1 + stride])
            off += 1 + stride
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
            yield line
            prev = line

    return w, h, depth, ctype, lines()


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


def resize_png_nn(payload: bytes, box: int = 8) -> tuple[int, int, int, bytes]:
    """REAL nearest-neighbor resize for grayscale PNGs: full decode,
    integer-exact sample-grid resample to fit a box×box bound (aspect
    preserved), re-encode. Returns (out_w, out_h, out_pixel_sum,
    resized_png). Integer-only arithmetic so an SQL oracle reproduces
    every output pixel bit-exactly."""
    w, h, _depth, ctype, px = decode_png_pixels(payload)
    if ctype != 0:
        raise ValueError("real resize supports grayscale PNGs")
    big = max(w, h, 1)
    if big <= box:
        out_w, out_h = w, h
    else:
        out_w = max(1, (w * box) // big)
        out_h = max(1, (h * box) // big)
    out = bytes(
        px[(oy * h // out_h) * w + (ox * w // out_w)]
        for oy in range(out_h)
        for ox in range(out_w)
    )
    return out_w, out_h, sum(out), encode_png_gray(out_w, out_h, out)


def resize_png_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas over (doc_id, payload) → real resize results, with the
    resized image round-tripped through the encoder+decoder again so the
    reported sum comes from the RE-DECODED output, not the intermediate."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            out_w, out_h, _psum, resized = resize_png_nn(bytes(payload))
            w2, h2, _d, _c, psum2 = decode_png(resized)
            rows.append((int(doc_id), w2, h2, psum2))
        yield pd.DataFrame(rows, columns=["doc_id", "out_w", "out_h", "out_pixel_sum"])


# ---------------------------------------------------------------------------
# Real GIF codec (stdlib only). GIF87a, 8-bit global palette, single
# non-interlaced image frame — with a REAL variable-width LZW compressor
# and decompressor (dictionary growth, 9→12-bit code widening, clear-code
# resets at 4096 entries, KwKwK case). The round trip proves the decoder
# does actual LZW reconstruction, not byte arithmetic.
# ---------------------------------------------------------------------------

GIF_SIG = b"GIF87a"
_LZW_MAX = 4096

# base single-byte dictionary per min-code-size: rebuilt on every encode
# call (and every in-stream reset) it was ~2/3 of encode_gif_multi's time;
# a dict copy of a cached template is ~10× cheaper than the comprehension
_LZW_BASE: dict[int, dict[bytes, int]] = {}


def _lzw_base_table(mcs: int) -> dict[bytes, int]:
    base = _LZW_BASE.get(mcs)
    if base is None:
        base = _LZW_BASE[mcs] = {bytes([i]): i for i in range(1 << mcs)}
    return dict(base)


def _lzw_encode(pixels: bytes, mcs: int = 8) -> bytes:
    """GIF-flavoured LZW: emits LSB-first variable-width codes starting at
    mcs+1 bits, widening as the dictionary grows and resetting via the
    clear code at 4096 entries."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = n_bits = 0

    def put(code: int, width: int):
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    table = _lzw_base_table(mcs)
    nxt, width = end + 1, mcs + 1
    put(clear, width)
    w = b""
    for px in pixels:
        wc = w + bytes([px])
        if wc in table:
            w = wc
            continue
        put(table[w], width)
        table[wc] = nxt
        nxt += 1
        # encoder widens one emission before the decoder ADDS the entry
        # that forces its widening — lockstep with _lzw_decode's rule
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
        if nxt >= _LZW_MAX:
            put(clear, width)
            table = _lzw_base_table(mcs)
            nxt, width = end + 1, mcs + 1
        w = bytes([px])
    if w:
        put(table[w], width)
    put(end, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int = 8) -> bytes:
    """Inverse of _lzw_encode: real dictionary LZW with the KwKwK case."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    pos = 0  # bit cursor, LSB-first

    def get(width: int) -> int:
        nonlocal pos
        byte, bit = pos >> 3, pos & 7
        val = int.from_bytes(data[byte:byte + 3], "little") >> bit
        pos += width
        return val & ((1 << width) - 1)

    base = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    table, width, prev = list(base), mcs + 1, None
    out = bytearray()
    while pos + width <= len(data) * 8:
        code = get(width)
        if code == clear:
            table, width, prev = list(base), mcs + 1, None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK: the one-ahead code
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def encode_gif_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Encode an 8-bit grayscale GIF87a (identity 256-gray palette, one
    image block, real LZW-compressed data in ≤255-byte sub-blocks)."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer size mismatch")
    out = bytearray(GIF_SIG)
    # logical screen descriptor: global color table, 8 bits/entry, 256 cells
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):  # identity grayscale palette: index == luminance
        out += bytes((i, i, i))
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)  # image desc
    out.append(8)  # LZW minimum code size
    lzw = _lzw_encode(pixels, 8)
    for off in range(0, len(lzw), 255):
        block = lzw[off:off + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3B"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, int, int]:
    """Decode a GIF87a: returns (width, height, n_colors, pixel_sum) where
    pixel_sum sums the LUMINANCE (palette-mapped gray) of every pixel —
    a value only a real LZW reconstruction can produce."""
    if payload[:6] != GIF_SIG:
        raise ValueError("not a GIF87a")
    sw, sh, flags, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    if not flags & 0x80:
        raise ValueError("no global color table")
    n_colors = 2 << (flags & 0x07)
    palette = payload[pos:pos + 3 * n_colors]
    pos += 3 * n_colors
    if payload[pos] != 0x2C:
        raise ValueError("expected image descriptor")
    _l, _t, w, h, iflags = struct.unpack("<HHHHB", payload[pos + 1:pos + 10])
    pos += 10
    if iflags & 0xC0:
        raise ValueError("unsupported local palette / interlace")
    mcs = payload[pos]
    pos += 1
    lzw = bytearray()
    while True:
        n = payload[pos]
        pos += 1
        if n == 0:
            break
        lzw += payload[pos:pos + n]
        pos += n
    idx = _lzw_decode(bytes(lzw), mcs)
    if len(idx) < w * h:
        raise ValueError("LZW stream shorter than image")
    # luminance via the palette's red channel (identity palette ⇒ gray)
    pixel_sum = sum(palette[3 * i] for i in idx[:w * h])
    return w, h, n_colors, pixel_sum


def encode_gif_multi(width: int, height: int, frames: list[bytes]) -> bytes:
    """Multi-image GIF87a (one image block per frame over a shared global
    palette) — the 87a-legal animation layout; each frame's pixel data is
    independently LZW-compressed."""
    out = bytearray(GIF_SIG)
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):
        out += bytes((i, i, i))
    for px in frames:
        if len(px) != width * height:
            raise ValueError("pixel buffer size mismatch")
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(8)
        lzw = _lzw_encode(px, 8)
        for off in range(0, len(lzw), 255):
            block = lzw[off:off + 255]
            out.append(len(block))
            out += block
        out += b"\x00"  # block terminator
    out += b"\x3B"  # trailer
    return bytes(out)


def decode_gif_frames(
    payload: bytes, stride: int = 1
) -> tuple[int, int, list[int | None]]:
    """Walk EVERY image block of a GIF87a, running the real LZW
    decompressor per selected frame; returns (width, height, [per-frame
    pixel_sum]). The multi-frame twin of decode_gif.

    `stride` skips the expensive LZW decode for frames not on the grid —
    their slot in the returned list is None (the sub-block walk still
    advances through them, so framing stays validated for every block).
    Frame SAMPLING is the production op; decoding discarded frames was
    ~2/3 of its cost at FRAME_STRIDE=3.
    """
    import numpy as np

    if payload[:6] != GIF_SIG:
        raise ValueError("not a GIF87a")
    sw, sh, flags, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    if not flags & 0x80:
        raise ValueError("no global color table")
    n_colors = 2 << (flags & 0x07)
    palette = payload[pos:pos + 3 * n_colors]
    pos += 3 * n_colors
    pal_r = np.frombuffer(palette, dtype=np.uint8)[0::3].astype(np.int64)
    sums: list[int | None] = []
    while pos < len(payload):
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker != 0x2C:
            raise ValueError(f"unexpected block 0x{marker:02x}")
        _l, _t, w, h, iflags = struct.unpack("<HHHHB", payload[pos:pos + 9])
        pos += 9
        if iflags & 0xC0:
            raise ValueError("unsupported local palette / interlace")
        mcs = payload[pos]
        pos += 1
        want = len(sums) % stride == 0
        lzw = bytearray()
        while True:
            n = payload[pos]
            pos += 1
            if n == 0:
                break
            if want:
                lzw += payload[pos:pos + n]
            pos += n
        if not want:
            sums.append(None)
            continue
        idx = _lzw_decode(bytes(lzw), mcs)
        if len(idx) < w * h:
            raise ValueError("LZW stream shorter than image")
        px = np.frombuffer(idx, dtype=np.uint8, count=w * h)
        sums.append(int(pal_r[px].sum()))
    if not sums:
        raise ValueError("no image blocks")
    return sw, sh, sums


FRAME_STRIDE = 3


def encode_gif_frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: (doc_id, width, height, n_frames) → (doc_id, payload)
    multi-frame GIFs with per-frame pixels p_f(i) = (doc_id*41 + f*19 +
    i*11) % 256 — the rule the DuckDB oracle recomputes per frame."""
    for pdf in batches:
        rows = []
        for doc_id, w, h, nf in zip(
            pdf["doc_id"], pdf["width"], pdf["height"], pdf["n_frames"]
        ):
            doc_id, w, h, nf = int(doc_id), int(w), int(h), int(nf)
            frames = [
                bytes((doc_id * 41 + f * 19 + i * 11) % 256 for i in range(w * h))
                for f in range(nf)
            ]
            rows.append((doc_id, encode_gif_multi(w, h, frames)))
        yield pd.DataFrame(rows, columns=["doc_id", "payload"])


def sample_gif_frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL frame sampling: decode every frame of a multi-image GIF87a,
    emit one row per FRAME_STRIDE-th frame with its real pixel sum — the
    row-expanding (UDTF-shaped) mapInPandas pattern over real decode."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, sums = decode_gif_frames(bytes(payload), stride=FRAME_STRIDE)
            for f in range(0, len(sums), FRAME_STRIDE):
                rows.append((int(doc_id), f, sums[f]))
        yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "pixel_sum"])


def encode_gif_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: (doc_id, width, height) → (doc_id, payload) with
    deterministic pixels p(i) = (doc_id*37 + i*11) % 256 — the rule the
    DuckDB oracle recomputes directly, closing the encode→decode loop."""
    for pdf in batches:
        rows = []
        for doc_id, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"]):
            doc_id, w, h = int(doc_id), int(w), int(h)
            px = bytes((doc_id * 37 + i * 11) % 256 for i in range(w * h))
            rows.append((doc_id, encode_gif_gray(w, h, px)))
        yield pd.DataFrame(rows, columns=["doc_id", "payload"])


def decode_gif_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas over (doc_id, payload) → real GIF decode results."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, n_colors, psum = decode_gif(bytes(payload))
            rows.append((int(doc_id), w, h, n_colors, psum))
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "n_colors", "pixel_sum"]
        )


# ---------------------------------------------------------------------------
# Real WAV (RIFF/PCM) codec, stdlib struct only. Mono/stereo 16-bit PCM —
# the canonical uncompressed audio case. The decoder does a proper chunk
# walk (fmt before data, unknown chunks skipped, odd-size pad bytes
# honored) and parses the signed little-endian samples, so sample_sum /
# sum_sq can only come out right if the two's-complement round trip is
# correct. Anything non-PCM16 raises ValueError → the caller's stub path.
# ---------------------------------------------------------------------------

WAV_SIG = b"RIFF"


def encode_wav_pcm16(sample_rate: int, samples: list[int], channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE writer: fmt (PCM) + data, 16-bit signed LE."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    # no pad byte: 16-bit samples make len(data) always even (the DECODER
    # still honors pad bytes on foreign odd-size chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _parse_wav(payload: bytes) -> tuple[int, int, int, tuple[int, ...]]:
    """(sample_rate, channels, bits, samples) via a real RIFF chunk walk —
    the single parse every WAV consumer shares. The FIRST data chunk is
    the sample series (canonical WAVE layout; a second data chunk is
    ignored consistently by count AND features)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    fmt = None
    data = None
    while pos + 8 <= min(end, len(payload)):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        chunk = payload[pos + 8:pos + 8 + size]
        if len(chunk) < size:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data" and data is None:
            data = chunk
        pos += 8 + size + (size % 2)  # pad byte on odd sizes
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _brate, _balign, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError("only 16-bit PCM supported")
    n = len(data) // 2
    return sample_rate, channels, bits, struct.unpack(f"<{n}h", data[: n * 2])


def decode_wav(payload: bytes) -> tuple[int, int, int, int, int, int]:
    """(sample_rate, channels, bits, n_samples, sample_sum, sum_sq).
    n_samples counts per-channel frames × channels (i.e. total s16
    values), sums are over all values."""
    sample_rate, channels, bits, vals = _parse_wav(payload)
    return (
        sample_rate, channels, bits, len(vals),
        sum(vals), sum(v * v for v in vals),
    )


def make_wav_encode_batch(step: int = 17):
    """mapInPandas factory: (doc_id, sample_rate, n_samples) → (doc_id,
    payload) with deterministic signed samples s(i) = ((doc_id*13 +
    i*step) % 65536) - 32768 — the rule the DuckDB oracle recomputes,
    closing the loop. `step` controls how fast the series wraps the s16
    range (17 → near-monotone ramps; 7919 → frequent sign changes for
    the feature query)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, sr, n in zip(pdf["doc_id"], pdf["sample_rate"], pdf["n_samples"]):
                doc_id, sr, n = int(doc_id), int(sr), int(n)
                samples = [((doc_id * 13 + i * step) % 65536) - 32768 for i in range(n)]
                rows.append((doc_id, encode_wav_pcm16(sr, samples)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return encode


encode_wav_batch = make_wav_encode_batch()


def decode_wav_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas over (doc_id, payload) → real WAV decode results."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            sr, ch, bits, n, ssum, ssq = decode_wav(bytes(payload))
            rows.append((int(doc_id), sr, ch, bits, n, ssum, ssq))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "sample_rate", "channels", "bits",
                     "n_samples", "sample_sum", "sum_sq"],
        )


def audio_features_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL audio feature extraction over decoded PCM: peak amplitude,
    sign-change (zero-crossing) count, and lag-1 autocorrelation numerator
    — all integer-exact so the SQL oracle reproduces them bit-for-bit.
    These are the standard cheap time-domain features (VAD/energy gates)
    a 100-TB audio pipeline computes at ingest."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            _sr, _ch, _bits, vals = _parse_wav(bytes(payload))
            peak = max((abs(v) for v in vals), default=0)
            zc = sum(
                1 for i in range(1, len(vals))
                if (vals[i - 1] < 0) != (vals[i] < 0)
            )
            ac1 = sum(vals[i] * vals[i + 1] for i in range(len(vals) - 1))
            rows.append((int(doc_id), len(vals), peak, zc, ac1))
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_samples", "peak_abs", "zero_crossings", "autocorr1"]
        )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """(n_bytes, width, height, n_frames) — deterministic in the bytes."""
    n = len(payload)
    return n, n % 1024, (n * 7) % 768, n % 30 + 1


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas over (doc_id, payload: binary) → typed media metadata.
    PNG- and GIF87a-signed payloads take the REAL decoders; everything
    else falls back to the deterministic stub."""
    for pdf in batches:
        meta = []
        for p in pdf["payload"]:
            b = bytes(p)
            try:
                if b[:8] == PNG_SIG:
                    w, h, _depth, _ctype, _psum = decode_png(b)
                    meta.append((len(b), w, h, 1))
                    continue
                if b[:6] == GIF_SIG:
                    w, h, _nc, _psum = decode_gif(b)
                    meta.append((len(b), w, h, 1))
                    continue
                if b[:4] == WAV_SIG and b[8:12] == b"WAVE":
                    _sr, ch, _bits, n, _ssum, _ssq = decode_wav(b)
                    # width := per-channel frame count, height := channels
                    meta.append((len(b), n // max(ch, 1), ch, 1))
                    continue
            except (ValueError, struct.error, zlib.error, IndexError):
                pass  # corrupt payload: stub metadata, same as unknown format
            meta.append(_fake_decode(b))
        out = pd.DataFrame(meta, columns=["n_bytes", "width", "height", "n_frames"])
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def sample_frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame sampling: REAL for multi-image GIF87a payloads (every
    FRAME_STRIDE-th frame, feature_hash = real decoded pixel_sum % 997);
    deterministic stub for other formats (every 10th of fake n_frames).
    Demonstrates the UDTF-shaped (row-expanding) mapInPandas pattern."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            if b[:6] == GIF_SIG:
                try:
                    _w, _h, sums = decode_gif_frames(b, stride=FRAME_STRIDE)
                    for f in range(0, len(sums), FRAME_STRIDE):
                        rows.append((doc_id, f, sums[f] % 997))
                    continue
                except (ValueError, struct.error, IndexError):
                    pass
            n, _w, _h, n_frames = _fake_decode(b)
            for idx in range(0, n_frames, 10):
                rows.append((doc_id, idx, (n * 31 + idx * 7) % 997))
        yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "feature_hash"])


def resize_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Resize: REAL nearest-neighbor resample for grayscale PNG payloads
    (decode → integer grid resample → re-encode; resized_hash = real
    output pixel sum % 100000); stub arithmetic on fake dims for other
    formats (integer math so the DuckDB oracle reproduces it)."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            if b[:8] == PNG_SIG:
                try:
                    out_w, out_h, psum, _resized = resize_png_nn(b)
                    rows.append((doc_id, out_w, out_h, psum % 100000))
                    continue
                except (ValueError, struct.error, zlib.error, IndexError):
                    pass
            n, in_w, in_h, _ = _fake_decode(b)
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


def ahash_png(payload: bytes) -> tuple[int, int]:
    """Perceptual average-hash over a REAL grayscale PNG decode: sample an
    8x8 nearest-neighbor grid (y = (r*h)//8, x = (c*w)//8 — the same
    integer grid rule as resize_png_nn), threshold each sample against
    the integer mean (sum//64, >= is a set bit), and pack the 64 bits as
    two bigints (bits 0-31 -> hi word, 32-63 -> lo word) so the value
    stays signed-int64-safe in Spark AND the SQL oracle. Integer-only,
    so identical pixels always produce identical hashes."""
    w, h, _depth, ctype, px = decode_png_pixels(payload)
    if ctype != 0:
        raise ValueError("ahash supports grayscale PNGs")
    samples = [px[((r * h) // 8) * w + ((c * w) // 8)] for r in range(8) for c in range(8)]
    mean = sum(samples) // 64
    hi = sum((1 << k) for k in range(32) if samples[k] >= mean)
    lo = sum((1 << k) for k in range(32) if samples[k + 32] >= mean)
    return hi, lo


def ahash_png_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas over (doc_id, payload) → (doc_id, ahash_hi, ahash_lo)
    via the real decode + average-hash."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            hi, lo = ahash_png(bytes(payload))
            rows.append((int(doc_id), hi, lo))
        yield pd.DataFrame(rows, columns=["doc_id", "ahash_hi", "ahash_lo"])
