"""WARC/1.0 export of crawled documents (S11, optional parity extra).

Reimplements the reference's WARC serialization semantics
(src/WarcDocument.hs:17-45) over the `crawled_docs` table, JVM-side:

Field-for-field against the reference's header list
(src/WarcDocument.hs:22-37):

  ver                       → "WARC/1.0" leader
  compressionMode           → Compression-Mode: uncompressed
  contentLength             → Content-Length (body bytes)
  originalContentLength     → Original-Content-Length (same — uncompressed
  uncompressedContentLength → Uncompressed-Content-Length   output path)
  warcRecordId              → WARC-Record-ID (from the *originally
                              requested* URL — chain LAST, WarcDocument.hs:27;
                              chain conventions src/Fetch.hs:40-43; rendered
                              as <urn:uuid:md5(url)> for WARC/1.0 shape)
  warcTargetURI             → WARC-Target-URI (same URL, verbatim)
  warcType                  → WARC-Type: response

plus WARC-Date and Content-Type (WARC/1.0 §4 requires them; the
reference's warc library omits them — documented addition). body = the
reference's raw page bytes ≙ our span sequence rendered deterministically
(text spans verbatim; media spans as their media_ref; forms/meta as their
payload) in offset order; record separator = CRLF CRLF.

The record column is built with Catalyst string expressions — no UDF —
and written with `spark.write.text`, one record per line-group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CRLF = "\r\n"


def _render_body(spans_col):
    """Deterministic body rendering: span payloads in offset order."""
    sorted_spans = F.array_sort(
        spans_col,
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )
    return F.concat_ws(
        "\n",
        F.transform(
            sorted_spans,
            lambda s: F.coalesce(s["text"], s["media_ref"], F.lit("")),
        ),
    )


def to_warc_records(crawled_docs: DataFrame, fetch_ts: str = "1970-01-01T00:00:00Z") -> DataFrame:
    """(url, final_url, redirect_chain, spans, round, rank_in_round) →
    (round, rank_in_round, warc_record: string)."""
    requested = F.element_at(F.col("redirect_chain"), -1)  # chain last = requested
    body = _render_body(F.col("spans"))
    blen = F.octet_length(body).cast("string")  # C8.length = bytes
    record = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("Compression-Mode: uncompressed" + _CRLF),
        F.lit("Content-Length: "), blen, F.lit(_CRLF),
        F.lit("Original-Content-Length: "), blen, F.lit(_CRLF),
        F.lit("Uncompressed-Content-Length: "), blen, F.lit(_CRLF),
        F.lit("WARC-Record-ID: <urn:uuid:"),
        F.md5(requested),  # deterministic id from the requested URL
        F.lit(">" + _CRLF),
        F.lit("WARC-Target-URI: "),
        requested,
        F.lit(_CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.lit(f"WARC-Date: {fetch_ts}" + _CRLF),
        F.lit("Content-Type: application/http; msgtype=response" + _CRLF),
        F.lit(_CRLF),
        body,
        F.lit(_CRLF + _CRLF),
    )
    return crawled_docs.select("round", "rank_in_round", record.alias("warc_record"))


def export_warc(crawled_docs: DataFrame, out_dir: str) -> None:
    """Write one WARC text part per partition (the reference writes one
    file; a distributed export shards — concatenate parts for a single
    file, order by (round, rank_in_round))."""
    to_warc_records(crawled_docs).orderBy("round", "rank_in_round").select(
        "warc_record"
    ).write.mode("overwrite").text(out_dir)
