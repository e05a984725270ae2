"""WARC/1.0 export of crawled documents (S11, optional parity extra).

Reimplements the reference's WARC serialization semantics
(src/WarcDocument.hs:17-45) over the `crawled_docs` table, JVM-side:

- WARC-Record-ID and WARC-Target-URI use the *originally requested* URL —
  the LAST element of the redirect chain (src/WarcDocument.hs:27; chain
  conventions src/Fetch.hs:40-43)
- body = the reference's raw page bytes ≙ our span sequence, rendered
  deterministically (text spans verbatim; media spans as their media_ref;
  forms/meta as their payload) in offset order
- Content-Length = byte length of the rendered body (the reference writes
  the length three ways — uncompressed/compressed/header — we emit the
  uncompressed one, matching its uncompressed output path)
- WARC-Type: response; record separator = CRLF CRLF (WARC/1.0 §4)

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
    record = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.lit("WARC-Record-ID: <urn:uuid:"),
        F.md5(requested),  # deterministic id from the requested URL
        F.lit(">" + _CRLF),
        F.lit("WARC-Target-URI: "),
        requested,
        F.lit(_CRLF),
        F.lit(f"WARC-Date: {fetch_ts}" + _CRLF),
        F.lit("Content-Type: application/http; msgtype=response" + _CRLF),
        F.lit("Content-Length: "),
        F.length(body).cast("string"),
        F.lit(_CRLF + _CRLF),
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
