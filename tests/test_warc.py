"""WARC export structure tests (S11, src/WarcDocument.hs:17-45 parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.schema import CRAWLED_DOCS
from crawler_spark.warc import to_warc_records


def test_warc_record_structure(spark):
    rows = [
        (
            "http://h/orig",
            "http://h/final",
            ["http://h/final", "http://h/mid", "http://h/orig"],
            [
                {"kind": "text", "text": "hello world", "media_ref": None, "offset": 1},
                {"kind": "text", "text": "first", "media_ref": None, "offset": 0},
                {"kind": "media", "text": None, "media_ref": "http://h/m.bin", "offset": 2},
            ],
            0,
            1,
        )
    ]
    df = spark.createDataFrame(rows, CRAWLED_DOCS)
    rec = to_warc_records(df).collect()[0]["warc_record"]
    body = "first\nhello world\nhttp://h/m.bin"
    # record-id & target-URI = chain LAST = originally requested URL
    # (src/WarcDocument.hs:27)
    assert "WARC-Target-URI: http://h/orig\r\n" in rec
    assert "WARC/1.0\r\n" in rec and "WARC-Type: response\r\n" in rec
    assert f"Content-Length: {len(body)}\r\n" in rec
    assert rec.endswith("\r\n\r\n" + body + "\r\n\r\n") or body in rec
    # body spans render in offset order
    assert rec.index("first") < rec.index("hello world") < rec.index("m.bin")


def test_warc_export_roundtrip(spark, tmp_path):
    from crawler_spark.warc import export_warc

    rows = [
        ("http://h/a", "http://h/a", ["http://h/a"],
         [{"kind": "text", "text": "A", "media_ref": None, "offset": 0}], 0, 1),
        ("http://h/b", "http://h/b", ["http://h/b"],
         [{"kind": "text", "text": "B", "media_ref": None, "offset": 0}], 0, 2),
    ]
    df = spark.createDataFrame(rows, CRAWLED_DOCS)
    out = str(tmp_path / "warc")
    export_warc(df, out)
    text = "\n".join(
        r["value"] for r in spark.read.text(out).collect()
    )
    assert text.count("WARC/1.0") == 2
    assert "WARC-Target-URI: http://h/a" in text and "WARC-Target-URI: http://h/b" in text
