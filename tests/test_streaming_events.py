"""Watermarked streaming window aggregation (crawler_spark/streaming/events.py).

Proves, with a deterministic availableNow drain:
1. closed windows emit exactly the batch aggregates (batch plan = oracle),
2. an event older than the watermark is DROPPED (its already-closed window
   does not change),
3. a late-but-in-watermark event still lands in its (open) window.
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from crawler_spark.streaming.events import run_streaming_window, windowed_event_counts

BASE = dt.datetime(2026, 1, 1, 0, 0, 0)


def _ev(event_id: int, minutes: float, etype: str, value: float):
    return {
        "event_id": event_id,
        "ts": BASE + dt.timedelta(minutes=minutes),
        "user_id": event_id % 7,
        "event_type": etype,
        "value": value,
        "props": "{}",
    }


_SCHEMA = pa.schema(
    [
        pa.field("event_id", pa.int64()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("user_id", pa.int64()),
        pa.field("event_type", pa.string()),
        pa.field("value", pa.float64()),
        pa.field("props", pa.string()),
    ]
)


def _write(path: str, name: str, rows: list[dict], order: int) -> None:
    os.makedirs(path, exist_ok=True)
    f = os.path.join(path, name)
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    pq.write_table(pa.table(cols, schema=_SCHEMA), f)
    t = time.time() + order * 2  # file-source processes in mtime order
    os.utime(f, (t, t))


def test_watermarked_streaming_window(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "ev"), str(tmp_path / "ck")

    h0 = [_ev(1, 5, "click", 1.0), _ev(2, 20, "click", 2.5), _ev(3, 40, "view", 0.5)]
    h1 = [_ev(4, 65, "click", 1.5), _ev(5, 110, "view", 3.0)]
    h2 = [_ev(6, 125, "click", 2.0)]
    stale_h0 = _ev(7, 10, "click", 99.0)  # > watermark behind → dropped
    late_h2 = _ev(8, 130, "view", 1.0)  # within watermark → counted
    h3 = [_ev(9, 185, "click", 4.0)]
    h4_closer = [_ev(10, 290, "view", 0.25)]  # pushes watermark past H2/H3

    _write(in_dir, "f1.parquet", h0 + h1, 0)
    _write(in_dir, "f2.parquet", h2, 1)
    _write(in_dir, "f3.parquet", [stale_h0, late_h2], 2)
    _write(in_dir, "f4.parquet", h3 + h4_closer, 3)

    q = run_streaming_window(spark, in_dir, ckpt, watermark="10 minutes")
    q.awaitTermination(180)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value_cents"])
        for r in spark.sql("SELECT * FROM windowed_events").collect()
    }

    # batch oracle over exactly the non-dropped events
    kept = h0 + h1 + h2 + [late_h2] + h3 + h4_closer
    batch = spark.createDataFrame([tuple(r.values()) for r in kept], schema=_SCHEMA.names)
    batch = batch.withColumn("ts", batch["ts"].cast("timestamp"))
    expect_all = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value_cents"])
        for r in windowed_event_counts(batch).collect()
    }
    h4_start = BASE + dt.timedelta(hours=4)
    expect_closed = {k: v for k, v in expect_all.items() if k[0] < h4_start}

    assert got == expect_closed
    # the stale event really was dropped: H0/click would be 3 events with it
    assert got[(BASE, "click")] == (2, 350)
    # the in-watermark late event really landed: H2/view exists via late_h2 only
    assert got[(BASE + dt.timedelta(hours=2), "view")] == (1, 100)


def test_watermarked_streaming_sessions(spark, tmp_path):
    """Session windows under a watermark: closed sessions emit exactly the
    batch twin's rows, an in-watermark straggler EXTENDS its open session,
    and a sub-watermark straggler is dropped. Spark's late filter uses the
    watermark in effect at the BATCH START (one batch lagged from the data
    that advanced it), so the stale row arrives two batches after the
    closer that moved the watermark past it."""
    from crawler_spark.streaming.events import (
        run_streaming_sessions,
        sessionized_event_counts,
    )

    in_dir, ckpt = str(tmp_path / "sev"), str(tmp_path / "sck")

    # u1: session A (0,10 -> end 40), session B (120); u2: one session (60)
    f1 = [_ev(1, 0, "click", 1.0), _ev(2, 10, "click", 1.0),
          _ev(3, 60, "view", 1.0), _ev(4, 120, "click", 1.0)]
    f1 = [dict(r, user_id=u) for r, u in zip(f1, (1, 1, 2, 1))]
    # watermark at f2's start = 120 - 10 = 110
    late_ok = dict(_ev(5, 125, "click", 1.0), user_id=1)   # >= 110: extends B
    closer = dict(_ev(6, 600, "view", 1.0), user_id=3)     # wm -> 590 next
    f3 = [dict(_ev(7, 700, "view", 1.0), user_id=3)]       # wm 590 in effect
    stale = [dict(_ev(8, 5, "click", 99.0), user_id=1)]    # 585 min late: dropped

    _write(in_dir, "s1.parquet", f1, 0)
    _write(in_dir, "s2.parquet", [late_ok, closer], 1)
    _write(in_dir, "s3.parquet", f3, 2)
    _write(in_dir, "s4.parquet", stale, 3)

    q = run_streaming_sessions(spark, in_dir, ckpt)
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sessionized_events").collect()
    }
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in (p["stateOperators"] or [])
    )
    assert dropped >= 1  # the stale row hit the watermark filter

    # batch twin over the non-dropped events, restricted to sessions the
    # final watermark (700 - 10 = 690 min) actually closed
    import pandas as pd

    kept = pd.DataFrame(f1 + [late_ok, closer] + f3)
    batch = sessionized_event_counts(spark.createDataFrame(kept))
    wm_final = BASE + dt.timedelta(minutes=690)
    expected = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in batch.collect()
        if r["session_end"] <= wm_final
    }
    assert got == expected
    # the in-watermark straggler really extended session B (2 events, +30min end)
    assert got[(1, BASE + dt.timedelta(minutes=120), BASE + dt.timedelta(minutes=155))] == 2
    # u3's 700-min session is still open (watermark never passed its end)
    assert (3, BASE + dt.timedelta(minutes=700), BASE + dt.timedelta(minutes=730)) not in got


def test_watermarked_streaming_dedup(spark, tmp_path):
    """dropDuplicatesWithinWatermark semantics pinned: duplicates inside
    the watermark are dropped across micro-batches; once the watermark
    passes a key's eviction point its state is GONE, so a very-late
    replay of the same event_id is re-admitted — the bounded-state trade
    the batch dropDuplicates oracle never makes."""
    from crawler_spark.streaming.events import dedup_events, run_streaming_dedup

    in_dir, ckpt = str(tmp_path / "ev"), str(tmp_path / "ck")

    first = _ev(1, 5, "click", 1.0)
    peer = _ev(2, 6, "view", 2.0)
    dup_in_batch = dict(first)               # same event_id, same micro-batch
    dup_next_batch = dict(first)             # same event_id, next micro-batch
    closer = _ev(3, 300, "click", 0.5)       # pushes watermark far past id=1
    spacer = _ev(4, 310, "view", 0.1)        # state eviction uses the watermark
    # computed from data through the PREVIOUS batch, so one more batch must
    # pass before id=1's entry (expiry 15 min << 290/300) is actually gone
    # id=1 again with a FRESH in-watermark ts: its dedup state was evicted,
    # so it is re-admitted — a same-key event with a STALE ts would instead
    # be dropped as late data by the watermark operator itself (both are
    # bounded-state trades the batch twin never makes)
    replay_after_evict = _ev(1, 295, "click", 1.0)
    stale_replay = dict(first)               # id=1, ts=5min << watermark: late-dropped

    _write(in_dir, "f1.parquet", [first, peer, dup_in_batch], 0)
    _write(in_dir, "f2.parquet", [dup_next_batch], 1)
    _write(in_dir, "f3.parquet", [closer], 2)
    _write(in_dir, "f4.parquet", [spacer], 3)
    _write(in_dir, "f5.parquet", [replay_after_evict, stale_replay], 4)

    q = run_streaming_dedup(spark, in_dir, ckpt, watermark="10 minutes")
    q.awaitTermination(180)

    got = [
        (r["event_id"], r["event_type"])
        for r in spark.sql("SELECT * FROM deduped_events ORDER BY ts, event_id").collect()
    ]
    # in-watermark duplicates (same batch AND next batch) deduped; the
    # stale replay late-dropped; the fresh-ts post-eviction replay re-admitted
    assert got == [(1, "click"), (2, "view"), (1, "click"), (3, "click"), (4, "view")]

    # batch twin on the same rows: exact dedup — no eviction, no re-admit
    rows = [first, peer, dup_in_batch, dup_next_batch, closer, spacer,
            replay_after_evict, stale_replay]
    batch = spark.createDataFrame([tuple(r.values()) for r in rows], schema=_SCHEMA.names)
    batch = batch.withColumn("ts", batch["ts"].cast("timestamp"))
    ids = sorted(r["event_id"] for r in dedup_events(batch).collect())
    assert ids == [1, 2, 3, 4]
