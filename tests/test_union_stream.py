"""Multi-source union ingestion (`start_union_rates_job`): each source
carries its own event-time watermark and Spark's global watermark is
their MINIMUM. Pins (a) the min-watermark holdback — a window stays open
while any source lags behind it, even though the other source is far
past — and (b) completeness + cross-source count merging once every
source advances: parity with the batch aggregate over the concatenated
inputs.
"""

from __future__ import annotations

import os as _os
import time as _time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.test_streaming import _cfg, write_parquet_us

BASE = pd.Timestamp("2026-06-01 10:00:00")


def _turn(conv, idx, tool, mins):
    return (conv, idx, "assistant", f"call {tool}", tool,
            BASE + pd.Timedelta(minutes=mins))


COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _write_source(d, batches):
    now = _time.time()
    for i, rows in enumerate(batches):
        p = str(d / f"f{i}.parquet")
        write_parquet_us(pd.DataFrame(rows, columns=COLS), p)
        _os.utime(p, (now + i, now + i))
    return str(d)


@pytest.fixture()
def lagging_sources(tmp_path):
    """Source A: window-1 turns + a far-future sentinel (A's watermark
    races ahead). Source B: window-1 turns only — B's watermark never
    passes window-1's end under the 10-minute delay."""
    a = tmp_path / "src_a"
    b = tmp_path / "src_b"
    a.mkdir()
    b.mkdir()
    _write_source(a, [
        [_turn("a1", 0, "search", 5), _turn("a1", 1, "search", 20)],
        [_turn("a-sent", 0, "flush", 60 * 10)],     # 20:00 sentinel
    ])
    _write_source(b, [
        [_turn("b1", 0, "search", 10), _turn("b1", 1, "calc", 40)],
    ])
    return str(a), str(b)


def test_union_min_watermark_holds_window_open(spark, lagging_sources, tmp_path):
    """A alone would close 10:00-11:00 (its sentinel is hours past); the
    union must NOT, because B's watermark (max 10:40 − 10 min = 10:30)
    has not crossed 11:00. No rows may emit."""
    from data_harvesting_spark.streaming.pipeline import (
        drain,
        start_union_rates_job,
    )

    src_a, src_b = lagging_sources
    cfg = _cfg(str(tmp_path))
    sink = str(tmp_path / "usink")
    q = start_union_rates_job(
        spark, [src_a, src_b], cfg, sink, str(tmp_path / "uckpt"),
        available_now=False,
    )
    drain(q)
    emitted = [
        f for f in _os.listdir(sink) if f.startswith("_epoch=")
    ] if _os.path.isdir(sink) else []
    rows = []
    if emitted:
        from data_harvesting_spark.streaming.sink import read_epoch_sink

        rows = read_epoch_sink(spark, sink).collect()
    assert rows == []  # the lagging source holds EVERY window open

    # control: the same job over source A alone DOES close window 1 —
    # proving the union's silence above is the min-watermark, not a bug
    sink2 = str(tmp_path / "usink_a")
    q2 = start_union_rates_job(
        spark, [src_a], cfg, sink2, str(tmp_path / "uckpt_a"),
        available_now=False,
    )
    drain(q2)
    from data_harvesting_spark.streaming.sink import read_epoch_sink

    got = {(r.window_start, r.tool, r.turn_count)
           for r in read_epoch_sink(spark, sink2).collect()}
    w1 = BASE.to_pydatetime().replace(minute=0)
    assert (w1, "search", 2) in got


def test_union_completeness_and_cross_source_merge(spark, tmp_path):
    """Once BOTH sources carry sentinels, every real window closes and
    per-(window, tool) counts merge across sources — equal to the batch
    aggregate over the concatenated files."""
    from data_harvesting_spark.schema import TRANSCRIPT_SCHEMA
    from data_harvesting_spark.streaming.pipeline import (
        drain,
        start_union_rates_job,
    )
    from data_harvesting_spark.streaming.sink import read_epoch_sink

    a = tmp_path / "m_src_a"
    b = tmp_path / "m_src_b"
    a.mkdir()
    b.mkdir()
    _write_source(a, [
        [_turn("a1", 0, "search", 5), _turn("a1", 1, "calc", 70)],
        [_turn("a-sent", 0, "flush", 60 * 10)],
    ])
    _write_source(b, [
        [_turn("b1", 0, "search", 15), _turn("b1", 1, "search", 75)],
        [_turn("b-sent", 0, "flush", 60 * 10 + 1)],
    ])
    cfg = _cfg(str(tmp_path))
    sink = str(tmp_path / "msink")
    q = start_union_rates_job(
        spark, [str(a), str(b)], cfg, sink, str(tmp_path / "mckpt"),
        available_now=False,
    )
    drain(q)
    got = {
        (r.window_start, r.tool, r.turn_count)
        for r in read_epoch_sink(spark, sink).collect()
        if r.tool != "flush"
    }
    t = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(
        str(a) + "/*.parquet", str(b) + "/*.parquet"
    )
    want = {
        (r.w.start, r.tool, r.turn_count)
        for r in t.where(F.col("tool").isNotNull() & (F.col("tool") != "flush"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "tool")
        .agg(F.count("*").alias("turn_count"))
        .collect()
    }
    assert got == want
    # the first window's 'search' count is genuinely cross-source (1+1)
    w1 = BASE.to_pydatetime().replace(minute=0)
    assert (w1, "search", 2) in got


def test_union_source_split_invariance(spark, tmp_path):
    """W3 for multi-source ingestion: HOW rows are split across sources
    must not change the result — the same turn set divided two different
    ways (and with different per-source arrival order) produces the
    identical windowed aggregate."""
    from data_harvesting_spark.streaming.pipeline import (
        drain,
        start_union_rates_job,
    )
    from data_harvesting_spark.streaming.sink import read_epoch_sink

    turns = [
        _turn("c1", 0, "search", 5), _turn("c1", 1, "calc", 20),
        _turn("c2", 0, "search", 35), _turn("c2", 1, "calc", 75),
        _turn("c3", 0, "search", 80),
    ]
    sent_a = _turn("s-a", 0, "flush", 60 * 10)
    sent_b = _turn("s-b", 0, "flush", 60 * 10 + 1)

    results = []
    for tag, (rows_a, rows_b) in {
        "split1": ([turns[0], turns[2], turns[4]], [turns[1], turns[3]]),
        "split2": ([turns[3], turns[1]], [turns[4], turns[0], turns[2]]),
    }.items():
        a = tmp_path / f"{tag}_a"
        b = tmp_path / f"{tag}_b"
        a.mkdir()
        b.mkdir()
        _write_source(a, [rows_a, [sent_a]])
        _write_source(b, [rows_b, [sent_b]])
        cfg = _cfg(str(tmp_path / tag))
        sink = str(tmp_path / f"{tag}_sink")
        q = start_union_rates_job(
            spark, [str(a), str(b)], cfg, sink,
            str(tmp_path / f"{tag}_ckpt"), available_now=False,
        )
        drain(q)
        results.append({
            (r.window_start, r.tool, r.turn_count)
            for r in read_epoch_sink(spark, sink).collect()
            if r.tool != "flush"
        })
    assert results[0] == results[1]
    assert results[0]  # non-trivial fixture
