"""Generic CEP sequence matcher: operators/cep.py + streaming/cep.py.

Covers: batch lead-chain == vectorized pandas twin on real fixture data
(both stock patterns), single-exchange plan shape, streaming parity with
cross-flush carry and beyond-watermark drops (both row shapes through
ONE handler factory), and kill-resume exactly-once (W7)."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from data_harvesting_spark.config import HarvestConfig
from data_harvesting_spark.generator import write_parquet_us
from tests.conftest import SF_ORACLE, SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _cfg(tmp: str, **kw) -> HarvestConfig:
    defaults = dict(
        session_gap="30 minutes",
        watermark_delay="10 minutes",
        sink_format="epoch",
        sink_path=os.path.join(tmp, "matches"),
        checkpoint_dir=os.path.join(tmp, "ckpt"),
    )
    defaults.update(kw)
    return HarvestConfig(**defaults)


# --------------------------------------------------- batch == pandas twin
def test_seq_match_batch_equals_pandas_twin_dialog(spark):
    """The Spark lead-chain and the handler's vectorized pandas matcher
    produce identical match sets for the dialog pattern over the real
    smoke fixture — the twin contract the streaming handler relies on."""
    from data_harvesting_spark.derive import load_transcripts_from_events
    from data_harvesting_spark.operators.cep import (
        DIALOG_TRIPLE,
        seq_match,
        seq_match_pdf,
    )

    t = load_transcripts_from_events(spark, SF_SMOKE)
    got = seq_match(t, ["conv_id"], ["turn_idx"], DIALOG_TRIPLE).toPandas()
    pdf = t.toPandas().sort_values(["conv_id", "turn_idx"])
    frames = []
    for cid, g in pdf.groupby("conv_id"):
        m = seq_match_pdf(g.reset_index(drop=True), DIALOG_TRIPLE)
        if len(m):
            m = m.drop(columns=["_start"])
            m.insert(0, "conv_id", cid)
            frames.append(m)
    want = pd.concat(frames, ignore_index=True)
    cols = ["conv_id", "s0_idx", "s1_idx", "s2_idx", "tool"]
    to64 = {c: "int64" for c in ("s0_idx", "s1_idx", "s2_idx")}
    gset = set(map(tuple, got[cols].astype(to64).to_numpy()))
    wset = set(map(tuple, want[cols].astype(to64).to_numpy()))
    assert len(got) == len(want) > 0
    assert gset == wset


def test_seq_match_batch_equals_pandas_twin_burst(spark):
    """Same twin contract for the time-bounded burst pattern over the
    real events fixture (exercises the within_us span on both sides)."""
    from data_harvesting_spark.operators.cep import (
        CONVERSION_BURST,
        seq_match,
        seq_match_pdf,
    )

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    got = seq_match(
        ev, ["user_id"], ["ts", "event_id"], CONVERSION_BURST
    ).toPandas()
    pdf = ev.toPandas().sort_values(["user_id", "ts", "event_id"])
    frames = []
    for uid, g in pdf.groupby("user_id"):
        m = seq_match_pdf(g.reset_index(drop=True), CONVERSION_BURST)
        if len(m):
            m = m.drop(columns=["_start"])
            m.insert(0, "user_id", uid)
            frames.append(m)
    want = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame(
            columns=[
                "user_id", "s0_event_id", "s1_event_id", "s2_event_id",
                "span_us",
            ]
        )
    )
    cols = ["user_id", "s0_event_id", "s1_event_id", "s2_event_id", "span_us"]
    gset = set(map(tuple, got[cols].to_numpy()))
    wset = set(map(tuple, want[cols].astype("int64").to_numpy()))
    assert len(got) == len(want) > 0
    assert gset == wset


def test_seq_match_single_exchange_plan(spark):
    """Pattern length adds lead expressions, not shuffles: the whole
    match — predicates, n-1 lead chains, span bound — rides ONE
    key-hash exchange, with no join anywhere."""
    from data_harvesting_spark.plans.catalog import spark_queries

    plan = _plan(spark_queries()["pattern_seq_conversion"](spark, SF_ORACLE))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


# ------------------------------------------------- streaming: dialog shape
@pytest.fixture(scope="module")
def dialog_batches(tmp_path_factory):
    """Transcript micro-batches for the dialog-triple stream: a complete
    in-file match written OUT of turn order (conv-p), a no-match control
    (conv-q: assistant turn has no tool), a match whose last step
    arrives AFTER the first two rows were finalized — the carry crossing
    (conv-r), and a match whose last step arrives beyond the watermark —
    dropped by the stream, present in batch (conv-x)."""
    base = pd.Timestamp("2026-07-10 00:00:00")

    def t(mins, secs=0):
        return base + pd.Timedelta(minutes=mins, seconds=secs)

    f0 = [
        # conv-p: complete match, file rows out of turn order
        ("conv-p", 2, "tool", "the report", "search", t(1)),
        ("conv-p", 0, "user", "find the report", None, t(0)),
        ("conv-p", 1, "assistant", "call search q1", "search", t(0, 30)),
        # conv-q: no tool on the assistant turn -> no match
        ("conv-q", 0, "user", "hello", None, t(0)),
        ("conv-q", 1, "assistant", "just chatting", None, t(0, 30)),
        ("conv-q", 2, "tool", "stray response", "sql", t(1)),
        # conv-r prefix: user + call; the response comes much later
        ("conv-r", 0, "user", "open the page", None, t(0)),
        ("conv-r", 1, "assistant", "call browser open", "browser", t(0, 30)),
        # conv-x prefix: user + call; response will arrive LATE
        ("conv-x", 0, "user", "fetch", None, t(0)),
        ("conv-x", 1, "assistant", "call search z", "search", t(0, 30)),
    ]
    fw = [
        # watermark driver: wm -> ~40min, finalizing every t(<=1) row,
        # so conv-r's prefix moves into the carry
        ("conv-w", 0, "user", "flush", None, t(50)),
    ]
    f2 = [
        # conv-r's response: event time AFTER the watermark (not late);
        # the match must pair with the CARRIED first two rows
        ("conv-r", 2, "tool", "page text", "browser", t(51)),
        # conv-x's response: event time t(2) << wm -> dropped + counted
        ("conv-x", 2, "tool", "stale", "search", t(2)),
    ]
    f3 = [
        # final flush: finalize conv-r's response
        ("conv-z", 0, "user", "flush 2", None, t(720)),
    ]
    d = tmp_path_factory.mktemp("dialog_src")
    now = time.time()
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    for i, rows in enumerate([f0, fw, f2, f3]):
        pdf = pd.DataFrame(rows, columns=cols)
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        p = str(d / f"f{i}.parquet")
        write_parquet_us(pdf, p)
        os.utime(p, (now + i, now + i))
    return str(d)


def _dialog_batch_reference(spark, source_dir: str) -> pd.DataFrame:
    from data_harvesting_spark.operators.cep import DIALOG_TRIPLE, seq_match
    from data_harvesting_spark.schema import TRANSCRIPT_SCHEMA

    t = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(source_dir + "/*.parquet")
    return seq_match(t, ["conv_id"], ["turn_idx"], DIALOG_TRIPLE).toPandas()


def _canon(pdf: pd.DataFrame, sort: list[str]) -> pd.DataFrame:
    out = pdf.sort_values(sort).reset_index(drop=True)
    for c in out.columns:
        if str(out[c].dtype).startswith("int"):
            out[c] = out[c].astype("int64")
    return out.reindex(sorted(out.columns), axis=1)


def test_seq_stream_dialog_equals_batch(spark, dialog_batches, tmp_path):
    """Stream matches == batch lead-chain matches: in-file match,
    carry-crossing match, late last step dropped and counted."""
    from data_harvesting_spark.streaming.pipeline import (
        drain,
        start_seq_pattern_stream_job,
    )
    from data_harvesting_spark.streaming.sink import read_epoch_sink

    cfg = _cfg(str(tmp_path))
    q = start_seq_pattern_stream_job(
        spark, dialog_batches, cfg, available_now=False
    )
    drain(q)
    engine_dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in (p.get("stateOperators") or [])
    )
    late_dropped = q.late_counter.value + engine_dropped
    got = read_epoch_sink(spark, cfg.sink_path).toPandas()
    want = _dialog_batch_reference(spark, dialog_batches)

    expect = {
        ("conv-p", 0, 1, 2, "search"),
        ("conv-r", 0, 1, 2, "browser"),
    }
    cols = ["conv_id", "s0_idx", "s1_idx", "s2_idx", "tool"]
    to64 = {c: "int64" for c in ("s0_idx", "s1_idx", "s2_idx")}
    assert set(
        map(tuple, want[want["conv_id"] != "conv-x"][cols].astype(to64).to_numpy())
    ) == expect
    # batch sees conv-x's late response; the stream must have dropped it
    assert ("conv-x" == want["conv_id"]).sum() == 1
    assert "conv-x" not in set(got["conv_id"])
    assert late_dropped >= 1
    pd.testing.assert_frame_equal(
        _canon(got, ["conv_id"]),
        _canon(want[want["conv_id"] != "conv-x"], ["conv_id"]),
    )


def test_seq_stream_dialog_kill_and_resume(spark, dialog_batches, tmp_path):
    """W7: kill mid-stream, resume from checkpoint — same match set, no
    duplicates."""
    from data_harvesting_spark.streaming.pipeline import (
        drain,
        start_seq_pattern_stream_job,
    )
    from data_harvesting_spark.streaming.sink import read_epoch_sink

    cfg = _cfg(str(tmp_path))
    q = start_seq_pattern_stream_job(
        spark, dialog_batches, cfg, available_now=False
    )
    deadline = time.time() + 60
    while time.time() < deadline:
        if sum(p["numInputRows"] > 0 for p in q.recentProgress) >= 2:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()

    q2 = start_seq_pattern_stream_job(
        spark, dialog_batches, cfg, available_now=False
    )
    drain(q2)
    got = read_epoch_sink(spark, cfg.sink_path).toPandas()
    want = _dialog_batch_reference(spark, dialog_batches)
    pd.testing.assert_frame_equal(
        _canon(got, ["conv_id"]),
        _canon(want[want["conv_id"] != "conv-x"], ["conv_id"]),
    )


# -------------------------------------------------- streaming: event shape
@pytest.fixture(scope="module")
def burst_batches(tmp_path_factory):
    """Event micro-batches for the conversion-burst stream: an in-file
    triple (u1), contiguity control — view,view,click,purchase matches
    only at the SECOND view (u2), an over-24h span excluded by within_us
    (u3), a carry-crossing triple whose purchase arrives after view+click
    finalized (u4), and a beyond-watermark purchase (u5: batch-only)."""
    base = pd.Timestamp("2026-06-01 00:00:00")

    def ev(eid, uid, typ, secs):
        return (eid, base + pd.Timedelta(seconds=secs), uid, typ, 1.0, "{}")

    f0 = [
        ev(1, 1, "view", 0),
        ev(2, 1, "click", 60),
        ev(3, 1, "purchase", 120),
        ev(10, 2, "view", 0),
        ev(11, 2, "view", 30),
        ev(12, 2, "click", 60),
        ev(13, 2, "purchase", 90),
        ev(20, 3, "view", 0),
        ev(21, 3, "click", 60),
        ev(30, 4, "view", 0),
        ev(31, 4, "click", 60),
        ev(40, 5, "view", 0),
        ev(41, 5, "click", 60),
    ]
    fw = [
        # watermark driver: wm -> ~50min, finalizing all t<=120s rows
        ev(90, 9, "view", 3600),
    ]
    f2 = [
        # u4's purchase: event time past the wm -> pairs with the CARRY
        ev(32, 4, "purchase", 3660),
        # u5's purchase: event time 120s << wm -> dropped by the stream
        ev(42, 5, "purchase", 120),
    ]
    f3 = [
        # u3's purchase lands 25h after its view: contiguous triple, but
        # the 24h span bound excludes it in BOTH engines (arrives last so
        # its event time cannot drag the watermark over earlier files)
        ev(22, 3, "purchase", 25 * 3600),
        ev(91, 9, "view", 48 * 3600),
    ]
    d = tmp_path_factory.mktemp("burst_src")
    now = time.time()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for i, rows in enumerate([f0, fw, f2, f3]):
        pdf = pd.DataFrame(rows, columns=cols)
        p = str(d / f"f{i}.parquet")
        write_parquet_us(pdf, p)
        os.utime(p, (now + i, now + i))
    return str(d)


def _burst_batch_reference(spark, source_dir: str) -> pd.DataFrame:
    from data_harvesting_spark.operators.cep import (
        CONVERSION_BURST,
        seq_match,
    )
    from data_harvesting_spark.schema import EVENT_SCHEMA

    ev = spark.read.schema(EVENT_SCHEMA).parquet(source_dir + "/*.parquet")
    return seq_match(
        ev, ["user_id"], ["ts", "event_id"], CONVERSION_BURST
    ).toPandas()


def test_seq_stream_burst_equals_batch(spark, burst_batches, tmp_path):
    """The SAME handler factory on the event shape: in-file triple,
    second-view contiguity, span bound, carry crossing, late drop."""
    from data_harvesting_spark.streaming.pipeline import (
        drain,
        start_burst_pattern_stream_job,
    )
    from data_harvesting_spark.streaming.sink import read_epoch_sink

    sink = str(tmp_path / "bsink")
    q = start_burst_pattern_stream_job(
        spark, burst_batches, sink, str(tmp_path / "bckpt"),
        available_now=False,
    )
    drain(q)
    engine_dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in (p.get("stateOperators") or [])
    )
    late_dropped = q.late_counter.value + engine_dropped
    got = read_epoch_sink(spark, sink).toPandas()
    want = _burst_batch_reference(spark, burst_batches)

    expect = {
        (1, 1, 2, 3, 120_000_000),
        (2, 11, 12, 13, 60_000_000),
        (4, 30, 31, 32, 3_660_000_000),
    }
    cols = ["user_id", "s0_event_id", "s1_event_id", "s2_event_id", "span_us"]
    assert set(
        map(tuple, want[want["user_id"] != 5][cols].astype("int64").to_numpy())
    ) == expect
    # batch pairs u5's late purchase; the stream must have dropped it
    assert (want["user_id"] == 5).sum() == 1
    assert 5 not in set(got["user_id"])
    assert late_dropped >= 1
    pd.testing.assert_frame_equal(
        _canon(got, ["user_id", "s0_event_id"]),
        _canon(want[want["user_id"] != 5], ["user_id", "s0_event_id"]),
    )


def test_seq_stream_burst_kill_and_resume(spark, burst_batches, tmp_path):
    """W7 on the event shape."""
    from data_harvesting_spark.streaming.pipeline import (
        drain,
        start_burst_pattern_stream_job,
    )
    from data_harvesting_spark.streaming.sink import read_epoch_sink

    sink = str(tmp_path / "bsink")
    ckpt = str(tmp_path / "bckpt")
    q = start_burst_pattern_stream_job(
        spark, burst_batches, sink, ckpt, available_now=False
    )
    deadline = time.time() + 60
    while time.time() < deadline:
        if sum(p["numInputRows"] > 0 for p in q.recentProgress) >= 2:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()

    q2 = start_burst_pattern_stream_job(
        spark, burst_batches, sink, ckpt, available_now=False
    )
    drain(q2)
    got = read_epoch_sink(spark, sink).toPandas()
    want = _burst_batch_reference(spark, burst_batches)
    pd.testing.assert_frame_equal(
        _canon(got, ["user_id", "s0_event_id"]),
        _canon(want[want["user_id"] != 5], ["user_id", "s0_event_id"]),
    )
