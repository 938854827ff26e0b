"""Streaming semantics: batch/stream parity, exactly-once, kill-resume."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from data_harvesting_spark.config import HarvestConfig
from data_harvesting_spark.generator import (
    generate_transcripts,
    write_batches,
    write_parquet_us,
)

CANON = ["conv_id", "window_start", "example_idx"]


def _cfg(tmp: str, **kw) -> HarvestConfig:
    defaults = dict(
        session_gap="30 minutes",
        watermark_delay="10 minutes",
        sink_format="epoch",
        sink_path=os.path.join(tmp, "curated"),
        checkpoint_dir=os.path.join(tmp, "ckpt"),
    )
    defaults.update(kw)
    return HarvestConfig(**defaults)


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        pdf.sort_values(CANON)
        .reset_index(drop=True)
        .reindex(sorted(pdf.columns), axis=1)
    )


@pytest.fixture(scope="module")
def fixture_batches(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    paths = write_batches(str(d), n_convs=40, seed=7, n_batches=6)
    # flush slice: one far-future dummy row pushes the watermark past every
    # session gap so buffered sessions close deterministically
    df = generate_transcripts(n_convs=40, seed=7)
    flush = df.iloc[:1].copy()
    flush["conv_id"] = "conv-flush"
    flush["ts"] = df["ts"].max() + pd.Timedelta(hours=6)
    flush["role"] = "user"
    # non-null tool: a watermark-driving row must survive scan-level
    # predicate pushdown — an all-null `tool` file is skipped entirely by
    # the rates job's IsNotNull(tool) row-group filter, so its event time
    # would never reach the watermark operator and the last windows would
    # never close (see start_rates_job docstring)
    flush["tool"] = "flush"
    p = os.path.join(str(d), "zz-flush.parquet")
    write_parquet_us(flush, p)
    return str(d)


def _batch_reference(spark, source_dir: str, cfg: HarvestConfig) -> pd.DataFrame:
    from data_harvesting_spark.operators.curate_sessions import curate_sessions
    from data_harvesting_spark.schema import TRANSCRIPT_SCHEMA

    t = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(source_dir + "/*.parquet")
    out = curate_sessions(t, cfg).toPandas()
    return out[out["conv_id"] != "conv-flush"]


def test_stream_equals_batch(spark, fixture_batches, tmp_path):
    """north_star: streaming output == batch output on the same input."""
    from data_harvesting_spark.streaming.pipeline import (
        run_sessionized_stream_to_completion,
    )

    cfg = _cfg(str(tmp_path))
    got = run_sessionized_stream_to_completion(
        spark, fixture_batches, cfg
    ).toPandas()
    got = got[got["conv_id"] != "conv-flush"]
    want = _batch_reference(spark, fixture_batches, cfg)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))
    assert len(got) > 0


def test_kill_and_resume_exactly_once(spark, fixture_batches, tmp_path):
    """Process N batches, stop, resume from checkpoint: final output set
    identical to the uninterrupted run (W7)."""
    from data_harvesting_spark.streaming.pipeline import start_curate_job
    from data_harvesting_spark.streaming.sink import read_epoch_sink

    cfg = _cfg(str(tmp_path))

    # phase 1: stop after ~half the files
    q = start_curate_job(spark, fixture_batches, cfg, available_now=False)
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        prog = q.recentProgress
        done = sum(p["numInputRows"] > 0 for p in prog)
        if done >= 3:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()

    # phase 2: resume from the same checkpoint, drain everything
    from data_harvesting_spark.streaming.pipeline import drain

    q2 = start_curate_job(spark, fixture_batches, cfg, available_now=False)
    drain(q2)

    got = read_epoch_sink(spark, cfg.sink_path).toPandas()
    got = got[got["conv_id"] != "conv-flush"]
    want = _batch_reference(spark, fixture_batches, cfg)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_late_beyond_watermark_dropped(spark, tmp_path):
    """A turn arriving beyond the watermark is dropped (W2/W6); within
    watermark it sorts into its session."""
    import numpy as np

    src = tmp_path / "late_src"
    src.mkdir()
    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = pd.DataFrame(
        {
            "conv_id": ["c1"] * 4,
            "turn_idx": np.array([0, 1, 2, 3], dtype="int32"),
            "role": ["user", "assistant", "tool", "assistant"],
            "text": ["q", "call search x", "result y", "done"],
            "tool": [None, "search", "search", None],
            "ts": [base, base + pd.Timedelta(seconds=10),
                   base + pd.Timedelta(seconds=20),
                   base + pd.Timedelta(seconds=30)],
        }
    )
    write_parquet_us(rows, str(src / "b0.parquet"))
    # batch 2: a duplicate-text turn arriving very late (event time far
    # before watermark) — must NOT resurrect; and a flush row
    late = pd.DataFrame(
        {
            "conv_id": ["c1", "flush"],
            "turn_idx": np.array([4, 0], dtype="int32"),
            "role": ["tool", "user"],
            "text": ["result y", "z"],
            "tool": ["search", None],
            "ts": [base - pd.Timedelta(hours=5),
                   base + pd.Timedelta(hours=12)],
        }
    )
    write_parquet_us(late, str(src / "b1.parquet"))

    from data_harvesting_spark.streaming.pipeline import (
        run_sessionized_stream_to_completion,
    )

    cfg = _cfg(str(tmp_path), watermark_delay="10 minutes")
    out = run_sessionized_stream_to_completion(spark, str(src), cfg).toPandas()
    out = out[out["conv_id"] == "c1"]
    # exactly one curated pair; the late far-past turn was dropped, so it
    # neither formed a second session nor duplicated the response
    assert len(out) == 1
    assert out.iloc[0]["call_turn_idx"] == 1
    assert out.iloc[0]["response_turn_idx"] == 2


def test_metrics_and_lineage(spark, fixture_batches, tmp_path):
    """ProgressLogger captures per-batch metrics; epoch sink records
    per-partition file lineage."""
    import json

    from data_harvesting_spark.streaming.metrics import attach_progress_logger
    from data_harvesting_spark.streaming.pipeline import (
        run_sessionized_stream_to_completion,
    )

    metrics_path = str(tmp_path / "metrics.jsonl")
    listener = attach_progress_logger(spark, metrics_path)
    try:
        cfg = _cfg(str(tmp_path))
        run_sessionized_stream_to_completion(spark, fixture_batches, cfg)
    finally:
        spark.streams.removeListener(listener)

    lines = [json.loads(l) for l in open(metrics_path)]
    progress = [l for l in lines if l["event"] == "progress"]
    assert len(progress) >= 6  # one per input slice at least
    assert any(p["numInputRows"] > 0 for p in progress)
    assert any(p["watermark"] for p in progress)

    lineage = [
        json.loads(l) for l in open(os.path.join(cfg.sink_path, "_lineage.jsonl"))
    ]
    assert {l["epoch_id"] for l in lineage} >= {0, 1, 2}
    assert any(l["n_files"] > 0 for l in lineage)


def test_rates_stream_equals_batch(spark, fixture_batches, tmp_path):
    """W4: the windowed harvest-rate stream (watermark-closed append
    windows) emits exactly the batch groupBy(window, tool) aggregate once
    input is exhausted and all windows have closed."""
    from pyspark.sql import functions as F

    from data_harvesting_spark.schema import TRANSCRIPT_SCHEMA
    from data_harvesting_spark.streaming.pipeline import drain, start_rates_job
    from data_harvesting_spark.streaming.sink import read_epoch_sink

    cfg = _cfg(str(tmp_path))
    sink = str(tmp_path / "rates")
    ckpt = str(tmp_path / "rates_ckpt")
    q = start_rates_job(
        spark, fixture_batches, cfg, sink, ckpt, window="1 hour",
        available_now=False,
    )
    drain(q)
    got = read_epoch_sink(spark, sink).toPandas()

    t = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(
        fixture_batches + "/*.parquet"
    )
    want = (
        t.where(F.col("tool").isNotNull())
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("tool").alias("key"))
        .agg(
            F.count("*").alias("turn_count"),
            F.approx_count_distinct("conv_id").alias("conv_distinct"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.lit("tool").alias("grain"),
            "key", "turn_count", "conv_distinct",
        )
        .toPandas()
    )
    # the flush heartbeat's own window can never close (nothing later
    # advances the watermark past it) — excluded on both sides
    got = got[got["key"] != "flush"]
    want = want[want["key"] != "flush"]
    key = ["window_start", "key"]
    cols = sorted(want.columns)
    got = got[cols].sort_values(key).reset_index(drop=True)
    want = want[cols].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


def test_session_window_stream_equals_kernel_batch(spark, fixture_batches, tmp_path):
    """The JVM session-window streaming runner (scale path) emits the same
    curated set as the batch kernel runner — two independent streaming
    architectures, one semantics."""
    from data_harvesting_spark.streaming.pipeline import (
        drain,
        start_curate_job_session_window,
    )
    from data_harvesting_spark.streaming.sink import read_epoch_sink

    cfg = _cfg(str(tmp_path))
    q = start_curate_job_session_window(
        spark, fixture_batches, cfg, available_now=False
    )
    drain(q)
    got = read_epoch_sink(spark, cfg.sink_path).toPandas()
    got = got[got["conv_id"] != "conv-flush"]
    want = _batch_reference(spark, fixture_batches, cfg)
    cols = [c for c in want.columns if c in set(got.columns)]
    pd.testing.assert_frame_equal(_canon(got[cols]), _canon(want[cols]))
    assert len(got) > 0


def test_session_window_kill_and_resume(spark, fixture_batches, tmp_path):
    """Kill-resume exactly-once for the session-window runner (W7): stop
    mid-stream, resume from checkpoint, final output identical to the
    uninterrupted batch reference."""
    import time

    from data_harvesting_spark.streaming.pipeline import (
        drain,
        start_curate_job_session_window,
    )
    from data_harvesting_spark.streaming.sink import read_epoch_sink

    cfg = _cfg(str(tmp_path))
    q = start_curate_job_session_window(
        spark, fixture_batches, cfg, available_now=False
    )
    deadline = time.time() + 60
    while time.time() < deadline:
        if sum(p["numInputRows"] > 0 for p in q.recentProgress) >= 3:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()

    q2 = start_curate_job_session_window(
        spark, fixture_batches, cfg, available_now=False
    )
    drain(q2)

    got = read_epoch_sink(spark, cfg.sink_path).toPandas()
    got = got[got["conv_id"] != "conv-flush"]
    want = _batch_reference(spark, fixture_batches, cfg)
    cols = [c for c in want.columns if c in set(got.columns)]
    pd.testing.assert_frame_equal(_canon(got[cols]), _canon(want[cols]))


def test_suppression_parity_across_runners(spark, fixture_batches, tmp_path):
    """With suppression on, the declarative keyed pipeline and the pandas
    kernel agree (P10 is the one genuinely sequential operator)."""
    from data_harvesting_spark.operators.curate import curate_keyed
    from data_harvesting_spark.operators.curate_sessions import curate_sessions
    from data_harvesting_spark.operators.sessionize import sessionize
    from data_harvesting_spark.schema import TRANSCRIPT_SCHEMA

    cfg = _cfg(str(tmp_path), suppress_turns_after_emit=3)
    t = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(
        fixture_batches + "/*.parquet"
    )
    want = curate_sessions(t, cfg).toPandas()

    sess = sessionize(t, gap_seconds=30 * 60).select(
        "conv_id", "window_start", "turn_idx", "role", "text", "tool", "ts"
    )
    got = curate_keyed(sess, cfg).toPandas()
    cols = ["conv_id", "window_start", "example_idx", "call_turn_idx",
            "response_turn_idx", "tool", "call_text", "response_text"]
    pd.testing.assert_frame_equal(_canon(got[cols]), _canon(want[cols]))
    assert len(got) > 0


def test_late_drop_counted_in_metrics(spark, tmp_path):
    """W6: rows dropped beyond the watermark surface in progress metrics
    (numRowsDroppedByWatermark) — the reference has no late-data concept,
    the graft must account for every dropped row."""
    import json

    import numpy as np

    from data_harvesting_spark.streaming.metrics import attach_progress_logger
    from data_harvesting_spark.streaming.pipeline import (
        run_sessionized_stream_to_completion,
    )

    src = tmp_path / "late_metrics_src"
    src.mkdir()
    base = pd.Timestamp("2026-01-01 00:00:00")
    b0 = pd.DataFrame(
        {
            "conv_id": ["c1", "c1"],
            "turn_idx": np.array([0, 1], dtype="int32"),
            "role": ["assistant", "tool"],
            "text": ["call search q", "result r"],
            "tool": ["search", "search"],
            "ts": [base, base + pd.Timedelta(seconds=10)],
        }
    )
    write_parquet_us(b0, str(src / "b0.parquet"))
    b1 = pd.DataFrame(
        {
            "conv_id": ["c1", "flush"],
            "turn_idx": np.array([2, 0], dtype="int32"),
            "role": ["tool", "user"],
            "text": ["stale", "z"],
            "tool": ["search", "go"],
            "ts": [base - pd.Timedelta(hours=9),  # far beyond watermark
                   base + pd.Timedelta(hours=12)],
        }
    )
    write_parquet_us(b1, str(src / "b1.parquet"))

    from data_harvesting_spark.streaming.pipeline import drain, start_curate_job

    cfg = _cfg(str(tmp_path), watermark_delay="10 minutes")
    q = start_curate_job(spark, str(src), cfg, available_now=False)
    drain(q)
    # kernel path: applyInPandasWithState does NOT pre-filter late rows —
    # the handler drops them and counts via the accumulator
    assert q.late_counter.value >= 1


def test_merge_sink_idempotent_replay(spark, fixture_batches, tmp_path):
    """S6/W7: the parquet-merge sink (local MERGE INTO stand-in) is
    idempotent — replaying the same batch (crash between write and
    checkpoint commit) leaves the keyed output set unchanged."""
    from data_harvesting_spark.operators.curate_sessions import curate_sessions
    from data_harvesting_spark.schema import TRANSCRIPT_SCHEMA
    from data_harvesting_spark.streaming.sink import write_merge

    cfg = _cfg(str(tmp_path), sink_format="parquet-merge")
    t = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(
        fixture_batches + "/*.parquet"
    )
    curated = curate_sessions(t, cfg)
    sink = str(tmp_path / "merged")

    write_merge(curated, 0, sink)
    once = spark.read.parquet(sink).toPandas()
    # forced replay of the same epoch, then a replay of a subset of WHOLE
    # sessions (the sink's contract: a batch carries complete sessions —
    # MERGE replaces per (conv_id, window_start)) — neither may duplicate
    # or drop rows
    write_merge(curated, 0, sink)
    some_convs = sorted(once["conv_id"].unique())[:5]
    write_merge(curated.where(curated.conv_id.isin(some_convs)), 1, sink)
    twice = spark.read.parquet(sink).toPandas()
    pd.testing.assert_frame_equal(_canon(once), _canon(twice))
    assert len(once) > 0
