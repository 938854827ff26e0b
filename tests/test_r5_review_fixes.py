"""Regression pins for the round-5 self-review fixes: stream/batch twin
exactness (_blank, _ws_tokens_py), the sft carry-retention guard on
late-only batches, payload-free as-of joins, blocklist duplicate-entry
parity across both physical paths, and the empty-graph pagerank guard."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_harvesting_spark.config import HarvestConfig
from data_harvesting_spark.operators.patterns import _blank
from data_harvesting_spark.streaming.sft import (
    _EMPTY_CARRY,
    _frames_to_state,
    _ws_tokens_py,
    make_sft_handler,
)


def test_blank_matches_sql_trim_rule():
    # Spark/DuckDB trim() strips spaces ONLY — a tab/newline-only tool
    # response is NOT blank in the batch outcome rule, so the streaming
    # twin must agree (stream==batch parity contract)
    assert _blank(None)
    assert _blank("")
    assert _blank("   ")
    assert _blank(float("nan"))
    assert not _blank("\t")
    assert not _blank("\n")
    assert not _blank(" \t ")
    assert not _blank("ok")


def test_ws_tokens_py_matches_spark(spark):
    from data_harvesting_spark.operators.aggregates import _ws_tokens

    cases = [
        "\tfoo bar", "a b", "foo\t", " foo ", "", None, "\t",
        "\n\n", "a  b\nc", "x", " \t x \t ", "a\r\nb", "plain words",
    ]
    df = spark.createDataFrame(
        [(c,) for c in cases], "text string"
    ).select("text", _ws_tokens(F.col("text")).alias("n"))
    jvm = {r["text"]: r["n"] for r in df.collect()}
    for c in cases:
        assert _ws_tokens_py(c) == jvm[c], repr(c)


class _FakeState:
    """Minimal GroupState double for direct handler-path tests."""

    def __init__(self, value, wm_ms):
        self._value = value
        self._wm_ms = wm_ms
        self.hasTimedOut = False
        self.updated = None
        self.timeout_set = None
        self.removed = False

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def getCurrentWatermarkMs(self):
        return self._wm_ms

    def update(self, v):
        self.updated = v

    def setTimeoutTimestamp(self, ms):
        self.timeout_set = ms

    def remove(self):
        self.removed = True


def test_sft_late_only_batch_keeps_carry_retention():
    # carry-only state (post-close retention) + a batch whose rows are
    # ALL late: the handler must leave the state and its retention
    # timeout untouched — resetting the timer here would evict the carry
    # at the next watermark tick and truncate a later resumption's
    # context (the exact regression the r5 cross-close fix prevents)
    cfg = HarvestConfig(
        session_gap="30 minutes",
        watermark_delay="10 minutes",
        sink_format="epoch",
        sink_path="/tmp/unused",
        checkpoint_dir="/tmp/unused-ckpt",
    )
    handler = make_sft_handler(cfg)
    carry = pd.DataFrame(
        {
            "c_idx": pd.array([4, 5], dtype="int32"),
            "c_role": ["user", "assistant"],
            "c_text": ["q", "a"],
        }
    )
    empty_buf = pd.DataFrame(
        {
            "conv_id": pd.Series([], dtype="object"),
            "turn_idx": pd.Series([], dtype="int64"),
            "role": pd.Series([], dtype="object"),
            "text": pd.Series([], dtype="object"),
            "ts": pd.Series([], dtype="datetime64[us]"),
        }
    )
    state = _FakeState(_frames_to_state(empty_buf, carry), wm_ms=10_000_000)
    late = pd.DataFrame(
        {
            "conv_id": ["c1"],
            "turn_idx": [6],
            "role": ["user"],
            "text": ["too late"],
            "ts": pd.to_datetime([1_000], unit="ms").astype("datetime64[us]"),
        }
    )
    out = list(handler(("c1",), iter([late]), state))
    assert out == []
    assert state.updated is None
    assert state.timeout_set is None
    assert not state.removed


def test_asof_join_payload_free_right(spark):
    from data_harvesting_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("u1", 100), ("u1", 250), ("u2", 50)], "user_id string, ts long"
    ).select("user_id", F.timestamp_micros(F.col("ts") * 1000000).alias("ts"))
    right = spark.createDataFrame(
        [("u1", 90), ("u1", 200)], "user_id string, ts long"
    ).select("user_id", F.timestamp_micros(F.col("ts") * 1000000).alias("ts"))
    # right carries only key+ts: no payload columns — must not raise
    out = asof_join(left, right, on=["user_id"]).toPandas()
    got = {
        (r.user_id, r.ts.timestamp()): (
            None if pd.isna(r.asof_ts) else r.asof_ts.timestamp()
        )
        for r in out.itertuples()
    }
    assert got == {
        ("u1", 100.0): 90.0,
        ("u1", 250.0): 200.0,
        ("u2", 50.0): None,
    }


def test_blocklist_duplicate_entries_both_paths_agree(spark):
    from data_harvesting_spark.functions.text import (
        BLOCKLIST_JOIN_THRESHOLD,
        blocklist_counts,
        blocklist_hits,
    )

    docs = spark.createDataFrame(
        [(1, "slow slow day"), (2, "all good here"), (3, "dup dup dup")],
        "doc_id long, text string",
    )
    # a list with a repeated entry, padded past the join threshold with
    # corpus-absent words so the join path is selected
    dup_words = ["slow", "slow", "dup"] + [
        f"zzpad{i}" for i in range(BLOCKLIST_JOIN_THRESHOLD + 5)
    ]
    join_path = {
        r["doc_id"]: r["n_blocked"]
        for r in blocklist_counts(docs, dup_words).collect()
    }
    expr_path = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", blocklist_hits(F.col("text"), dup_words).alias("n")
        ).collect()
    }
    # a blocklist is a set: the duplicated 'slow' counts once per
    # occurrence in BOTH physical strategies
    assert join_path == expr_path == {1: 2, 2: 0, 3: 3}


def test_tool_pagerank_empty_graph(spark, tmp_path):
    # a slice with zero tool calls: empty ranking, no ZeroDivisionError
    from data_harvesting_spark.plans import q_transcripts as qt

    events = spark.createDataFrame(
        [], qt.load_transcripts_from_events(spark, "/root/testdata/sf0.001")
        .schema
    )
    orig = qt.load_transcripts_from_events
    qt.load_transcripts_from_events = lambda *_a, **_k: events
    try:
        out = qt.q_tool_pagerank(spark, "ignored")
        assert out.columns == ["tool", "pagerank"]
        assert out.count() == 0
    finally:
        qt.load_transcripts_from_events = orig
