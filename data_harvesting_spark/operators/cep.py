"""Generic contiguous sequence-pattern matching — MATCH_RECOGNIZE-lite.

The two CEP queries the engine already ships (`operators/patterns.py`:
failure->retry, absence/timeout) are hand-built lead-window plans for
ONE pattern each. This module is the declarative generalization: a
``SeqPattern`` names an ordered list of row predicates, and
``seq_match`` finds every run of CONSECUTIVE rows (per key, in the
key's total order) where row i satisfies step 0, row i+1 step 1, …,
row i+n-1 step n-1 — the row-sequence semantics of SQL:2016
MATCH_RECOGNIZE with an all-rows, overlapping-matches contract
(every starting row is tested; matches may share rows). An optional
``within_us`` bound constrains the event-time span first→last step
(Flink CEP's ``within`` clause).

Each step carries BOTH a Spark Column builder and a vectorized pandas
predicate over the same row schema. The Column side powers the batch
plan; the pandas side powers the streaming handler
(`streaming/cep.py`), which must re-evaluate the pattern over
buffered + carried rows at watermark flushes. Defining them side by
side in one object is what keeps the twins from drifting (pinned by a
batch==pandas parity test).

Scale posture (batch): the whole match is ONE window over the key
partitioning — per-step predicates evaluate in-row (whole-stage
codegen), the n-1 ``lead`` chains share a single Exchange + Sort, and
there is no self-join anywhere, so the cost at 100 TB is one
key-hashed shuffle of the input regardless of pattern length
(plan-asserted: exactly one Exchange above the scan).

Reference analog: the detection-confidence re-check loop
(`/root/reference/services/harvest_service.py:166-214`) is the
hard-coded 2-step instance of this operator; the reference has no
generic pattern surface at all.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class SeqStep:
    """One pattern step: a row predicate in both dialects.

    ``spark``: () -> boolean Column over the input frame's columns.
    ``pdf``: DataFrame -> boolean ndarray, SAME truth table per row
    (NULL/NaN must map to False on both sides — Spark's filter drops
    null conditions, numpy has no tri-state).
    """

    name: str
    spark: Callable[[], Column]
    pdf: Callable[[pd.DataFrame], np.ndarray]


@dataclass(frozen=True)
class SeqPattern:
    """A contiguous sequence pattern.

    ``steps`` — ordered predicates, one per consecutive row.
    ``emit`` — output spec: (alias, step_j, src_col) emits the value of
    ``src_col`` at the row matched by step ``step_j``.
    ``ts_col``/``within_us`` — optional event-time span bound
    last-step ts minus first-step ts <= within_us (exact integer
    micros); when set, the match row also emits ``span_us``.
    """

    steps: tuple[SeqStep, ...]
    emit: tuple[tuple[str, int, str], ...]
    ts_col: str | None = None
    within_us: int | None = None

    def __post_init__(self):
        n = len(self.steps)
        assert n >= 1
        for _, j, _src in self.emit:
            assert 0 <= j < n, f"emit step {j} out of range"
        assert (self.ts_col is None) == (self.within_us is None)


def seq_match(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    pattern: SeqPattern,
) -> DataFrame:
    """Batch matcher: one row per match, columns = keys + emit aliases
    (+ ``span_us`` when the pattern is time-bounded). ONE window over
    the (keys, order_by) partitioning — see module docstring."""
    n = len(pattern.steps)
    src_cols = sorted(
        (
            {s for _, _, s in pattern.emit}
            | set(order_by)
            | ({pattern.ts_col} if pattern.ts_col else set())
        )
        - set(keys)  # keys are already selected; avoid duplicate names
    )
    flagged = df.select(
        *keys,
        *src_cols,
        *[
            step.spark().alias(f"_p{j}")
            for j, step in enumerate(pattern.steps)
        ],
        *(
            [
                F.unix_micros(
                    F.col(pattern.ts_col).cast("timestamp")
                ).alias("_ts_us")
            ]
            if pattern.ts_col
            else []
        ),
    )
    w = Window.partitionBy(*keys).orderBy(*order_by)

    cond = F.col("_p0")
    for j in range(1, n):
        cond = cond & F.lead(F.col(f"_p{j}"), j).over(w)
    out_cols = [
        (
            F.col(src) if j == 0 else F.lead(F.col(src), j).over(w)
        ).alias(alias)
        for alias, j, src in pattern.emit
    ]
    extra = []
    if pattern.ts_col:
        span = (
            (
                F.col("_ts_us")
                if n == 1
                else F.lead(F.col("_ts_us"), n - 1).over(w)
            )
            - F.col("_ts_us")
        ).cast("bigint")
        cond = cond & (span <= F.lit(pattern.within_us))
        extra = [span.alias("span_us")]
    return (
        flagged.select(*keys, *out_cols, *extra, cond.alias("_hit"))
        .where(F.col("_hit"))
        .drop("_hit")
    )


def seq_match_pdf(rows: pd.DataFrame, pattern: SeqPattern) -> pd.DataFrame:
    """Pandas twin over ONE key's rows, already in the key's total
    order. Returns the emit frame WITHOUT key columns, plus an
    ``_start`` column (row position of step 0 in ``rows``) the
    streaming handler uses to decide which matches are newly decidable.
    """
    n = len(pattern.steps)
    N = len(rows)
    m = N - n + 1
    cols = [a for a, _, _ in pattern.emit] + (
        ["span_us"] if pattern.ts_col else []
    ) + ["_start"]
    if m <= 0:
        return pd.DataFrame({c: [] for c in cols})
    cond = np.ones(m, dtype=bool)
    for j, step in enumerate(pattern.steps):
        p = np.asarray(step.pdf(rows), dtype=bool)
        cond &= p[j : j + m]
    span = None
    if pattern.ts_col:
        ts_us = (
            rows[pattern.ts_col]
            .astype("datetime64[us]")
            .astype("int64")
            .to_numpy()
        )
        span = ts_us[n - 1 :] - ts_us[:m]
        cond &= span <= pattern.within_us
    hit = np.flatnonzero(cond)
    out = {}
    for alias, j, src in pattern.emit:
        out[alias] = rows[src].to_numpy()[hit + j]
    if span is not None:
        out["span_us"] = span[hit]
    out["_start"] = hit
    return pd.DataFrame(out)


# ----------------------------------------------------------- stock patterns

# user -> assistant tool call -> tool response: the complete dialog
# exchange (the unit the flagship curate correlates); over the shared
# derivation most 4-turn cycles match except where the response was
# dropped at source (event_id % 19) — a non-trivial match set.
DIALOG_TRIPLE = SeqPattern(
    steps=(
        SeqStep(
            "u",
            lambda: F.col("role") == "user",
            lambda r: (r["role"] == "user").to_numpy(),
        ),
        SeqStep(
            "a",
            lambda: (F.col("role") == "assistant")
            & F.col("tool").isNotNull(),
            lambda r: (
                (r["role"] == "assistant") & r["tool"].notna()
            ).to_numpy(),
        ),
        SeqStep(
            "t",
            lambda: F.col("role") == "tool",
            lambda r: (r["role"] == "tool").to_numpy(),
        ),
    ),
    emit=(
        ("s0_idx", 0, "turn_idx"),
        ("s1_idx", 1, "turn_idx"),
        ("s2_idx", 2, "turn_idx"),
        ("tool", 1, "tool"),
    ),
)

# view -> click -> purchase as CONSECUTIVE events of one user within 24
# hours: the conversion-burst funnel with contiguity (no intervening
# event of any type) — stricter than the first-touch funnel
# (`operators/funnel.py`), which allows arbitrary gaps. The bound is
# sized to the synthetic fixture's event density (median consecutive
# triple spans ~16h there); production tightens it per traffic.
CONVERSION_BURST_WITHIN_US = 24 * 3600 * 1_000_000

CONVERSION_BURST = SeqPattern(
    steps=(
        SeqStep(
            "view",
            lambda: F.col("event_type") == "view",
            lambda r: (r["event_type"] == "view").to_numpy(),
        ),
        SeqStep(
            "click",
            lambda: F.col("event_type") == "click",
            lambda r: (r["event_type"] == "click").to_numpy(),
        ),
        SeqStep(
            "purchase",
            lambda: F.col("event_type") == "purchase",
            lambda r: (r["event_type"] == "purchase").to_numpy(),
        ),
    ),
    emit=(
        ("s0_event_id", 0, "event_id"),
        ("s1_event_id", 1, "event_id"),
        ("s2_event_id", 2, "event_id"),
    ),
    ts_col="ts",
    within_us=CONVERSION_BURST_WITHIN_US,
)
