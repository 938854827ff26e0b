"""Data-quality monitoring frames shared by batch and streaming.

The batch gate queries (`plans/q_relational.py::q_dq_profile` /
`q_dq_constraints`) validate a finished table; a pipeline consuming an
unbounded queue needs the SAME rules evaluated continuously. These
frames define the monitor ONCE so the streaming job and its batch twin
cannot drift (the repo-wide shared-frame pattern, cf.
``operators/aggregates.py`` sft frame, ``operators/cep.py`` predicates):

- ``dq_monitor_counters``  → long ``(k, v)`` rule counters. Every one is
  a COUNT, so cross-epoch merge is ``sum(v)`` — exact, order-free.
- ``dq_monitor_registers`` → event_id HLL registers ``(bucket, m_j)``;
  cross-epoch merge is ``max(m_j)`` — exact-state, order-free. Global
  uniqueness over an unbounded stream cannot keep per-id state (that is
  O(stream)); the sketch is the bounded answer, and because register
  max-merge is associative the streaming estimate equals the one-shot
  batch estimate BIT-FOR-BIT, not approximately.
- ``dq_monitor_report``    → named rules as ``(rule, passed, actual)``
  from the two cumulative states; pure arithmetic on a 1-row tuple.

Reference analog: the queue consumer's payload sanity checks
(`/root/reference/queue_harvesting.py:84-118`) run per message; this is
that gate as a fleet-wide continuous report.

Scale shape: counters are ONE aggregate pass with map-side partials
(bytes per task); registers are one 1024-group hash agg (O(registers)
per task, never O(data)); the report is arithmetic on a 1-row join of
the two — nothing here grows with the corpus or the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_harvesting_spark.operators.sketch import (
    HLL_NUMERATOR,
    hll_registers,
    hll_summary,
)

DQ_KNOWN_TYPES = ("click", "view", "purchase", "signup", "error")

_COUNTER_KEYS = [
    "n_rows",
    "event_id_filled",
    "user_id_filled",
    "value_filled",
    "value_nonneg",
    "event_type_filled",
    "event_type_known",
]

# With 1024 registers the estimate sits within ~±5% of truth once n is
# in the sketch's raw range (n ≳ 2.5·m ≈ 2.5k — hll_distinct documents
# the raw-range-only design), so 0.9 cleanly separates "unique" from
# real duplication without flagging clean data. Below raw range the
# estimator reads high (the rule can only pass) — at monitor scale the
# stream leaves that regime within its first epochs.
DQ_UNIQUE_THRESHOLD = 0.9


def dq_monitor_counters(ev: DataFrame) -> DataFrame:
    """The sum-mergeable half of the monitor state: one COUNT per rule
    input, emitted long as ``(k, v)`` so epochs merge by
    ``groupBy(k).sum(v)``."""
    row = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("event_id").alias("event_id_filled"),
        F.count("user_id").alias("user_id_filled"),
        F.count("value").alias("value_filled"),
        F.count(F.when(F.col("value") >= 0.0, 1)).alias("value_nonneg"),
        F.count("event_type").alias("event_type_filled"),
        F.count(
            F.when(F.col("event_type").isin(list(DQ_KNOWN_TYPES)), 1)
        ).alias("event_type_known"),
    )
    stack_args = ", ".join(f"'{k}', {k}" for k in _COUNTER_KEYS)
    return row.select(
        F.expr(f"stack({len(_COUNTER_KEYS)}, {stack_args}) AS (k, v)")
    ).select("k", F.col("v").cast("long").alias("v"))


def dq_monitor_registers(ev: DataFrame) -> DataFrame:
    """The max-mergeable half: event_id HLL registers. Ids hash as their
    decimal string so any engine (and any epoch split) builds the
    identical register table."""
    return hll_registers(
        ev.where(F.col("event_id").isNotNull()).select(
            F.col("event_id").cast("string").alias("term")
        )
    )


def dq_monitor_report(counters: DataFrame, regs: DataFrame) -> DataFrame:
    """Named rules from the two cumulative states. Exact-count rules are
    identical to the batch ``dq_constraints`` gate; the uniqueness rule
    is the HLL estimate over filled ids (deterministic double division
    over exact-int sums — same number from the same registers no matter
    how they merged)."""
    wide = counters.groupBy().pivot("k", _COUNTER_KEYS).sum("v")
    est = hll_summary(regs).select(
        (F.lit(HLL_NUMERATOR) / F.col("s_scaled")).alias("est_distinct")
    )
    m = wide.crossJoin(est)

    def ratio(num, den):
        return F.round(num / den.cast("double"), 6)

    rules = [
        (
            "event_id is unique (hll)",
            F.round(
                F.col("est_distinct") / F.col("event_id_filled"), 6
            )
            >= DQ_UNIQUE_THRESHOLD,
            F.round(
                F.col("est_distinct") / F.col("event_id_filled"), 6
            ),
        ),
        (
            "event_id is complete",
            F.col("event_id_filled") == F.col("n_rows"),
            ratio(F.col("event_id_filled"), F.col("n_rows")),
        ),
        (
            "user_id is complete",
            F.col("user_id_filled") == F.col("n_rows"),
            ratio(F.col("user_id_filled"), F.col("n_rows")),
        ),
        (
            "value is non-negative",
            F.col("value_nonneg") == F.col("value_filled"),
            ratio(F.col("value_nonneg"), F.col("value_filled")),
        ),
        (
            "event_type in domain",
            F.col("event_type_known") == F.col("event_type_filled"),
            ratio(F.col("event_type_known"), F.col("event_type_filled")),
        ),
    ]
    return m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(rule).alias("rule"),
                        passed.alias("passed"),
                        actual.alias("actual"),
                    )
                    for rule, passed, actual in rules
                ]
            )
        ).alias("r")
    ).select("r.rule", "r.passed", "r.actual")


def dq_monitor_batch(ev: DataFrame) -> DataFrame:
    """One-shot batch twin: the exact report the streaming monitor's
    final epoch emits over the same rows."""
    return dq_monitor_report(dq_monitor_counters(ev), dq_monitor_registers(ev))
