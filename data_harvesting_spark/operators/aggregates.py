"""Aggregation operators A2–A13 (SURVEY §2.4) over transcripts.

Each re-expresses a reference accumulator (`utils/ClassificationObject.py`)
as a declarative per-conversation aggregate. All Catalyst built-ins — one
hash shuffle on conv_id, partial aggregation map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mode_per_conv(transcripts: DataFrame, col: str = "role") -> DataFrame:
    """A4 — most-frequent value per conversation
    (reference: `utils/ClassificationObject.py:105-113`,
    ``Counter(names).most_common(1)``). Deterministic tie-break: higher
    count first, then lexicographically smaller value. Two-step
    count+row_number (portable to any engine, unlike ``mode()``'s
    arbitrary tie order)."""
    counts = transcripts.groupBy("conv_id", col).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("conv_id").orderBy(F.desc("cnt"), F.asc(col))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("conv_id", F.col(col).alias("mode_value"), F.col("cnt").alias("mode_count"))
    )


def topk_per_conv(transcripts: DataFrame, col: str = "tool", k: int = 3) -> DataFrame:
    """A5 — top-k most frequent values per conversation
    (reference: `utils/ClassificationObject.py:235-248`,
    ``most_common(3)`` over flattened color lists)."""
    counts = (
        transcripts.where(F.col(col).isNotNull())
        .groupBy("conv_id", col)
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("conv_id").orderBy(F.desc("cnt"), F.asc(col))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("conv_id", F.col(col).alias("key"), "cnt", "rank")
    )


def inter_turn_latency(transcripts: DataFrame) -> DataFrame:
    """A8 — pairwise-lag sum: total inter-turn latency per conversation
    (reference: `utils/ClassificationObject.py:168-180`, summed euclidean
    distance between consecutive centroids)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # integer microseconds: exact arithmetic → order-independent sums
    # (double-seconds sums are shuffle-order-nondeterministic at the ulp)
    lagged = transcripts.withColumn(
        "_gap",
        F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w),
    )
    return lagged.groupBy("conv_id").agg(
        F.coalesce(F.sum("_gap"), F.lit(0)).alias("total_latency_us"),
        F.count("*").alias("n_turns"),
    )


def first_last_span(transcripts: DataFrame) -> DataFrame:
    """A9/A10 — first/last displacement + threshold classification
    (reference: `utils/ClassificationObject.py:182-205` static_distance and
    ``is_static``). Span = last ts − first ts; a conversation is 'bursty'
    when the span is small but total turn count is large."""
    agg = transcripts.groupBy("conv_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count("*").alias("n_turns"),
    )
    span = F.unix_micros("last_ts") - F.unix_micros("first_ts")
    return agg.select(
        "conv_id",
        span.alias("span_us"),
        "n_turns",
        ((span <= 120_000_000) & (F.col("n_turns") >= 8)).alias("is_burst"),
    )


def assemble_conversation(transcripts: DataFrame) -> DataFrame:
    """A7 — collect-list with restored order (W3): whole-conversation
    assembly after shuffle via sort_array(collect_list(struct(...)))
    (reference trajectory accumulation:
    `utils/ClassificationObject.py:59-67,95-137`)."""
    return transcripts.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(F.struct("turn_idx", "role", "tool", "text", "ts"))
        ).alias("turns"),
        F.count("*").alias("n_turns"),
    )


def run_report(transcripts: DataFrame) -> DataFrame:
    """A13 — run-report rollup (reference: `utils/ReturnObject.py:24-63`,
    objectCount/properties/details accumulation) as one grouped agg +
    to_json of a struct."""
    per_conv = transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.count(F.when(F.col("tool").isNotNull(), 1)).alias("n_tool_turns"),
        F.count(F.when(F.col("role") == "assistant", 1)).alias("n_assistant"),
        F.count(F.when(F.col("role") == "user", 1)).alias("n_user"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    return per_conv.withColumn(
        "report",
        F.to_json(
            F.struct(
                F.lit("harvest").alias("operation"),
                F.struct(
                    F.col("n_tool_turns").alias("objectCount"),
                    F.col("n_turns").alias("turnCount"),
                ).alias("data"),
            )
        ),
    )


def _ws_tokens(c) -> F.Column:
    """Whitespace token count of a text column — the same counting rule
    as ``operators/curate.py::context_window_trim`` (0 for empty/null)."""
    t = F.trim(F.coalesce(c, F.lit("")))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def sft_pairs_frame(
    transcripts: DataFrame,
    context_turns: int = 3,
    context_budget: int | None = None,
) -> DataFrame:
    """SFT context→target extraction on a transcript frame: for every
    non-empty assistant turn, the up-to-``context_turns`` preceding turns
    joined as ``role: text`` lines (the catalog ``sft_pairs`` query and
    the streaming SFT export both delegate here — one definition, two
    execution modes).

    ``context_budget`` applies the ``context_window_trim`` rule to each
    pair's window before packing (round-4 verdict item #6: trim before
    pack): keep the longest SUFFIX of (context turns + target) whose
    whitespace-token total fits the budget — the target always survives,
    context lines drop oldest-first, and a context turn busting the
    budget stops the walk. Implemented as one array left-fold over the
    already-collected frame (no extra shuffle, no Python).

    Plan: one framed window over the conv_id exchange (zero extra
    shuffles after the derivation); the collected structs are sorted
    before joining so the context string is frame-evaluation-order-free.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-context_turns, -1)
    )
    ctx_arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("turn_idx").alias("ti"),
                F.concat_ws(": ", "role", "text").alias("line"),
                F.col("text").alias("txt"),
            )
        ).over(w)
    )
    out = transcripts.select(
        "conv_id", "turn_idx", "role", "text", ctx_arr.alias("ctx_arr")
    )
    if context_budget is None:
        context = F.array_join(
            F.transform("ctx_arr", lambda s: s["line"]), "\n"
        )
    else:
        # suffix walk from the newest context line backwards, seeded with
        # the target's tokens; stop at the first line that busts the
        # budget (contiguous-suffix rule, as context_window_trim)
        acc0 = F.struct(
            _ws_tokens(F.col("text")).alias("sum"),
            F.array().cast("array<string>").alias("keep"),
            F.lit(False).alias("stop"),
        )
        folded = F.aggregate(
            F.reverse("ctx_arr"),
            acc0,
            lambda a, s: F.struct(
                (a["sum"] + _ws_tokens(s["txt"])).alias("sum"),
                F.when(
                    (~a["stop"])
                    & (a["sum"] + _ws_tokens(s["txt"])
                       <= F.lit(context_budget)),
                    F.concat(a["keep"], F.array(s["line"])),
                )
                .otherwise(a["keep"])
                .alias("keep"),
                (
                    a["stop"]
                    | (a["sum"] + _ws_tokens(s["txt"])
                       > F.lit(context_budget))
                ).alias("stop"),
            ),
        )
        context = F.array_join(F.reverse(folded["keep"]), "\n")
    return (
        out.where(
            (F.col("role") == "assistant")
            & (F.length(F.trim("text")) > 0)
            & (F.size("ctx_arr") > 0)
        )
        .select(
            "conv_id",
            "turn_idx",
            context.alias("context"),
            F.col("text").alias("target"),
        )
    )
