"""Flagship batch curate pipeline (SURVEY §7 M1).

Re-expresses the reference's per-frame harvest loop
(`/root/reference/services/harvest_service.py:160-232` +
`/root/reference/condition.py:8-95`) over transcripts:

  1. normalize + hash text, dedup turns per conversation (A1/A2 — the
     greedy near-dup removal, made deterministic: keep first by
     ``(conv_id, turn_idx)`` per normalized-text group; the reference's
     keep-order quirk at `condition.py:64` is documented, not copied)
  2. correlate each tool-response turn with its most recent preceding
     tool-call turn of the same tool (J3 — as-of join)
  3. condition predicates: non-empty call/response text (P5/P6 analog)
  4. first response per call wins (dedupe fan-out)
  5. per-conversation emission cap, ordered by call turn_idx (P9)
  6. stable example numbering (W3)

Scale notes (the part that matters at 100 TB):
  - the as-of join is a *window*, not a pair join: the running
    ``max(struct(turn_idx, text, ts))`` over the per-tool window carries the
    call payload to its response row, so there is no calls×responses
    blow-up for hot conversations and no self-join back for the call text.
  - ONE exchange total: the pipeline repartitions by ``conv_id`` up front;
    every window key is a superset of ``conv_id``, so
    ``HashPartitioning(conv_id)`` satisfies each window's
    ClusteredDistribution and Catalyst inserts local sorts, never a second
    shuffle (verified via ``.explain("formatted")`` in
    tests/test_curate.py::test_single_exchange_plan).
  - all predicates are Column expressions (whole-stage codegen); the only
    pandas UDF in the family is the optional suppression sweep
    (operators/cap.py) which is inherently sequential per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_harvesting_spark.config import HarvestConfig
from data_harvesting_spark.functions.text import normalize_text, text_hash


KEY = ("conv_id",)


def dedup_turns(transcripts: DataFrame, keys: tuple[str, ...] = KEY) -> DataFrame:
    """A1/A2 — dedup turns by normalized-text hash within a conversation.

    Keep-first-by-turn_idx per (conv_id, xxhash64(norm_text)) — the
    north_star's "batch-level text hashing" dedup: an 8-byte hash key
    replaces ~100-byte normalized-string comparisons, and a hash aggregate
    (``min_by`` over a struct) replaces a full sort + row_number, so this
    stage needs no ordering at all. Null/empty text rows are kept as-is
    (they carry predicate semantics downstream; all-null hashes group
    together exactly like SQL ``PARTITION BY``).
    Reference: `condition.py:63-77` greedy near-dup removal; divergence
    (documented in SURVEY §2.4 A1): we fix a deterministic total order.

    Collision bound: keying on the 64-bit hash instead of the normalized
    text makes exactness probabilistic — a cross-text xxhash64 collision
    within one conversation would drop a distinct turn. At per-conversation
    cardinality n the collision probability is ~n²/2⁶⁵ (< 1e-13 for
    n = 10⁴ turns), negligible even across 10⁸ conversations.
    """
    t = transcripts.withColumn(
        "norm_hash", F.xxhash64(normalize_text("text"))
    )
    payload = [c for c in t.columns if c not in (*keys, "norm_hash")]
    kept = t.groupBy(*keys, "norm_hash").agg(
        F.min_by(F.struct(*payload), "turn_idx").alias("_row")
    )
    return kept.select(*keys, *[F.col(f"_row.{c}").alias(c) for c in payload])


def correlate_pairs(
    deduped: DataFrame, cfg: HarvestConfig, keys: tuple[str, ...] = KEY
) -> DataFrame:
    """J3 — as-of correlation of tool-call turns with response turns.

    For each response turn (role=cfg.response_role, tool set), find the most
    recent preceding call turn (role=cfg.call_role, same tool) in the same
    conversation; first response per call wins.

    Join-free formulation: the running ``max`` of a ``struct(turn_idx, text,
    ts)`` over the per-tool window IS the as-of lookup (struct comparison
    orders by ``turn_idx`` first), so the call's payload rides along and the
    old equi self-join back to the call row — a second scan + shuffle of the
    whole input — disappears from the plan.
    """
    is_call = (F.col("role") == cfg.call_role) & F.col("tool").isNotNull()
    is_resp = (F.col("role") == cfg.response_role) & F.col("tool").isNotNull()

    w_tool = (
        Window.partitionBy(*keys, "tool")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = deduped.withColumn(
        "prev_call",
        F.max(F.when(is_call, F.struct("turn_idx", "text", "ts"))).over(w_tool),
    )

    pairs = tagged.where(is_resp & F.col("prev_call").isNotNull()).select(
        *keys,
        F.col("prev_call.turn_idx").alias("call_turn_idx"),
        F.col("turn_idx").alias("response_turn_idx"),
        "tool",
        F.col("text").alias("response_text"),
        F.col("ts").alias("response_ts"),
        F.col("prev_call.text").alias("call_text"),
        F.col("prev_call.ts").alias("call_ts"),
    )

    w_first = Window.partitionBy(*keys, "call_turn_idx").orderBy(
        "response_turn_idx"
    )
    return (
        pairs.withColumn("_rn", F.row_number().over(w_first))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_condition(pairs: DataFrame) -> DataFrame:
    """P5/P6 analog — the curate condition: both sides non-empty.

    Extension point analog of the reference's ``condition_func``
    (`projects/ibase_project.py:9-20`); richer predicates live in
    operators/predicates.py.
    """
    return pairs.where(
        F.col("call_text").isNotNull()
        & (F.length(F.trim("call_text")) > 0)
        & F.col("response_text").isNotNull()
        & (F.length(F.trim("response_text")) > 0)
    )


def cap_and_number(
    pairs: DataFrame,
    cfg: HarvestConfig,
    keys: tuple[str, ...] = KEY,
    order_cols: tuple[str, ...] = ("call_turn_idx", "response_turn_idx"),
) -> DataFrame:
    """P9 emission cap + P8 min gate + W3 stable numbering per ``keys``.

    ``keys`` is the cap/numbering scope (conversation or session — see
    ``HarvestConfig.cap_scope``); ``order_cols`` the stable emission order
    within it."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_cols])
    out = pairs.withColumn("example_idx", (F.row_number().over(w) - 1).cast("int"))
    if cfg.max_pairs_per_conv > 0:
        out = out.where(F.col("example_idx") < cfg.max_pairs_per_conv)
    if cfg.min_pairs_per_conv > 1:
        wc = Window.partitionBy(*keys)
        out = (
            out.withColumn("_n_pairs", F.count("*").over(wc))
            .where(F.col("_n_pairs") >= cfg.min_pairs_per_conv)
            .drop("_n_pairs")
        )
    return out


def curate(
    transcripts: DataFrame,
    cfg: HarvestConfig | None = None,
    pre_clustered: bool = False,
) -> DataFrame:
    """Full flagship pipeline: transcripts → curated call/response pairs.

    Pure function over a DataFrame — usable unchanged from the batch runner
    and from ``foreachBatch`` in the streaming runner (SURVEY §3 E3).

    ``pre_clustered=True`` asserts the input is already hash-clustered by
    ``conv_id`` (e.g. the events→transcripts derivation, whose window
    partitions by the conv_id expression; or a bucketed table) and skips
    the pipeline's own repartition — zero exchanges added.
    """
    cfg = cfg or HarvestConfig()
    if cfg.allowed_roles:
        transcripts = transcripts.where(F.col("role").isin(*cfg.allowed_roles))
    if cfg.sample_stride > 1:
        transcripts = transcripts.where(
            F.col("turn_idx") % cfg.sample_stride == 0
        )
    # ONE exchange for the whole pipeline: every window below partitions by
    # a superset of conv_id, so HashPartitioning(conv_id) satisfies each
    # ClusteredDistribution and Catalyst inserts sorts, not reshuffles.
    if not pre_clustered:
        transcripts = transcripts.repartition(F.col("conv_id"))
    deduped = dedup_turns(transcripts)
    pairs = correlate_pairs(deduped, cfg)
    pairs = apply_condition(pairs)
    pairs = cap_and_number(pairs, cfg)
    return pairs.select(
        "conv_id",
        "example_idx",
        "call_turn_idx",
        "response_turn_idx",
        "tool",
        "call_text",
        "response_text",
        text_hash(F.col("response_text")).alias("text_hash"),
        "call_ts",
        "response_ts",
    )


def curate_keyed_pairs(
    turns: DataFrame,
    cfg: HarvestConfig,
    keys: tuple[str, ...] = ("conv_id", "window_start"),
) -> DataFrame:
    """Session-keyed dedup + correlation + condition, NO cap/numbering —
    the shared front half of ``curate_keyed`` and the session-window
    runner's cross-batch ledger writer (which numbers with offsets)."""
    turns = turns.repartition(F.col("conv_id"))
    deduped = dedup_turns(turns, keys)
    pairs = correlate_pairs(deduped, cfg, keys)
    return apply_condition(pairs)


def curate_keyed(
    turns: DataFrame,
    cfg: HarvestConfig | None = None,
    keys: tuple[str, ...] = ("conv_id", "window_start"),
) -> DataFrame:
    """Flagship pipeline generalized to an arbitrary session key (default:
    closed session windows ``(conv_id, window_start)``).

    Used by the session-window streaming runner: the JVM's
    ``session_window`` aggregation assembles and closes sessions; this
    declarative pipeline curates the closed sessions inside foreachBatch.
    Still one exchange: all window/agg keys are supersets of ``conv_id``.

    Dedup/correlation are always per session key; cap / suppression /
    min gate / numbering follow ``cfg.cap_scope`` — conversation scope
    (reference semantics) budgets and numbers across a conversation's
    sessions in ``window_start`` order, matching the kernel
    (operators/kernel.py) exactly.
    """
    cfg = cfg or HarvestConfig()
    pairs = curate_keyed_pairs(turns, cfg, keys)
    conv_scope = cfg.cap_scope == "conversation" and len(keys) > 1
    cap_keys = keys[:1] if conv_scope else keys
    order_cols = (
        ("window_start", "call_turn_idx", "response_turn_idx")
        if conv_scope
        else ("call_turn_idx", "response_turn_idx")
    )
    if cfg.suppress_turns_after_emit > 0:
        # P10 — sequential sweep per cap-scope key (operators/cap.py), then
        # the window numbering below re-derives dense example_idx
        from data_harvesting_spark.operators.cap import suppress_and_cap

        pairs = suppress_and_cap(
            pairs, cfg, key=list(cap_keys), order_col=list(order_cols)
        )
    pairs = cap_and_number(pairs, cfg, cap_keys, order_cols)
    return pairs.select(
        *keys,
        "example_idx",
        "call_turn_idx",
        "response_turn_idx",
        "tool",
        "call_text",
        "response_text",
        text_hash(F.col("response_text")).alias("text_hash"),
    )


def context_window_trim(transcripts: DataFrame, budget: int) -> DataFrame:
    """Suffix-budget context truncation — the serving/teacher-forcing
    trim every LLM pipeline runs before packing a conversation into a
    fixed window: keep the LONGEST SUFFIX of turns whose total
    whitespace-token count fits ``budget`` (most-recent context wins),
    never emitting an empty conversation — the final turn survives even
    when it alone busts the budget. Reference analog: the harvester's
    per-message frame cap keeps the newest frames when the buffer
    overflows (`/root/reference/services/harvest_service.py:156-170`).

    Scale posture: one reverse running-sum window and one per-conv max,
    BOTH satisfied by a single hashpartitioning(conv_id) exchange — the
    same one-exchange profile as ``curate``. No global sort, no
    single-partition stage; at 100 TB the cost is one conversation-keyed
    shuffle of the turn table.
    """
    n_tok = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    w_rev = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_conv = Window.partitionBy("conv_id")
    cum = (
        transcripts.withColumn("n_tokens", n_tok.cast("int"))
        .withColumn("ctx_tokens", F.sum("n_tokens").over(w_rev).cast("bigint"))
        .withColumn("last_idx", F.max("turn_idx").over(w_conv))
    )
    return cum.where(
        (F.col("ctx_tokens") <= F.lit(budget))
        | (F.col("turn_idx") == F.col("last_idx"))
    ).select(
        "conv_id", "turn_idx", "role", "tool", "text", "n_tokens", "ctx_tokens"
    )
