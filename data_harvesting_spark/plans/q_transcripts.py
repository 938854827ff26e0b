"""Transcript-domain catalog queries (SURVEY §2.2/2.4/2.5 operators), each
with a DuckDB oracle over the shared events→transcripts derivation.

Convention: timestamps leave oracle-compared queries as integer epoch
micros/seconds (exact integer math on both engines); float aggregates are
avoided or integerized — unordered float summation is
shuffle-order-nondeterministic at the ulp and would flake the value-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_harvesting_spark.derive import (
    load_transcripts_from_events,
    transcripts_sql,
    transcripts_with_value_sql,
)
from data_harvesting_spark.plans.catalog import register

_T = transcripts_sql("events")


def _with_t(body: str) -> str:
    return f"WITH transcripts AS ({_T})\n{body}"


# ---------------------------------------------------------------- P1
@register(
    "rate_sample",
    _with_t(
        "SELECT conv_id, turn_idx, role, tool, text FROM transcripts "
        "WHERE turn_idx % 3 = 0"
    ),
)
def q_rate_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — fixed-stride sampling filter (reference
    `services/harvest_service.py:156-157`)."""
    t = load_transcripts_from_events(spark, sf_dir)
    return t.where(F.col("turn_idx") % 3 == 0).select(
        "conv_id", "turn_idx", "role", "tool", "text"
    )


# ---------------------------------------------------------------- P5+P6
@register(
    "exists_forall",
    _with_t(
        """
SELECT conv_id FROM transcripts
GROUP BY conv_id
HAVING max(CASE WHEN role='assistant' AND tool IS NOT NULL THEN 1 ELSE 0 END) = 1
   AND max(CASE WHEN role='tool' AND tool IS NOT NULL THEN 1 ELSE 0 END) = 1
   AND min(CASE WHEN role='tool'
                THEN CASE WHEN text IS NOT NULL AND length(trim(text)) > 0
                          THEN 1 ELSE 0 END END) = 1
"""
    ),
)
def q_exists_forall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 exists + P6 forall quantifiers composed (reference
    `projects/helmet/helmet_project.py:43-51`)."""
    from data_harvesting_spark.operators.predicates import (
        qualifying_conversations,
    )

    t = load_transcripts_from_events(spark, sf_dir)
    return qualifying_conversations(
        t, ["exists_tool_pair", "forall_nonempty_tool_text"]
    )


# ---------------------------------------------------------------- P7
@register(
    "exact_count_hist",
    _with_t(
        """
SELECT n_assistant, CAST(count(*) AS BIGINT) AS n_convs
FROM (
  SELECT conv_id,
         CAST(count(CASE WHEN role='assistant' THEN 1 END) AS BIGINT) AS n_assistant
  FROM transcripts GROUP BY conv_id) t
GROUP BY n_assistant
"""
    ),
)
def q_exact_count_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — exact-count predicate surface (reference
    `projects/person/person_project.py:35-46`), exposed as the per-count
    conversation histogram (robust at every sf)."""
    t = load_transcripts_from_events(spark, sf_dir)
    per_conv = t.groupBy("conv_id").agg(
        F.count(F.when(F.col("role") == "assistant", 1)).alias("n_assistant")
    )
    return per_conv.groupBy("n_assistant").agg(F.count("*").alias("n_convs"))


# ---------------------------------------------------------------- P11+P12
@register(
    "crop_renumber",
    _with_t(
        """
, spans AS (
  SELECT conv_id, min(turn_idx) AS lo, max(turn_idx) AS hi
  FROM transcripts WHERE tool IS NOT NULL GROUP BY conv_id
)
SELECT t.conv_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY t.conv_id ORDER BY t.turn_idx) - 1 AS INT)
         AS new_turn_idx,
       t.turn_idx, t.role, t.tool
FROM transcripts t JOIN spans s ON t.conv_id = s.conv_id
WHERE t.turn_idx BETWEEN s.lo AND s.hi
"""
    ),
)
def q_crop_renumber(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 crop-to-span + P12 renumbering (reference
    `condition.py:98-157`)."""
    from data_harvesting_spark.operators.sessionize import crop_span, renumber

    t = load_transcripts_from_events(spark, sf_dir)
    return renumber(crop_span(t)).select(
        "conv_id", "new_turn_idx", "turn_idx", "role", "tool"
    )


# ---------------------------------------------------------------- P13/J2
@register(
    "label_translate",
    _with_t(
        """
SELECT conv_id, turn_idx, tool,
       CASE WHEN tool='search' THEN 'web_search'
            WHEN tool='browser' THEN 'web_browse'
            WHEN tool='python' THEN 'code_exec'
            WHEN tool='calculator' THEN 'math_eval'
            WHEN tool='sql' THEN 'db_query'
            ELSE tool END AS canonical
FROM transcripts WHERE tool IS NOT NULL
"""
    ),
)
def q_label_translate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13 — label translation CASE chain (reference
    `utils/TranslateObject.py:1-23`)."""
    from data_harvesting_spark.operators.mapping import translate_tool

    t = load_transcripts_from_events(spark, sf_dir)
    return t.where(F.col("tool").isNotNull()).select(
        "conv_id", "turn_idx", "tool", translate_tool("tool").alias("canonical")
    )


# ---------------------------------------------------------------- W1 batch
@register(
    "sessionize",
    _with_t(
        """
, gapped AS (
  SELECT conv_id, turn_idx, ts,
         CASE WHEN epoch_us(ts)
                 - LAG(epoch_us(ts))
                   OVER (PARTITION BY conv_id ORDER BY turn_idx) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM transcripts
),
sess AS (
  SELECT conv_id, turn_idx, ts,
         CAST(SUM(new_s) OVER (PARTITION BY conv_id ORDER BY turn_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_id
  FROM gapped
)
SELECT conv_id, turn_idx, session_id,
       CAST(min(epoch_us(ts)) OVER (PARTITION BY conv_id, session_id) AS BIGINT)
         AS window_start_us
FROM sess
"""
    ),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — gap-based batch sessionization (lag+cumsum)."""
    from data_harvesting_spark.operators.sessionize import sessionize

    t = load_transcripts_from_events(spark, sf_dir)
    return sessionize(t, gap_seconds=1800).select(
        "conv_id",
        "turn_idx",
        "session_id",
        F.unix_micros("window_start").alias("window_start_us"),
    )


# ---------------------------------------------------------------- W4 tumbling
@register(
    "harvest_rates_tool",
    _with_t(
        """
SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_s,
       tool AS key,
       CAST(count(*) AS BIGINT) AS turn_count,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS conv_distinct
FROM transcripts WHERE tool IS NOT NULL
GROUP BY 1, 2
"""
    ),
)
def q_harvest_rates_tool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — tumbling-window per-tool harvest rates (north_star aggregate).
    Oracle variant uses exact distinct; scale path uses HLL (rates.py)."""
    from data_harvesting_spark.operators.rates import harvest_rates

    t = load_transcripts_from_events(spark, sf_dir)
    r = harvest_rates(t, grain="tool", window="1 hour", exact_distinct=True)
    return r.select(
        F.unix_timestamp("window_start").alias("window_start_s"),
        "key",
        "turn_count",
        F.col("conv_distinct").cast("bigint").alias("conv_distinct"),
    )


# ------------------------------------------------------ W4+A5 windowed top-k
@register(
    "topk_tools_windowed",
    _with_t(
        """
, counts AS (
  SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_s,
         tool, CAST(count(*) AS BIGINT) AS turn_count
  FROM transcripts WHERE tool IS NOT NULL
  GROUP BY 1, 2)
SELECT window_start_s, tool, turn_count, CAST(rnk AS INT) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY window_start_s
                                   ORDER BY turn_count DESC, tool) AS rnk
      FROM counts) t
WHERE rnk <= 3
"""
    ),
)
def q_topk_tools_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 × A5 — top-3 tools per tumbling hour by turn count, ties
    deterministic by (count DESC, tool ASC). The batch twin of
    ``streaming/pipeline.py::start_windowed_topk_stream_job`` (which
    finalizes the same ranking per window on watermark close). Shape:
    one (window, tool) hash agg with map-side partials, then the rank
    partitions by window over the agg output (≤ |tools| rows per
    window) — the window never touches raw turns."""
    from pyspark.sql import Window

    t = load_transcripts_from_events(spark, sf_dir)
    counts = (
        t.where(F.col("tool").isNotNull())
        .groupBy(F.window("ts", "1 hour").alias("w"), "tool")
        .agg(F.count("*").alias("turn_count"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"),
            "tool",
            "turn_count",
        )
    )
    rank_w = Window.partitionBy("window_start_s").orderBy(
        F.desc("turn_count"), "tool"
    )
    return (
        counts.withColumn("rnk", F.row_number().over(rank_w))
        .where(F.col("rnk") <= 3)
        .select("window_start_s", "tool", "turn_count", "rnk")
    )


# ---------------------------------------------------------------- W4 sliding
@register(
    "harvest_rates_role_sliding",
    _with_t(
        """
, offs AS (SELECT * FROM (VALUES (0), (1)) AS o(i)
)
SELECT CAST((floor(epoch(ts) / 1800) - offs.i) * 1800 AS BIGINT) AS window_start_s,
       role AS key,
       CAST(count(*) AS BIGINT) AS turn_count
FROM transcripts CROSS JOIN offs
GROUP BY 1, 2
"""
    ),
)
def q_harvest_rates_role_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — sliding-window (1h window / 30min slide) per-role rates."""
    t = load_transcripts_from_events(spark, sf_dir)
    return (
        t.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "role")
        .agg(F.count("*").alias("turn_count"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"),
            F.col("role").alias("key"),
            "turn_count",
        )
    )


# ---------------------------------------------------------------- A4
@register(
    "mode_role",
    _with_t(
        """
SELECT conv_id, mode_value, mode_count FROM (
  SELECT conv_id, role AS mode_value, CAST(count(*) AS BIGINT) AS mode_count,
         ROW_NUMBER() OVER (PARTITION BY conv_id
                            ORDER BY count(*) DESC, role ASC) AS rn
  FROM transcripts GROUP BY conv_id, role) t
WHERE rn = 1
"""
    ),
)
def q_mode_role(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — most-frequent role per conversation (reference
    `utils/ClassificationObject.py:105-113`)."""
    from data_harvesting_spark.operators.aggregates import mode_per_conv

    t = load_transcripts_from_events(spark, sf_dir)
    return mode_per_conv(t, "role")


# ---------------------------------------------------------------- A5
@register(
    "topk_tools",
    _with_t(
        """
SELECT conv_id, key, cnt, rank FROM (
  SELECT conv_id, tool AS key, CAST(count(*) AS BIGINT) AS cnt,
         CAST(ROW_NUMBER() OVER (PARTITION BY conv_id
                                 ORDER BY count(*) DESC, tool ASC) AS INT) AS rank
  FROM transcripts WHERE tool IS NOT NULL GROUP BY conv_id, tool) t
WHERE rank <= 3
"""
    ),
)
def q_topk_tools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — top-3 tools per conversation (reference
    `utils/ClassificationObject.py:235-248`)."""
    from data_harvesting_spark.operators.aggregates import topk_per_conv

    t = load_transcripts_from_events(spark, sf_dir)
    return topk_per_conv(t, "tool", 3)


# ---------------------------------------------------------------- A8
@register(
    "inter_turn_latency",
    _with_t(
        """
SELECT conv_id,
       CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS total_latency_us,
       CAST(count(*) AS BIGINT) AS n_turns
FROM (
  SELECT conv_id,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap
  FROM transcripts) t
GROUP BY conv_id
"""
    ),
)
def q_inter_turn_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — pairwise-lag sum (reference
    `utils/ClassificationObject.py:168-180`)."""
    from data_harvesting_spark.operators.aggregates import inter_turn_latency

    t = load_transcripts_from_events(spark, sf_dir)
    return inter_turn_latency(t)


# ---------------------------------------------------------------- A9/A10
@register(
    "first_last_span",
    _with_t(
        """
SELECT conv_id,
       max(epoch_us(ts)) - min(epoch_us(ts)) AS span_us,
       CAST(count(*) AS BIGINT) AS n_turns,
       (max(epoch_us(ts)) - min(epoch_us(ts)) <= 120000000
        AND count(*) >= 8) AS is_burst
FROM transcripts GROUP BY conv_id
"""
    ),
)
def q_first_last_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/A10 — first/last displacement + threshold classification
    (reference `utils/ClassificationObject.py:182-205`)."""
    from data_harvesting_spark.operators.aggregates import first_last_span

    t = load_transcripts_from_events(spark, sf_dir)
    return first_last_span(t)


# ---------------------------------------------------------------- A7/W3
@register(
    "assemble_conversation",
    _with_t(
        """
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       string_agg(role, '|' ORDER BY turn_idx) AS role_seq
FROM transcripts GROUP BY conv_id
"""
    ),
)
def q_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/W3 — whole-conversation assembly with restored order:
    sort_array(collect_list(struct(...))) (reference trajectory lists,
    `utils/ClassificationObject.py:59-67`)."""
    t = load_transcripts_from_events(spark, sf_dir)
    return t.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "role"))),
                lambda s: s["role"],
            ),
            "|",
        ).alias("role_seq"),
    )


# ---------------------------------------------------------------- A13
@register(
    "run_report",
    _with_t(
        """
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(CASE WHEN tool IS NOT NULL THEN 1 END) AS BIGINT) AS n_tool_turns,
       CAST(count(CASE WHEN role='assistant' THEN 1 END) AS BIGINT) AS n_assistant,
       CAST(count(CASE WHEN role='user' THEN 1 END) AS BIGINT) AS n_user,
       min(epoch_us(ts)) AS first_ts_us,
       max(epoch_us(ts)) AS last_ts_us
FROM transcripts GROUP BY conv_id
"""
    ),
)
def q_run_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 — run-report rollup (reference `utils/ReturnObject.py:24-63`).
    The to_json(struct(...)) column is exercised in unit tests; oracle
    compares the numeric payload."""
    from data_harvesting_spark.operators.aggregates import run_report

    t = load_transcripts_from_events(spark, sf_dir)
    return run_report(t).select(
        "conv_id",
        "n_turns",
        "n_tool_turns",
        "n_assistant",
        "n_user",
        F.unix_micros("first_ts").alias("first_ts_us"),
        F.unix_micros("last_ts").alias("last_ts_us"),
    )


# ---------------------------------------------------------------- J1+J2
@register(
    "multi_enricher_union",
    _with_t(
        """
SELECT conv_id, turn_idx, 0 AS enricher, tool AS label
FROM transcripts WHERE tool IS NOT NULL
UNION ALL
SELECT conv_id, turn_idx, 1 AS enricher,
       CASE WHEN tool='search' THEN 'web_search'
            WHEN tool='browser' THEN 'web_browse'
            WHEN tool='python' THEN 'code_exec'
            WHEN tool='calculator' THEN 'math_eval'
            WHEN tool='sql' THEN 'db_query' END AS label
FROM transcripts
WHERE tool IN ('search','browser','python','calculator','sql')
"""
    ),
)
def q_multi_enricher_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 multi-model merge + J2 broadcast dimension mapping (reference
    `condition.py:54-61`, `projects/helmet/helmet_project.py:57-102`)."""
    from data_harvesting_spark.operators.mapping import (
        multi_enricher_union,
        tool_dimension,
    )

    t = load_transcripts_from_events(spark, sf_dir)
    return multi_enricher_union(t, tool_dimension(spark))


# ---------------------------------------------------------------- P10
_SUPPRESS = 5
_SUP_CAP = 100

@register(
    "suppression_sweep",
    _with_t(
        f"""
, q AS (
  SELECT conv_id, turn_idx FROM transcripts
  WHERE role='tool' AND tool IS NOT NULL
),
sweep AS (
  WITH RECURSIVE s AS (
    SELECT conv_id, min(turn_idx) AS kept, 1 AS n FROM q GROUP BY conv_id
    UNION ALL
    SELECT s.conv_id,
           (SELECT min(turn_idx) FROM q
             WHERE q.conv_id = s.conv_id AND q.turn_idx > s.kept + {_SUPPRESS}),
           s.n + 1
    FROM s
    WHERE s.n < {_SUP_CAP}
      AND EXISTS (SELECT 1 FROM q
                   WHERE q.conv_id = s.conv_id AND q.turn_idx > s.kept + {_SUPPRESS})
  ) SELECT * FROM s
)
SELECT conv_id, CAST(kept AS INT) AS turn_idx FROM sweep
"""
    ),
)
def q_suppression_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 — greedy emit-then-suppress sweep (reference
    `services/harvest_service.py:207-208,228-229`): after each kept turn,
    skip qualifying turns within the next {_SUPPRESS} positions; cap at
    {_SUP_CAP}. Spark side = applyInPandas sweep; oracle = recursive CTE."""
    from data_harvesting_spark.config import HarvestConfig
    from data_harvesting_spark.operators.cap import suppress_and_cap

    t = load_transcripts_from_events(spark, sf_dir)
    q = t.where((F.col("role") == "tool") & F.col("tool").isNotNull()).select(
        "conv_id", "turn_idx"
    )
    cfg = HarvestConfig(
        max_pairs_per_conv=_SUP_CAP, suppress_turns_after_emit=_SUPPRESS
    )
    return suppress_and_cap(q, cfg)


# ---------------------------------------------------------------- M5 salting
@register(
    "salted_tool_counts",
    _with_t(
        """
SELECT tool, CAST(count(*) AS BIGINT) AS turn_count
FROM transcripts WHERE tool IS NOT NULL GROUP BY tool
"""
    ),
)
def q_salted_tool_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 — two-phase salted aggregation for hot-key skew (north_rule):
    pre-aggregate on (tool, salt), then merge per tool. Result must equal
    the plain group-by (the oracle)."""
    t = load_transcripts_from_events(spark, sf_dir)
    salted = (
        t.where(F.col("tool").isNotNull())
        .withColumn("_salt", F.pmod(F.hash("conv_id", "turn_idx"), F.lit(16)))
        .groupBy("tool", "_salt")
        .agg(F.count("*").alias("partial"))
    )
    return salted.groupBy("tool").agg(F.sum("partial").alias("turn_count"))


# ---------------------------------------------------------------- kernel (M4)
# Oracle for the sessionized kernel under the default config (conversation-
# scope cap, no suppression): gap-sessionize → per-session dedup + as-of
# correlation + first-response + non-empty condition → per-CONVERSATION
# cumulative numbering/cap across sessions in time order. The kernel dedups
# on xxhash64(norm_text); the oracle on norm_text itself — identical modulo
# a ~2^-65-per-pair hash collision (see operators/curate.py).
_SESSIONS_KERNEL_ORACLE = _with_t(
    """
, norm AS (
  SELECT conv_id, turn_idx, role, tool, text, ts,
         lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm_text
  FROM transcripts
),
gapped AS (
  SELECT *, CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                   OVER (PARTITION BY conv_id ORDER BY ts, turn_idx)
                 > 1800000000 THEN 1 ELSE 0 END AS new_s
  FROM norm
),
sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM gapped
),
ws AS (
  SELECT *, min(ts) OVER (PARTITION BY conv_id, sid) AS window_start FROM sess
),
dedup AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, sid, norm_text
                                 ORDER BY turn_idx) AS rn
    FROM ws) t WHERE rn = 1
),
tagged AS (
  SELECT *,
    MAX(CASE WHEN role='assistant' AND tool IS NOT NULL THEN turn_idx END)
      OVER (PARTITION BY conv_id, sid, tool ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_call_idx
  FROM dedup
),
resps AS (
  SELECT conv_id, sid, window_start, prev_call_idx AS call_turn_idx,
         turn_idx AS response_turn_idx, tool, text AS response_text
  FROM tagged
  WHERE role='tool' AND tool IS NOT NULL AND prev_call_idx IS NOT NULL
),
pairs AS (
  SELECT r.conv_id, r.sid, r.window_start, r.call_turn_idx,
         r.response_turn_idx, r.tool, r.response_text, c.text AS call_text
  FROM resps r
  JOIN dedup c ON r.conv_id = c.conv_id AND r.sid = c.sid
              AND r.call_turn_idx = c.turn_idx
),
firsts AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, sid, call_turn_idx
                                 ORDER BY response_turn_idx) AS rn2
    FROM pairs) t WHERE rn2 = 1
),
cond AS (
  SELECT * FROM firsts
  WHERE call_text IS NOT NULL AND length(trim(call_text)) > 0
    AND response_text IS NOT NULL AND length(trim(response_text)) > 0
),
numbered AS (
  SELECT conv_id, window_start,
         CAST(ROW_NUMBER() OVER (PARTITION BY conv_id
              ORDER BY sid, call_turn_idx, response_turn_idx) - 1 AS INT)
           AS example_idx,
         CAST(call_turn_idx AS INT) AS call_turn_idx,
         CAST(response_turn_idx AS INT) AS response_turn_idx,
         tool, call_text, response_text
  FROM cond
)
SELECT conv_id, epoch_us(window_start) AS window_start_us, example_idx,
       call_turn_idx, response_turn_idx, tool, call_text, response_text
FROM numbered WHERE example_idx < 100
"""
)


@register("curate_sessions_kernel", _SESSIONS_KERNEL_ORACLE)
def q_curate_sessions_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized curate via the shared batch/stream kernel (W5 core),
    oracle-checked under the default conversation-scope config. The
    engine-specific ``text_hash`` column is dropped and ``window_start``
    integerized for the cross-engine compare."""
    from data_harvesting_spark.config import HarvestConfig
    from data_harvesting_spark.operators.curate_sessions import curate_sessions

    t = load_transcripts_from_events(spark, sf_dir)
    out = curate_sessions(t, HarvestConfig(session_gap="30 minutes"))
    return out.select(
        "conv_id",
        F.unix_micros("window_start").alias("window_start_us"),
        "example_idx",
        "call_turn_idx",
        "response_turn_idx",
        "tool",
        "call_text",
        "response_text",
    )


# ---------------------------------------------------------------- §2.6 strings
@register(
    "label_lines",
    _with_t(
        """
SELECT conv_id,
       string_agg(printf('%d %s %s', turn_idx, role, coalesce(text, '')),
                  chr(10) ORDER BY turn_idx) AS label_text
FROM transcripts
GROUP BY conv_id
"""
    ),
)
def q_label_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 string surface — the reference's label-file assembly
    (`/root/reference/condition.py:130-157` emits one text line per box,
    joined into a label file): format_string per turn + ordered concat_ws
    per conversation, all JVM-side."""
    t = load_transcripts_from_events(spark, sf_dir)
    line = F.format_string(
        "%d %s %s", F.col("turn_idx"), F.col("role"),
        F.coalesce(F.col("text"), F.lit("")),
    )
    assembled = (
        t.select("conv_id", F.struct("turn_idx", line.alias("line")).alias("s"))
        .groupBy("conv_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(F.collect_list("s")), lambda x: x["line"]
                ),
            ).alias("label_text")
        )
    )
    return assembled


# ---------------------------------------------------------------- A8 quantiles
@register(
    "latency_quantiles",
    _with_t(
        """
, lat AS (
  SELECT tool,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS lat_us
  FROM transcripts
)
SELECT tool,
       CAST(floor(quantile_cont(lat_us, 0.5)) AS BIGINT) AS p50_us,
       CAST(floor(quantile_cont(lat_us, 0.95)) AS BIGINT) AS p95_us,
       CAST(count(lat_us) AS BIGINT) AS n
FROM lat WHERE tool IS NOT NULL
GROUP BY tool
"""
    ),
)
def q_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 extension — per-tool inter-turn latency p50/p95 via exact
    interpolated percentile (matches DuckDB quantile_cont); the scale path
    swaps in `percentile_approx` (t-digest sketch) — same plan shape, no
    global sort."""
    t = load_transcripts_from_events(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lat = t.withColumn(
        "lat_us", F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    )
    return (
        lat.where(F.col("tool").isNotNull())
        .groupBy("tool")
        .agg(
            F.floor(F.percentile("lat_us", F.lit(0.5))).cast("bigint").alias("p50_us"),
            F.floor(F.percentile("lat_us", F.lit(0.95))).cast("bigint").alias("p95_us"),
            F.count("lat_us").alias("n"),
        )
    )


# ---------------------------------------------------------------- quality:
# C4-style cross-conversation boilerplate strip (turn-level line dedup)
@register(
    "boilerplate_strip",
    _with_t(
        """
, norm AS (
  SELECT conv_id, turn_idx, role, text,
         lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS ntext
  FROM transcripts
),
bp AS (
  SELECT ntext
  FROM (SELECT DISTINCT ntext, conv_id FROM norm)
  GROUP BY ntext HAVING count(*) >= 5
)
SELECT conv_id, turn_idx, role, text
FROM norm WHERE ntext NOT IN (SELECT ntext FROM bp)
"""
    ),
)
def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-dedup mapped to turns: drop turns whose normalized text
    occurs in >= 5 distinct conversations (canned boilerplate, empty
    filler). Spark side anti-joins on the 8-byte xxhash64 key with the
    Zipf-small boilerplate dim broadcast; the oracle compares on the
    normalized text itself — identical result absent a 64-bit hash
    collision, which the fixture does not contain."""
    from data_harvesting_spark.operators.quality import boilerplate_turns

    t = load_transcripts_from_events(spark, sf_dir)
    return boilerplate_turns(t, min_convs=5)


# ---------------------------------------------------------------- quality:
# degenerate-loop detection (gaps-and-islands on consecutive same-tool runs)
@register(
    "tool_loops",
    _with_t(
        """
, tool_turns AS (
  SELECT conv_id, turn_idx, tool,
         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM transcripts WHERE tool IS NOT NULL
),
isl AS (
  SELECT conv_id, tool, turn_idx,
         rn - ROW_NUMBER() OVER (PARTITION BY conv_id, tool ORDER BY turn_idx)
           AS grp
  FROM tool_turns
),
runs AS (
  SELECT conv_id, tool,
         CAST(min(turn_idx) AS INT) AS run_start,
         CAST(count(*) AS BIGINT) AS run_len
  FROM isl GROUP BY conv_id, tool, grp
)
SELECT conv_id, tool, run_start, run_len
FROM runs WHERE run_len >= 4
"""
    ),
)
def q_tool_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-loop detection: maximal consecutive same-tool runs of
    length >= 4 within a conversation (gaps-and-islands; the transcript
    analog of the reference's consecutive-near-identical-emission concern,
    `services/harvest_service.py:207-231`)."""
    from data_harvesting_spark.operators.quality import degenerate_tool_runs

    t = load_transcripts_from_events(spark, sf_dir)
    return degenerate_tool_runs(t, min_run=4)


# ---------------------------------------------------------------- quality:
# behavioral near-dup — tool-workflow Jaccard between conversations
@register(
    "similar_workflows",
    _with_t(
        """
, calls AS (
  SELECT conv_id, turn_idx, tool,
         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM transcripts WHERE role = 'assistant' AND tool IS NOT NULL
),
bg AS (
  SELECT DISTINCT a.conv_id, a.tool || '>' || b.tool AS bigram
  FROM calls a JOIN calls b
    ON a.conv_id = b.conv_id AND b.rn = a.rn + 1
),
sz AS (SELECT conv_id, count(*) AS s FROM bg GROUP BY conv_id),
inter AS (
  SELECT a.conv_id AS ca, b.conv_id AS cb, count(*) AS i
  FROM bg a JOIN bg b ON a.bigram = b.bigram AND a.conv_id < b.conv_id
  GROUP BY 1, 2
)
SELECT ca AS conv_a, cb AS conv_b,
       CAST(i AS INT) AS inter,
       CAST(sa.s AS INT) AS sz_a, CAST(sb.s AS INT) AS sz_b,
       round(i * 1.0 / (sa.s + sb.s - i), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.conv_id = ca
JOIN sz sb ON sb.conv_id = cb
WHERE i * 1.0 / (sa.s + sb.s - i) >= 0.6
"""
    ),
)
def q_similar_workflows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral near-dup: conversation pairs with tool-call-bigram
    Jaccard >= 0.6. The Spark side collapses conversations onto distinct
    bigram-set signatures before the pairwise stage (bounded feature
    vocabulary — never a hot-key quadratic join); the oracle is the plain
    quadratic formulation."""
    from data_harvesting_spark.operators.quality import workflow_similarity

    t = load_transcripts_from_events(spark, sf_dir)
    return workflow_similarity(t, threshold=0.6)


# ---------------------------------------------------------------- rollup:
# multi-level GROUPING SETS report (role × tool with subtotals)
@register(
    "harvest_rollup",
    _with_t(
        """
SELECT role, tool,
       CAST(GROUPING(role, tool) AS INT) AS lvl,
       CAST(count(*) AS BIGINT) AS n
FROM transcripts GROUP BY ROLLUP(role, tool)
"""
    ),
)
def q_harvest_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level rollup report: per (role, tool) counts with per-role
    subtotals and a grand total in ONE pass (GROUPING SETS — Spark expands
    the rollup inside a single hash aggregate; `grouping_id` disambiguates
    rolled-up NULLs from genuine NULL tools). The reference emits the same
    shape as its nested run report (`utils/ReturnObject.py:24-63`)."""
    t = load_transcripts_from_events(spark, sf_dir)
    return (
        t.rollup("role", "tool")
        .agg(
            F.grouping_id().cast("int").alias("lvl"),
            F.count("*").cast("bigint").alias("n"),
        )
        .select("role", "tool", "lvl", "n")
    )


# ---------------------------------------------------------------- pivot:
# per-conversation role composition as columns
@register(
    "role_pivot",
    _with_t(
        """
SELECT conv_id,
       CAST(count(CASE WHEN role = 'user' THEN 1 END) AS BIGINT) AS n_user,
       CAST(count(CASE WHEN role = 'assistant' THEN 1 END) AS BIGINT)
           AS n_assistant,
       CAST(count(CASE WHEN role = 'tool' THEN 1 END) AS BIGINT) AS n_tool
FROM transcripts GROUP BY conv_id
"""
    ),
)
def q_role_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot surface: per-conversation role composition as wide columns
    (`groupBy().pivot()` with the value list pinned — pinning skips the
    extra distinct-values job AND keeps the one-pass hash-agg plan; the
    oracle is the equivalent conditional aggregation)."""
    t = load_transcripts_from_events(spark, sf_dir)
    p = (
        t.groupBy("conv_id")
        .pivot("role", ["user", "assistant", "tool"])
        .count()
    )
    return p.select(
        "conv_id",
        F.coalesce("user", F.lit(0)).cast("bigint").alias("n_user"),
        F.coalesce("assistant", F.lit(0)).cast("bigint").alias("n_assistant"),
        F.coalesce("tool", F.lit(0)).cast("bigint").alias("n_tool"),
    )


# ---------------------------------------------------------------- export:
# SFT context→target pair extraction (framed ordered aggregation)
@register(
    "sft_pairs",
    _with_t(
        """
, ctx AS (
  SELECT conv_id, turn_idx, role, text,
         string_agg(role || ': ' || text, CHR(10))
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS context
  FROM transcripts
)
SELECT conv_id, turn_idx, context, text AS target
FROM ctx
WHERE role = 'assistant' AND length(trim(text)) > 0
  AND context IS NOT NULL
"""
    ),
)
def q_sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT training-pair extraction: for every non-empty assistant turn,
    the concatenation of up to 3 preceding turns (sliding row frame) as
    context, the turn text as target — the last-mile export a fine-tuning
    pipeline runs after curation (reference's image+label pair export,
    `exports/yolov8/yolov8_export.py:63-90`, re-expressed for text).

    Plan: the framed collect rides the SAME conv_id exchange as the
    transcript derivation (one extra sort, zero extra shuffles). The
    collected structs are sort_array'ed before joining, so the context
    string is deterministic regardless of frame evaluation order.
    Shared definition: ``operators/aggregates.py::sft_pairs_frame`` (the
    streaming SFT export job consumes the same function — r4)."""
    from data_harvesting_spark.operators.aggregates import sft_pairs_frame

    t = load_transcripts_from_events(spark, sf_dir)
    return sft_pairs_frame(t, context_turns=3)


# ---------------------------------------------------------------- export:
# DPO preference-pair extraction (reward-ranked chosen/rejected per task)
_TV = transcripts_with_value_sql("events")

_DPO_SQL = f"""
WITH transcripts AS ({_TV}),
cand AS (
  SELECT conv_id, turn_idx, text,
         LAG(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS tool,
         CAST(FLOOR(value * 1000) AS BIGINT) AS reward
  FROM transcripts
),
scored AS (
  SELECT conv_id, turn_idx, text, tool, reward
  FROM cand
  WHERE turn_idx % 4 = 3 AND tool IS NOT NULL
    AND reward IS NOT NULL AND length(trim(text)) > 0
),
ranked AS (
  SELECT conv_id, turn_idx, text, tool, reward,
         CAST(ROW_NUMBER() OVER (PARTITION BY tool
              ORDER BY reward DESC, conv_id, turn_idx) AS INT) AS rn,
         COUNT(*) OVER (PARTITION BY tool) AS n
  FROM scored
)
SELECT r.tool,
       c.conv_id AS chosen_conv,  c.turn_idx AS chosen_turn,
       c.text    AS chosen_text,  c.reward   AS chosen_reward,
       r.conv_id AS rejected_conv, r.turn_idx AS rejected_turn,
       r.text    AS rejected_text, r.reward   AS rejected_reward
FROM ranked c
JOIN ranked r ON c.tool = r.tool
WHERE c.rn = 1 AND r.rn = r.n AND r.n >= 2 AND c.reward > r.reward
"""


@register("dpo_pairs", _DPO_SQL)
def q_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO/RLHF preference-pair extraction: for every task tool, rank the
    wrap-up assistant turns (the turn after the tool response) by the
    event's reward signal; emit (chosen = best, rejected = worst) with a
    strict reward gap — the best-of-n preference export a post-training
    pipeline runs after curation. The reward rides the shared derivation
    via ``transcripts_with_value_sql`` so both engines score identically
    (FLOOR-integerized: no float value-hash flakes, no half-even
    rounding divergence).

    Plan: the LAG window rides the derivation's conv_id exchange (zero
    extra shuffles to score candidates); chosen and rejected then come
    from ONE ``min_by``/``max_by`` hash aggregation on tool — a
    declarative aggregate, so Spark partial-aggregates map-side and the
    tool exchange moves at most 2 candidate rows per tool per input
    partition. No join, no per-tool sort: a hot tool costs O(its rows)
    scanned, O(1) shuffled — the shape that survives 100 TB with a
    handful of giant tools. (The oracle keeps the equivalent window
    formulation; the tie-break key (-reward, conv_id, turn_idx) is the
    same total order, and it is duplicate-free, so both pick identical
    rows.)"""
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    t = spark.sql(transcripts_with_value_sql("events"))
    w_conv = Window.partitionBy("conv_id").orderBy("turn_idx")
    cand = t.select(
        "conv_id",
        "turn_idx",
        "text",
        F.lag("tool").over(w_conv).alias("tool"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("reward"),
    )
    scored = cand.where(
        (F.col("turn_idx") % 4 == 3)
        & F.col("tool").isNotNull()
        & F.col("reward").isNotNull()
        & (F.length(F.trim("text")) > 0)
    )
    payload = F.struct("conv_id", "turn_idx", "text", "reward")
    order_key = F.struct(
        (-F.col("reward")).alias("neg_reward"),
        F.col("conv_id").alias("conv_id"),
        F.col("turn_idx").alias("turn_idx"),
    )
    agg = scored.groupBy("tool").agg(
        F.min_by(payload, order_key).alias("ch"),
        F.max_by(payload, order_key).alias("rj"),
        F.count("*").alias("n"),
    )
    return (
        agg.where(
            (F.col("n") >= 2)
            & (F.col("ch.reward") > F.col("rj.reward"))
        )
        .select(
            "tool",
            F.col("ch.conv_id").alias("chosen_conv"),
            F.col("ch.turn_idx").alias("chosen_turn"),
            F.col("ch.text").alias("chosen_text"),
            F.col("ch.reward").alias("chosen_reward"),
            F.col("rj.conv_id").alias("rejected_conv"),
            F.col("rj.turn_idx").alias("rejected_turn"),
            F.col("rj.text").alias("rejected_text"),
            F.col("rj.reward").alias("rejected_reward"),
        )
    )


# ------------------------------------------------------- context-window trim
# The serving/teacher-forcing truncation every LLM pipeline runs before
# packing a conversation into a fixed context window: keep the LONGEST
# SUFFIX of turns whose total token count fits the budget (most-recent
# context wins), never emitting an empty conversation — the final turn
# survives even when it alone busts the budget. Reference analog: the
# harvester's per-message frame cap (`/root/reference/services/
# harvest_service.py:156-170` keeps the newest frames when the buffer
# overflows).

_CTX_BUDGET = 48

_CTX_SQL = _with_t(f"""
, tok AS (
  SELECT conv_id, turn_idx, role, tool, text,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
  FROM transcripts
),
cum AS (
  SELECT *,
         CAST(sum(n_tokens) OVER (
           PARTITION BY conv_id ORDER BY turn_idx DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS ctx_tokens,
         max(turn_idx) OVER (PARTITION BY conv_id) AS last_idx
  FROM tok
)
SELECT conv_id, turn_idx, role, tool, text,
       CAST(n_tokens AS INT) AS n_tokens, ctx_tokens
FROM cum
WHERE ctx_tokens <= {_CTX_BUDGET} OR turn_idx = last_idx
""")


@register("context_trim", _CTX_SQL)
def q_context_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-budget context truncation: one reverse running-sum window
    and one per-conv max, BOTH satisfied by a single
    hashpartitioning(conv_id) exchange — the same one-exchange profile as
    `curate_pairs`. No global sort, no single-partition stage; at 100 TB
    the cost is one conversation-keyed shuffle of the turn table."""
    from data_harvesting_spark.operators.curate import context_window_trim

    t = load_transcripts_from_events(spark, sf_dir)
    return context_window_trim(t, budget=_CTX_BUDGET)


# ------------------------------------------------- CEP failure->retry
# MATCH_RECOGNIZE-style sequence pattern (the north-star's CEP framing
# made explicit): a tool call whose response is blank/absent, retried by
# the conversation's next call with the SAME tool. Shared semantics with
# the streaming detector (operators/patterns.py docstring).

_PATTERN_SQL = _with_t("""
, seq AS (
  SELECT conv_id, turn_idx, role, tool,
         LEAD(turn_idx) OVER w AS n_idx,
         LEAD(role)     OVER w AS n_role,
         LEAD(text)     OVER w AS n_text
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
calls AS (
  SELECT conv_id, turn_idx, tool,
         CASE WHEN n_idx = turn_idx + 1 AND n_role = 'tool'
              THEN CASE WHEN length(trim(n_text)) = 0
                        THEN 'error' ELSE 'ok' END
              ELSE 'missing' END AS outcome
  FROM seq
  WHERE role = 'assistant' AND tool IS NOT NULL
),
paired AS (
  SELECT conv_id, turn_idx, tool, outcome,
         LEAD(turn_idx) OVER w2 AS retry_idx,
         LEAD(tool)     OVER w2 AS next_tool
  FROM calls
  WINDOW w2 AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id,
       CAST(turn_idx AS INT)  AS fail_idx,
       CAST(retry_idx AS INT) AS retry_idx,
       tool, outcome
FROM paired
WHERE outcome <> 'ok' AND next_tool = tool
""")


@register("pattern_failed_retry", _PATTERN_SQL)
def q_pattern_failed_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP failure->retry pattern matches (see operators/patterns.py).
    Scale posture: outcome lookup and next-call pairing are both lead
    windows over the SAME conv_id partitioning — one hash exchange total,
    no self-join; at 100 TB the cost is one conversation-keyed shuffle of
    the turn table, identical to the flagship's profile."""
    from data_harvesting_spark.operators.patterns import failed_retry_matches

    t = load_transcripts_from_events(spark, sf_dir)
    return failed_retry_matches(t)


# ---------------------------------------------- CEP absence/timeout pattern
# The negative-pattern sibling of pattern_failed_retry: tool calls with
# no IN-TIME response (a tool-role turn at call_idx+1 whose event time is
# within 24h of the call). 'late' = the response exists but missed the
# deadline; 'absent' = no tool response at call_idx+1 at all. All times
# exact integer epoch micros. The streaming twin
# (streaming/timeouts.py) emits the same match set at per-call
# event-time deadlines — see operators/patterns.py::timeout_matches.

_TIMEOUT_US = 24 * 3600 * 1_000_000  # 24 hours

_TIMEOUT_SQL = _with_t(f"""
, seq AS (
  SELECT conv_id, turn_idx, role, tool, ts,
         LEAD(turn_idx) OVER w AS n_idx,
         LEAD(role) OVER w AS n_role,
         LEAD(ts) OVER w AS n_ts
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
calls AS (
  SELECT conv_id, turn_idx, tool, ts, n_ts,
         COALESCE(n_idx = turn_idx + 1 AND n_role = 'tool', FALSE)
           AS responded
  FROM seq
  WHERE role = 'assistant' AND tool IS NOT NULL
)
SELECT conv_id,
       CAST(turn_idx AS INT) AS call_idx,
       tool,
       epoch_us(ts) AS call_us,
       CASE WHEN responded
                 AND epoch_us(n_ts) - epoch_us(ts) > {_TIMEOUT_US}
            THEN 'late'
            WHEN NOT responded THEN 'absent' END AS status,
       CASE WHEN responded
            THEN epoch_us(n_ts) - epoch_us(ts) END AS wait_us
FROM calls
WHERE (responded AND epoch_us(n_ts) - epoch_us(ts) > {_TIMEOUT_US})
   OR NOT responded
""")


@register("pattern_tool_timeout", _TIMEOUT_SQL)
def q_pattern_tool_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP absence/timeout pattern matches (see comment above and
    operators/patterns.py::timeout_matches). Scale posture: ONE lead
    window over the conv_id partitioning — a single hash exchange of
    the turn table, no self-join; at 100 TB the profile is identical to
    pattern_failed_retry's."""
    from data_harvesting_spark.operators.patterns import timeout_matches

    t = load_transcripts_from_events(spark, sf_dir)
    return timeout_matches(t, _TIMEOUT_US / 1_000_000)


# ------------------------------------------------- tool-transition PageRank
# Graph centrality over the tool-TRANSITION graph: nodes = tools, a
# directed edge src->dst for every consecutive pair of tool calls inside
# one conversation, weighted by count. PageRank (d=0.85, 3 iterations,
# uniform init; dangling tools simply leak mass — documented variant)
# answers "which tool is most central in agent workflows". The heavy part
# at 100 TB is the transition aggregation (one conv_id window + one
# (src,dst) hash agg); the iteration itself runs on the tool DIMENSION
# (bounded, broadcast-sized), unrolled as joins — the same
# loop-unrolled-into-SQL pattern as embedding_kmeans_k2 /
# embedding_pca_power. Scores round to 6 decimals on BOTH engines (ulp
# drift from unordered float sums is ~1e-14, far below the rounding
# step — the tfidf_top_terms precedent).

_PAGERANK_ITER = """
it{k} AS (
  SELECT nodes.tool,
         0.15 / n.n + 0.85 * COALESCE(SUM(p.pr * e.cnt / o.out_w), 0) AS pr
  FROM nodes CROSS JOIN n
  LEFT JOIN edges e ON e.dst = nodes.tool
  LEFT JOIN it{prev} p ON p.tool = e.src
  LEFT JOIN outs o ON o.src = e.src
  GROUP BY nodes.tool, n.n
)"""

_PAGERANK_SQL = _with_t(
    """
, calls AS (
  SELECT conv_id, turn_idx, tool FROM transcripts
  WHERE role = 'assistant' AND tool IS NOT NULL
),
seq AS (
  SELECT tool AS src,
         LEAD(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS dst
  FROM calls
),
edges AS (
  SELECT src, dst, CAST(count(*) AS DOUBLE) AS cnt
  FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
),
nodes AS (SELECT DISTINCT tool FROM calls),
outs AS (SELECT src, SUM(cnt) AS out_w FROM edges GROUP BY src),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
it0 AS (SELECT tool, 1.0 / n.n AS pr FROM nodes CROSS JOIN n),
"""
    + ",".join(
        _PAGERANK_ITER.format(k=k, prev=k - 1) for k in (1, 2, 3)
    )
    + """
SELECT tool, ROUND(pr, 6) AS pagerank FROM it3
"""
)


@register("tool_pagerank", _PAGERANK_SQL)
def q_tool_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the tool-transition graph (see comment above).
    Scale posture: the conv_id window rides the derivation's existing
    exchange; the (src, dst) aggregate shuffles post-partial-agg (at most
    |tools|^2 rows move); every iteration join is over the broadcast-
    sized tool dimension."""
    t = load_transcripts_from_events(spark, sf_dir)
    calls = t.where(
        (F.col("role") == "assistant") & F.col("tool").isNotNull()
    ).select("conv_id", "turn_idx", "tool")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = calls.select(
        F.col("tool").alias("src"), F.lead("tool").over(w).alias("dst")
    )
    edges = (
        seq.where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    nodes = calls.select("tool").distinct()
    outs = edges.groupBy("src").agg(F.sum("cnt").alias("out_w"))
    n = nodes.count()  # bounded: the tool dimension
    if n == 0:
        # no tool calls at all: empty graph, empty ranking (the SQL
        # oracle's CTEs are likewise empty) — avoid the 1/0 below
        return calls.select(
            "tool", F.lit(0.0).alias("pagerank")
        ).limit(0)
    pr = nodes.select("tool", F.lit(1.0 / n).alias("pr"))
    for _ in range(3):
        contrib = (
            edges.join(
                F.broadcast(pr.withColumnRenamed("tool", "src")), "src"
            )
            .join(F.broadcast(outs), "src")
            .groupBy(F.col("dst").alias("tool"))
            .agg(F.sum(F.col("pr") * F.col("cnt") / F.col("out_w")).alias("s"))
        )
        pr = nodes.join(F.broadcast(contrib), "tool", "left").select(
            "tool",
            (
                F.lit(0.15 / n)
                + F.lit(0.85) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("pr"),
        )
    return pr.select("tool", F.round("pr", 6).alias("pagerank"))


# --------------------------------------- generic CEP: dialog triple pattern
# The generic contiguous sequence matcher (operators/cep.py) with the
# stock user -> assistant-tool-call -> tool-response pattern: one row
# per complete dialog exchange, by ROW adjacency in the conversation's
# turn order (MATCH_RECOGNIZE row-sequence semantics). Streaming twin:
# streaming/cep.py via start_seq_pattern_stream_job.

_SEQ_DIALOG_SQL = _with_t("""
, seq AS (
  SELECT conv_id, turn_idx, role, tool,
         LEAD(turn_idx, 1) OVER w AS i1,
         LEAD(role, 1)     OVER w AS r1,
         LEAD(tool, 1)     OVER w AS t1,
         LEAD(turn_idx, 2) OVER w AS i2,
         LEAD(role, 2)     OVER w AS r2
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id,
       CAST(turn_idx AS INT) AS s0_idx,
       CAST(i1 AS INT)       AS s1_idx,
       CAST(i2 AS INT)       AS s2_idx,
       t1                    AS tool
FROM seq
WHERE role = 'user' AND r1 = 'assistant' AND t1 IS NOT NULL
  AND r2 = 'tool'
""")


@register("pattern_seq_dialog", _SEQ_DIALOG_SQL)
def q_pattern_seq_dialog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic-CEP dialog-exchange matches (see operators/cep.py).
    Scale posture: per-step predicates evaluate in-row; the n-1 lead
    chains share ONE Exchange+Sort on conv_id (plan-asserted), no
    self-join — pattern length changes the expression count, not the
    shuffle count."""
    from data_harvesting_spark.operators.cep import DIALOG_TRIPLE, seq_match

    t = load_transcripts_from_events(spark, sf_dir)
    out = seq_match(t, ["conv_id"], ["turn_idx"], DIALOG_TRIPLE)
    return out.select(
        "conv_id",
        F.col("s0_idx").cast("int").alias("s0_idx"),
        F.col("s1_idx").cast("int").alias("s1_idx"),
        F.col("s2_idx").cast("int").alias("s2_idx"),
        "tool",
    )
