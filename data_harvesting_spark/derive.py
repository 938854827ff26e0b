"""Shared transcript derivation from the driver's ``events`` table.

The DuckDB-oracle correctness gate compares Spark results against ANSI SQL
run on the same parquet files (TESTDATA.md). Transcript-shaped operators
therefore derive a deterministic transcript view from ``events`` using ONLY
constructs both engines evaluate identically:

- total ordering (ties broken by event_id),
- integer modulo shape assignment,
- window functions (row_number, lag),
- string concat / CASE WHEN.

No engine-specific hash functions appear in the derivation. The SQL below is
executed verbatim by both Spark (``spark.sql``) and DuckDB (oracle), so a
value mismatch is a real engine bug, never a fixture skew.

events schema: (event_id bigint, ts timestamp, user_id bigint,
event_type string, value double, props string)
"""

from __future__ import annotations

# The ROW_NUMBER partitions by the conv_id EXPRESSION (not user_id) on
# purpose: 'conv-'||user_id is a bijection of user_id, so semantics are
# identical in both engines, but Spark's window exchange then hash-
# partitions by exactly the key every downstream operator clusters on —
# the flagship curate can consume the derivation with zero extra shuffles
# (see operators/curate.py pre_clustered).
#
# Shape encoding per turn position k = turn_idx % 4:
#   k=0 user, k=1 assistant tool-call, k=2 tool response (same tool via lag),
#   k=3 assistant wrap-up.
# Fault injection by event_id residues:
#   %17==0  → empty text        (P6 forall fixtures)
#   %13==0  → duplicate payload (A1 dedup fixtures)
#   %19==0 on k=2 → response dropped (orphan-call fixtures, J3 negative)
TRANSCRIPTS_FROM_EVENTS_SQL = """
WITH base AS (
  SELECT 'conv-' || CAST(user_id AS STRING) AS conv_id,
         event_id, ts, event_type, value, props
  FROM {events}
),
ordered AS (
  SELECT
    conv_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts, event_id) - 1 AS INT)
                                        AS turn_idx,
    event_id, ts, event_type, value, props
  FROM base
),
shaped AS (
  SELECT
    conv_id, turn_idx, event_id, ts,
    CASE WHEN turn_idx % 4 = 0 THEN 'user'
         WHEN turn_idx % 4 = 2 THEN 'tool'
         ELSE 'assistant' END AS role,
    CASE WHEN turn_idx % 4 = 1 THEN event_type
         WHEN turn_idx % 4 = 2 THEN
              LAG(event_type) OVER (PARTITION BY conv_id ORDER BY turn_idx)
         ELSE NULL END AS tool,
    CASE WHEN event_id % 17 = 0 THEN ''
         WHEN event_id % 13 = 0 THEN 'duplicate payload ' || event_type
         ELSE 'turn ' || CAST(event_id % 101 AS STRING) || ' '
              || COALESCE(props, '') END AS text
  FROM ordered
)
SELECT conv_id, turn_idx, role, text, tool,
       CAST(ts AS TIMESTAMP) AS ts
FROM shaped
WHERE NOT (turn_idx % 4 = 2 AND event_id % 19 = 0)
"""


# Reward-carrying variant: identical derivation, but the source event's
# ``value`` column rides along as a per-turn reward signal (the preference
# score a DPO/RLHF extraction ranks on). Built by targeted substitution so
# the two variants can never drift on the shared rules; a unit test pins
# column-for-column equality on the common columns.
TRANSCRIPTS_WITH_VALUE_SQL = TRANSCRIPTS_FROM_EVENTS_SQL.replace(
    "    conv_id, turn_idx, event_id, ts,\n    CASE WHEN turn_idx % 4 = 0",
    "    conv_id, turn_idx, event_id, ts, value,\n"
    "    CASE WHEN turn_idx % 4 = 0",
).replace(
    "SELECT conv_id, turn_idx, role, text, tool,",
    "SELECT conv_id, turn_idx, role, text, tool, value,",
)

assert "value,\n    CASE" in TRANSCRIPTS_WITH_VALUE_SQL
assert "tool, value," in TRANSCRIPTS_WITH_VALUE_SQL


def transcripts_with_value_sql(events_rel: str = "events") -> str:
    """SQL for the reward-carrying transcript view (adds ``value``)."""
    return TRANSCRIPTS_WITH_VALUE_SQL.format(events=events_rel)


def transcripts_sql(events_rel: str = "events") -> str:
    """SQL producing the transcript view; ``events_rel`` is the relation name
    (a registered view in both engines)."""
    return TRANSCRIPTS_FROM_EVENTS_SQL.format(events=events_rel)


def load_transcripts_from_events(spark, sf_dir: str):
    """Spark side of the shared derivation: read events parquet, run the
    identical SQL."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.createOrReplaceTempView("events")
    return spark.sql(transcripts_sql("events"))
