"""Fixed StructType schemas (SURVEY.md §1.2).

The reference is schema-free, dynamically-typed Python; the engine pins
explicit schemas per BASELINE.json ``input_hint``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Primary input (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),  # 'user'|'assistant'|'tool'
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

# Curated output (FIXTURES.md F2) — sink idempotency key (conv_id, window_start).
CURATED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("window_start", TimestampType(), True),
        StructField("example_idx", IntegerType(), False),
        StructField("call_turn_idx", IntegerType(), False),
        StructField("response_turn_idx", IntegerType(), False),
        StructField("tool", StringType(), True),
        StructField("call_text", StringType(), True),
        StructField("response_text", StringType(), True),
        StructField("text_hash", LongType(), True),
    ]
)

# Per-window harvest-rate aggregates (FIXTURES.md F3).
HARVEST_RATES_SCHEMA = StructType(
    [
        StructField("window_start", TimestampType(), False),
        StructField("window_end", TimestampType(), False),
        StructField("grain", StringType(), False),  # 'tool' | 'role'
        StructField("key", StringType(), True),
        StructField("turn_count", LongType(), False),
        StructField("conv_approx_distinct", LongType(), False),
    ]
)

# Multimodal sample row: opaque binary payload + typed metadata
# (training-data pipeline surface; decode itself is stubbed — see
# operators/multimodal.py).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # 'image'|'audio'|'video'
        StructField("payload", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
        StructField("ts", TimestampType(), True),
    ]
)

# Feature row produced by multimodal extraction.
MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload_hash", LongType(), False),
        StructField("features", ArrayType(StringType()), True),
    ]
)


# Events stream (TESTDATA.md events table) — the relational/funnel source.
EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)
