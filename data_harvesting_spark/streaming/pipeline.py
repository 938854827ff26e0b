"""Streaming job builders — the ``queue_harvesting.py`` analog (E1).

readStream → watermark → stateful correlate → foreachBatch idempotent sink,
plus the windowed harvest-rate aggregate stream. File-based micro-batch
source locally; ``format('iceberg')``/Kafka are config swaps on a real
cluster (same plan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_harvesting_spark.config import HarvestConfig
from data_harvesting_spark.functions.text import text_hash
from data_harvesting_spark.schema import TRANSCRIPT_SCHEMA
from data_harvesting_spark.streaming.sink import sink_for
from data_harvesting_spark.streaming.state import correlate_stream


def read_transcript_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """File micro-batch source over parquet slices (F5 replay layout).

    ``maxFilesPerTrigger=1`` makes each slice one micro-batch —
    deterministic replay for kill-resume tests. On a cluster this becomes
    ``spark.readStream.format("iceberg").load(table)`` or Kafka; the rest
    of the pipeline is unchanged.
    """
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(source_dir)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def curated_stream(
    stream: DataFrame, cfg: HarvestConfig, late_counter=None
) -> DataFrame:
    """transcript stream → curated pairs stream (stateful kernel path)."""
    with_hash = stream.withColumn("text_hash", text_hash("text"))
    return correlate_stream(with_hash, cfg, late_counter)


def start_curate_job(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
    available_now: bool = True,
):
    """Run the end-to-end curate stream into the configured idempotent sink.

    Checkpointing ties source offsets to sink writes: a batch is replayed
    iff its write may not have committed, and the sink write is idempotent
    → exactly-once (W7, north_rule). Returns the StreamingQuery.
    """
    from data_harvesting_spark.config import validate_config

    validate_config(cfg, streaming_runner="kernel")  # J4 analog
    assert cfg.sink_path and cfg.checkpoint_dir, "configure sink + checkpoint"
    os.makedirs(cfg.sink_path, exist_ok=True)
    sink_fn = sink_for(cfg.sink_format)
    stream = read_transcript_stream(spark, source_dir)
    # W6 late-drop accounting for the kernel path (the JVM paths report
    # numRowsDroppedByWatermark natively; applyInPandasWithState does not
    # pre-filter, so the handler drops + counts via this accumulator)
    late_counter = spark.sparkContext.accumulator(0)
    curated = curated_stream(stream, cfg, late_counter)

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        sink_fn(df, epoch_id, cfg.sink_path)

    writer = (
        curated.writeStream.outputMode("append")
        .option("checkpointLocation", cfg.checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.late_counter = late_counter
    return q


def start_rates_job(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
    sink_path: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    available_now: bool = True,
    grain: str = "tool",
):
    """Per-tool (or per-role) tumbling harvest-rate stream (W4) with
    watermark-closed append windows; HLL distinct (scale path).
    ``grain``: "tool" (non-null tools only, the reference's per-class
    harvest counts) or "role" (every turn attributes to its role).

    Watermark-vs-pushdown gotcha (pinned by
    tests/test_streaming.py::test_rates_stream_equals_batch): the
    ``tool IS NOT NULL`` filter is pushed to the parquet scan, so a file
    whose rows are ALL filtered out (row-group stats) is skipped before
    the EventTimeWatermark operator ever sees its event times — such rows
    advance no watermark. Operationally: watermark-driving heartbeat rows
    must carry values that survive the job's pushed filters.
    """
    if grain not in ("tool", "role"):
        raise ValueError(f"grain must be 'tool' or 'role', got {grain!r}")
    stream = read_transcript_stream(spark, source_dir)
    keyed = stream.withWatermark("ts", cfg.watermark_delay)
    if grain == "tool":
        keyed = keyed.where(F.col("tool").isNotNull())
    rates = (
        keyed.groupBy(F.window("ts", window).alias("w"), F.col(grain).alias("key"))
        .agg(
            F.count("*").alias("turn_count"),
            F.approx_count_distinct("conv_id").alias("conv_distinct"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.lit(grain).alias("grain"),
            "key",
            "turn_count",
            "conv_distinct",
        )
    )
    writer = (
        rates.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda df, epoch: sink_for("epoch")(df, epoch, sink_path)
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_union_rates_job(
    spark: SparkSession,
    source_dirs: list[str],
    cfg: HarvestConfig,
    sink_path: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    available_now: bool = True,
):
    """Multi-source ingestion: the tumbling per-tool rate aggregate over
    the UNION of several replay sources (reference analog: one consumer
    loop per camera queue feeding the same counters,
    /root/reference/queue_harvesting.py:30-68 — here N readStream
    sources union into one windowed aggregate).

    The property this job exists to carry (and the tests pin): each
    source holds its OWN event-time watermark, and Spark's GLOBAL
    watermark for the union is their MINIMUM — a window closes only
    when EVERY source has advanced past it. That is the correct
    completeness contract for multi-source ingestion at scale (a
    lagging source must hold results open or its late rows would be
    dropped from already-emitted windows), and it is also the
    operational failure mode to monitor: one stalled source freezes
    emission for the whole union. Counts per (window, tool) are
    source-agnostic — parity with the batch aggregate over the
    concatenated inputs once all sources flush.
    """
    if not source_dirs:
        raise ValueError("source_dirs must be non-empty")
    streams = [
        read_transcript_stream(spark, d).withWatermark(
            "ts", cfg.watermark_delay
        )
        for d in source_dirs
    ]
    unioned = streams[0]
    for s in streams[1:]:
        unioned = unioned.unionByName(s)
    rates = (
        unioned.where(F.col("tool").isNotNull())
        .groupBy(F.window("ts", window).alias("w"), "tool")
        .agg(F.count("*").alias("turn_count"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "tool",
            "turn_count",
        )
    )

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        from data_harvesting_spark.streaming.sink import write_epoch

        write_epoch(df, epoch_id, sink_path)

    writer = (
        rates.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_windowed_topk_stream_job(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
    sink_path: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    k: int = 3,
    available_now: bool = True,
):
    """Per-window top-k tools, FINALIZED on watermark close — the
    streaming twin of the batch ``topk_tools_windowed`` catalog query
    (reference analog: the per-class harvest counters the queue loop
    prints per cycle, /root/reference/queue_harvesting.py:30-68, here
    ranked per tumbling window instead of cumulatively).

    Two-stage shape, each stage in its natural engine:
    1. the exact (window, tool) counts run as Spark's native
       watermarked append-mode window aggregate — JVM state, map-side
       partials, watermark-evicted;
    2. append mode flushes ALL of a window's groups in the single
       micro-batch where the watermark crosses its end, so the top-k
       cut is a per-window rank INSIDE ``foreachBatch`` over exactly
       the finalized rows — no extra keyed state, no cross-batch
       bookkeeping, deterministic ties by (count DESC, tool ASC).
    At scale the rank partitions by window over one flush-batch's
    groups (≤ |tools| rows per window), negligible next to the count
    aggregate; windows whose end the final watermark never crosses
    stay buffered — same finite-replay contract as every append-mode
    job here (``drain()`` flushes what the sentinel proves closed).
    """
    from pyspark.sql import Window as W

    stream = read_transcript_stream(spark, source_dir)
    counts = (
        stream.withWatermark("ts", cfg.watermark_delay)
        .where(F.col("tool").isNotNull())
        .groupBy(F.window("ts", window).alias("w"), "tool")
        .agg(F.count("*").alias("turn_count"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "tool",
            "turn_count",
        )
    )

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        from data_harvesting_spark.streaming.sink import write_epoch

        rank_w = W.partitionBy("window_start").orderBy(
            F.desc("turn_count"), "tool"
        )
        ranked = (
            df.withColumn("rnk", F.row_number().over(rank_w))
            .where(F.col("rnk") <= k)
        )
        write_epoch(ranked, epoch_id, sink_path)

    writer = (
        counts.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_dedup_stream_job(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
    sink_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming-native exact dedup (A1 × W5): cross-micro-batch duplicate
    drop on ``(conv_id, xxhash64(normalized text))`` with watermark-bounded
    state — the streaming analog of ``operators/curate.py::dedup_turns``
    and of the reference tracker's persistent dedup-by-id
    (`/root/reference/condition.py:22-24`).

    ``dropDuplicatesWithinWatermark`` keeps the first-arriving copy of a
    key and evicts the key's state once the watermark passes its event
    time + delay, so state is O(keys inside the watermark window), never
    O(keys ever seen) — the bounded-state posture a long-lived stream
    needs (contrast: plain streaming ``dropDuplicates`` grows state
    forever). All JVM-side: the hash is ``xxhash64`` over the normalized
    text exactly as in batch, and the stateful operator is Spark's native
    one (RocksDB-backed).

    Parity contract vs batch dedup (keep-first-by-turn_idx): exact when a
    duplicate arrives within ``watermark_delay`` of its original and after
    it (the normal arrival contract, fixture-pinned by
    tests/test_streaming.py::test_dedup_stream_equals_batch). A duplicate
    surfacing later than the delay is re-emitted BY DESIGN — that is the
    price of bounded state, and the idempotent downstream sink (keyed
    MERGE) absorbs it.
    """
    from data_harvesting_spark.functions.text import normalize_text

    stream = read_transcript_stream(spark, source_dir)
    deduped = (
        stream.withColumn("norm_hash", F.xxhash64(normalize_text("text")))
        .withWatermark("ts", cfg.watermark_delay)
        .dropDuplicatesWithinWatermark(["conv_id", "norm_hash"])
        .drop("norm_hash")
    )
    writer = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda df, epoch: sink_for("epoch")(df, epoch, sink_path))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _read_hash_ledger(spark: SparkSession, ledger_path: str, epoch_id: int):
    """Latest seen-hash snapshot strictly before ``epoch_id`` (same
    per-epoch frozen-pre-state replay design as ``_read_cap_ledger``)."""
    return _read_cap_ledger(spark, ledger_path, epoch_id)


def start_neardup_stream_job(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
    sink_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    n: int = 3,
):
    """Streaming-native NEAR-dup suppression (the MinHash analog of
    ``start_dedup_stream_job``): cross-micro-batch LSH
    bucket-representative dedup of turn texts with a retention-bounded
    band-bucket ledger.

    Semantics = ``operators/dedup.py::lsh_bucket_dedup`` ordered by
    ``(ts, conv_id, turn_idx)``: a turn survives iff every one of its
    MinHash band buckets is unseen — both within the batch (window min
    over the bucket) and across batches (anti-join against the ledger of
    buckets seen in prior epochs). ALL observed buckets enter the ledger,
    kept or dropped — "content like this was seen" — which is exactly the
    batch rule (a dropped row still claims its buckets, because bucket
    min is taken over every row, not over survivors).

    Exactly-once composition is the frozen-pre-state ledger pattern
    (``_read_cap_ledger``): epoch N reads snapshot N-1, writes snapshot N;
    a replayed epoch recomputes identical output for the idempotent epoch
    sink. Ledger rows carry a last-seen event time and are evicted once
    the batch max event time passes ``cfg.cap_state_retention`` beyond it
    — state is O(buckets inside the retention), the same bounded-state
    trade as the exact-dedup ledger; a near-duplicate surfacing beyond
    the retention re-emits by design.

    Parity contract vs batch ``lsh_bucket_dedup`` (pinned by
    tests/test_streaming.py::test_neardup_stream_equals_batch): exact
    whenever arrival order across micro-batches is consistent with the
    ``(ts, conv_id, turn_idx)`` order, so each bucket's global first
    arrival lands in the earliest batch containing the bucket.
    """
    from data_harvesting_spark.operators.curate_sessions import (
        parse_duration_seconds,
    )
    from data_harvesting_spark.operators.dedup import minhash_bands

    ledger_path = sink_path.rstrip("/") + ".lshbuckets"
    retention_ms = int(parse_duration_seconds(cfg.cap_state_retention) * 1000)
    stream = read_transcript_stream(spark, source_dir)
    out_cols = stream.columns

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import Window

        from data_harvesting_spark.streaming.sink import write_epoch

        sp = df.sparkSession
        keyed = df.withColumn(
            "_k", F.struct("ts", "conv_id", "turn_idx")
        ).persist()
        try:
            hi = keyed.agg(
                F.unix_millis(F.max("ts")).alias("hi")
            ).collect()[0][0]
            bands = minhash_bands(
                keyed.select(F.col("_k").alias("doc_id"), "text"), n
            ).persist()
            try:
                w = Window.partitionBy("band", "band_sig")
                in_batch = (
                    bands.withColumn("_min", F.min("doc_id").over(w))
                    .where(F.col("doc_id") > F.col("_min"))
                    .select(F.col("doc_id").alias("_k"))
                )
                prior = _read_hash_ledger(sp, ledger_path, epoch_id)
                if prior is not None:
                    seen = bands.join(
                        prior, ["band", "band_sig"], "left_semi"
                    ).select(F.col("doc_id").alias("_k"))
                    losers = in_batch.unionByName(seen).distinct()
                else:
                    losers = in_batch.distinct()
                kept = keyed.join(losers, "_k", "left_anti").select(*out_cols)
                write_epoch(kept, epoch_id, sink_path)

                upd = bands.groupBy("band", "band_sig").agg(
                    F.unix_millis(F.max("doc_id.ts")).alias("_new_ms")
                )
                if prior is not None:
                    snapshot = prior.join(
                        upd, ["band", "band_sig"], "full_outer"
                    ).select(
                        "band",
                        "band_sig",
                        F.greatest(F.col("last_ms"), F.col("_new_ms"))
                        .cast("long").alias("last_ms"),
                    )
                else:
                    snapshot = upd.select(
                        "band", "band_sig",
                        F.col("_new_ms").cast("long").alias("last_ms"),
                    )
                if hi is not None:
                    snapshot = snapshot.where(
                        F.col("last_ms").isNull()
                        | (F.col("last_ms") + retention_ms >= F.lit(hi))
                    )
                snapshot.coalesce(4).write.mode("overwrite").parquet(
                    os.path.join(ledger_path, f"_epoch={epoch_id}")
                )
            finally:
                bands.unpersist()
            _prune_cap_ledger(ledger_path, epoch_id)
        finally:
            keyed.unpersist()

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_boilerplate_stream_job(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
    sink_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    min_convs: int = 3,
):
    """Streaming-native C4 boilerplate filter: cross-micro-batch
    frequency-based turn suppression — the streaming analog of
    ``operators/quality.py::boilerplate_turns`` and the third member of
    the streaming dedup family (exact ``start_dedup_stream_job``,
    near-dup ``start_neardup_stream_job``).

    Rule: a turn is dropped once its normalized-text hash has been seen
    in ``min_convs`` DISTINCT conversations cumulatively (prior epochs'
    ledger + the current batch). Earlier copies emitted before the text
    crossed the threshold stay emitted — prefix-consistent by design (a
    stream cannot retract); the retrospective batch operator re-run over
    the full corpus is the ground truth for a backfill.

    Ledger design (the Zipf-aware part): below the threshold the state is
    the distinct ``(tkey, conv_id)`` pair set; the moment a text crosses
    it, its pair rows COLLAPSE into one flag row ``(tkey, boiler=true)``
    — exactly the texts that are most frequent carry the least state, so
    ledger width is O(sub-threshold pairs in retention + flagged texts),
    never O(turns seen). Rows carry a last-activity event time and evict
    once the batch max event time passes ``cfg.cap_state_retention``
    beyond it (a text going quiet for the whole retention restarts its
    count by design — same trade as both sibling ledgers).

    Exactly-once composition is the frozen-pre-state pattern
    (``_read_cap_ledger``): epoch N reads snapshot N-1 and writes
    snapshot N, so a replayed epoch recomputes identical output for the
    idempotent epoch sink.
    """
    from data_harvesting_spark.operators.curate_sessions import (
        parse_duration_seconds,
    )

    ledger_path = sink_path.rstrip("/") + ".textfreq"
    retention_ms = int(parse_duration_seconds(cfg.cap_state_retention) * 1000)
    stream = read_transcript_stream(spark, source_dir)
    out_cols = stream.columns

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        from data_harvesting_spark.streaming.sink import write_epoch

        sp = df.sparkSession
        keyed = df.withColumn("tkey", text_hash("text")).persist()
        try:
            hi = keyed.agg(
                F.unix_millis(F.max("ts")).alias("hi")
            ).collect()[0][0]
            pairs_b = keyed.groupBy("tkey", "conv_id").agg(
                F.unix_millis(F.max("ts")).cast("long").alias("_new_ms")
            )
            prior = _read_hash_ledger(sp, ledger_path, epoch_id)
            if prior is not None:
                boiler_prior = prior.where(F.col("boiler")).select(
                    "tkey", "last_ms"
                )
                pair_prior = prior.where(~F.col("boiler")).select(
                    "tkey", "conv_id", "last_ms"
                )
                all_pairs = pair_prior.join(
                    pairs_b, ["tkey", "conv_id"], "full_outer"
                ).select(
                    "tkey",
                    "conv_id",
                    F.greatest("last_ms", "_new_ms").cast("long")
                    .alias("last_ms"),
                )
            else:
                boiler_prior = None
                all_pairs = pairs_b.select(
                    "tkey", "conv_id", F.col("_new_ms").alias("last_ms")
                )
            # the pair state feeds both the recount and the snapshot —
            # persist so the full_outer against the prior ledger runs once
            all_pairs = all_pairs.persist()
            counts = all_pairs.groupBy("tkey").agg(
                F.count("*").alias("n"),
                F.max("last_ms").cast("long").alias("last_ms"),
            )
            cand = counts.where(F.col("n") >= min_convs).select(
                "tkey", "last_ms"
            )
            if boiler_prior is not None:
                # refresh flag activity from this batch, keep old flags
                refresh = counts.join(
                    boiler_prior.select("tkey"), "tkey", "left_semi"
                ).select("tkey", "last_ms")
                cand = cand.unionByName(boiler_prior).unionByName(refresh)
            # flag table is Zipf-small (boilerplate texts only): persist +
            # BROADCAST into both anti-joins so neither the batch nor the
            # pair state re-shuffles onto tkey just to subtract flags
            boiler_all = cand.groupBy("tkey").agg(
                F.max("last_ms").cast("long").alias("last_ms")
            ).persist()

            kept = keyed.join(
                F.broadcast(boiler_all.select("tkey")), "tkey", "left_anti"
            ).select(*out_cols)
            write_epoch(kept, epoch_id, sink_path)

            pair_rows = all_pairs.join(
                F.broadcast(boiler_all.select("tkey")), "tkey", "left_anti"
            ).select(
                "tkey", "conv_id", "last_ms", F.lit(False).alias("boiler")
            )
            flag_rows = boiler_all.select(
                "tkey",
                F.lit(None).cast("string").alias("conv_id"),
                "last_ms",
                F.lit(True).alias("boiler"),
            )
            snapshot = pair_rows.unionByName(flag_rows)
            if hi is not None:
                snapshot = snapshot.where(
                    F.col("last_ms") + retention_ms >= F.lit(hi)
                )
            snapshot.coalesce(8).write.mode("overwrite").parquet(
                os.path.join(ledger_path, f"_epoch={epoch_id}")
            )
            all_pairs.unpersist()
            boiler_all.unpersist()
            _prune_cap_ledger(ledger_path, epoch_id)
        finally:
            keyed.unpersist()

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_training_export_stream_job(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
    available_now: bool = True,
    min_words: int = 3,
):
    """The batch ``training_export`` catalog query as ONE continuous
    stream: stateful curate → CROSS-CONVERSATION, cross-micro-batch exact
    response dedup → min-words quality gate → PII redaction → idempotent
    epoch sink.

    Why the dedup is in ``foreachBatch`` and not a chained
    ``dropDuplicatesWithinWatermark``: the session kernel only emits a
    session after the watermark has passed its end + gap, so every
    emitted row is already "late" w.r.t. the global watermark — Spark's
    multi-stateful-operator correctness check rejects the chain (verified
    empirically; disabling the check would silently drop every row).
    Instead the seen-response-hash set lives in a per-epoch snapshotted
    ledger exactly like the cap ledger: epoch N reads frozen snapshot
    N-1, anti-joins this batch's pairs, writes snapshot N — a replayed
    epoch re-reads the same pre-state, so the composition with the
    idempotent sink stays exactly-once. Ledger rows carry a last-seen
    event time and are retention-evicted (``cfg.cap_state_retention``),
    so ledger width is O(distinct responses inside the retention); a
    duplicate response surfacing beyond the retention re-emits, the same
    bounded-state trade every watermark-bounded streaming dedup makes.

    Batch-parity contract (pinned by
    tests/test_streaming.py::test_training_export_stream_equals_batch):
    first-ARRIVING response wins across batches; within a batch the
    (conv_id, example_idx) minimum wins — equal to the batch pipeline's
    global keep-first whenever arrival order respects it. The ledger
    records first-seen hashes BEFORE the quality gate, as in batch (a
    low-quality first copy suppresses later duplicates rather than
    letting one through).
    """
    from pyspark.sql import Window

    from data_harvesting_spark.config import validate_config
    from data_harvesting_spark.functions.text import (
        quality_features,
        redact_pii,
    )
    from data_harvesting_spark.operators.curate_sessions import (
        parse_duration_seconds,
    )

    validate_config(cfg, streaming_runner="kernel")
    assert cfg.sink_path and cfg.checkpoint_dir, "configure sink + checkpoint"
    os.makedirs(cfg.sink_path, exist_ok=True)
    ledger_path = cfg.sink_path.rstrip("/") + ".seenhashes"
    retention_ms = int(parse_duration_seconds(cfg.cap_state_retention) * 1000)
    late_counter = spark.sparkContext.accumulator(0)
    stream = read_transcript_stream(spark, source_dir)
    curated = curated_stream(stream, cfg, late_counter)

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        from data_harvesting_spark.streaming.sink import write_epoch

        sp = df.sparkSession
        batch = df.persist()
        try:
            hi = batch.agg(
                (F.unix_micros(F.max("window_start")) / 1000)
                .cast("long")
                .alias("hi")
            ).collect()[0][0]
            # within-batch keep-first on the response hash, deterministic
            w = Window.partitionBy("text_hash").orderBy(
                "conv_id", "example_idx"
            )
            firsts = (
                batch.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            ).persist()
            try:
                prior = _read_hash_ledger(sp, ledger_path, epoch_id)
                if prior is not None:
                    fresh = firsts.join(
                        prior.select("text_hash"), "text_hash", "left_anti"
                    )
                else:
                    fresh = firsts
                exported = (
                    fresh.where(
                        quality_features(F.col("response_text"))["n_words"]
                        >= min_words
                    )
                    .select(
                        "conv_id",
                        "window_start",
                        "example_idx",
                        "tool",
                        "call_text",
                        redact_pii(F.col("response_text")).alias("response_red"),
                        "text_hash",
                    )
                )
                write_epoch(exported, epoch_id, cfg.sink_path)
                # snapshot N = prior ∪ this batch's hashes (pre-quality,
                # as in batch), retention-evicted on last-SEEN time: the
                # refresh comes from ALL of this batch's per-hash firsts —
                # a recurring duplicate keeps its hash alive even though
                # the anti-join suppresses its emission
                upd = firsts.groupBy("text_hash").agg(
                    (F.unix_micros(F.max("window_start")) / 1000)
                    .cast("long")
                    .alias("_new_ms")
                )
                if prior is not None:
                    snapshot = prior.join(upd, "text_hash", "full_outer").select(
                        "text_hash",
                        F.greatest(F.col("last_ms"), F.col("_new_ms"))
                        .cast("long").alias("last_ms"),
                    )
                else:
                    snapshot = upd.select(
                        "text_hash",
                        F.col("_new_ms").cast("long").alias("last_ms"),
                    )
                if hi is not None:
                    snapshot = snapshot.where(
                        F.col("last_ms").isNull()
                        | (F.col("last_ms") + retention_ms >= F.lit(hi))
                    )
                snapshot.coalesce(4).write.mode("overwrite").parquet(
                    os.path.join(ledger_path, f"_epoch={epoch_id}")
                )
            finally:
                firsts.unpersist()
            _prune_cap_ledger(ledger_path, epoch_id)
        finally:
            batch.unpersist()

    writer = (
        curated.writeStream.outputMode("append")
        .option("checkpointLocation", cfg.checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.late_counter = late_counter
    return q


# ---------------------------------------------------------------- DPO export
# Preference-pair extraction as a CONTINUOUS stream (the batch `dpo_pairs`
# catalog query's streaming sibling; reference analog: the continuous
# dataset writer, `/root/reference/queue_harvesting.py:30-57`). Per tool the
# running state is (best candidate, worst candidate, n-seen) — min/max are
# associative over retained extremes and the count is additive, so folding
# each micro-batch's aggregate into the prior ledger snapshot is EXACTLY the
# batch aggregate over everything seen. State width is O(|tools|), the
# bounded vocabulary, so no retention eviction is needed (unlike the
# seen-hash ledger).

# deterministic stand-in reward for streamed pairs: the event-table reward
# column doesn't ride the transcript stream schema, and parity needs both
# engines to score identically from pair content alone
DPO_REWARD_MOD = 1000


def dpo_candidates(pairs: DataFrame) -> DataFrame:
    """Curated pairs → DPO candidates: one row per non-empty tool response,
    scored by the deterministic content reward."""
    return pairs.where(
        F.col("tool").isNotNull() & (F.length(F.trim("response_text")) > 0)
    ).select(
        "tool",
        "conv_id",
        "example_idx",
        "response_text",
        F.pmod(F.xxhash64("response_text"), F.lit(DPO_REWARD_MOD))
        .cast("bigint")
        .alias("reward"),
    )


_DPO_PAYLOAD = ["conv_id", "example_idx", "response_text", "reward"]


def _dpo_ordkey(c):
    """Total preference order: highest reward first, (conv_id, example_idx)
    tie-break — duplicate-free, so min_by/max_by picks are unique."""
    return F.struct(
        (-c["reward"]).alias("neg_reward"),
        c["conv_id"].alias("conv_id"),
        c["example_idx"].alias("example_idx"),
    )


def dpo_state(cands: DataFrame) -> DataFrame:
    """(tool, ch, rj, n): best/worst candidate + count, one hash agg —
    min_by/max_by partial-aggregate map-side, so at most 2 candidate rows
    per tool per input partition cross the wire (same posture as the batch
    ``dpo_pairs`` plan)."""
    payload = F.struct(*_DPO_PAYLOAD)
    key = _dpo_ordkey(payload)
    return cands.groupBy("tool").agg(
        F.min_by(payload, key).alias("ch"),
        F.max_by(payload, key).alias("rj"),
        F.count("*").cast("bigint").alias("n"),
    )


def merge_dpo_state(prior: DataFrame, batch: DataFrame) -> DataFrame:
    """Fold a batch aggregate into the prior per-tool state (full outer on
    tool; extremes compared by the preference order, counts added)."""

    def pick(x: str, y: str, smaller: bool):
        kx, ky = _dpo_ordkey(F.col(x)), _dpo_ordkey(F.col(y))
        wins = kx < ky if smaller else kx > ky
        return (
            F.when(F.col(x).isNull(), F.col(y))
            .when(F.col(y).isNull(), F.col(x))
            .when(wins, F.col(x))
            .otherwise(F.col(y))
        )

    p = prior.select(
        "tool", F.col("ch").alias("pch"), F.col("rj").alias("prj"),
        F.col("n").alias("pn"),
    )
    b = batch.select(
        "tool", F.col("ch").alias("bch"), F.col("rj").alias("brj"),
        F.col("n").alias("bn"),
    )
    return p.join(b, "tool", "full_outer").select(
        "tool",
        pick("pch", "bch", smaller=True).alias("ch"),
        pick("prj", "brj", smaller=False).alias("rj"),
        (F.coalesce("pn", F.lit(0)) + F.coalesce("bn", F.lit(0)))
        .cast("bigint")
        .alias("n"),
    )


def dpo_pairs_from_state(state: DataFrame) -> DataFrame:
    """Exportable preference pairs: tools with >= 2 candidates and a strict
    reward gap (validity is monotone under merging — the best only gets
    better and the worst only worse, so a valid tool never un-exports)."""
    return state.where(
        (F.col("n") >= 2) & (F.col("ch.reward") > F.col("rj.reward"))
    ).select(
        "tool",
        F.col("ch.conv_id").alias("chosen_conv"),
        F.col("ch.example_idx").alias("chosen_idx"),
        F.col("ch.response_text").alias("chosen_text"),
        F.col("ch.reward").alias("chosen_reward"),
        F.col("rj.conv_id").alias("rejected_conv"),
        F.col("rj.example_idx").alias("rejected_idx"),
        F.col("rj.response_text").alias("rejected_text"),
        F.col("rj.reward").alias("rejected_reward"),
    )


def start_dpo_export_stream_job(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
    available_now: bool = True,
):
    """The batch ``dpo_pairs`` export as ONE continuous stream: stateful
    curate → per-tool best/worst preference ledger → idempotent epoch sink.

    Epoch N reads frozen ledger snapshot N-1, folds this batch's per-tool
    aggregate in (``merge_dpo_state`` — exact, associativity of min/max
    over retained extremes), emits the tools whose EXPORTED PAIR changed
    this epoch, and writes snapshot N — a replayed epoch re-reads the same
    pre-state, so composition with the idempotent sink stays exactly-once
    (W7). The current dataset is the latest emission per tool
    (``read_dpo_export``), which equals the batch aggregate over all
    streamed input — pinned by
    tests/test_streaming.py::test_dpo_export_stream_equals_batch and the
    kill-resume variant.
    """
    from data_harvesting_spark.config import validate_config

    validate_config(cfg, streaming_runner="kernel")
    assert cfg.sink_path and cfg.checkpoint_dir, "configure sink + checkpoint"
    os.makedirs(cfg.sink_path, exist_ok=True)
    ledger_path = cfg.sink_path.rstrip("/") + ".dpostate"
    late_counter = spark.sparkContext.accumulator(0)
    stream = read_transcript_stream(spark, source_dir)
    curated = curated_stream(stream, cfg, late_counter)

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        from data_harvesting_spark.streaming.sink import write_epoch

        sp = df.sparkSession
        batch_state = dpo_state(dpo_candidates(df))
        prior = _read_cap_ledger(sp, ledger_path, epoch_id)
        merged = (
            merge_dpo_state(prior, batch_state)
            if prior is not None
            else batch_state
        )
        # both the changed-pair emission and the snapshot consume merged —
        # persist so the upstream stateful curation runs once per epoch
        merged = merged.persist()
        try:
            valid = dpo_pairs_from_state(merged)
            if prior is not None:
                pv = dpo_pairs_from_state(prior).select(
                    "tool",
                    F.col("chosen_conv").alias("_pc"),
                    F.col("chosen_idx").alias("_pci"),
                    F.col("rejected_conv").alias("_pr"),
                    F.col("rejected_idx").alias("_pri"),
                )
                changed = (
                    valid.join(pv, "tool", "left")
                    .where(
                        F.col("_pc").isNull()
                        | (F.col("chosen_conv") != F.col("_pc"))
                        | (F.col("chosen_idx") != F.col("_pci"))
                        | (F.col("rejected_conv") != F.col("_pr"))
                        | (F.col("rejected_idx") != F.col("_pri"))
                    )
                    .drop("_pc", "_pci", "_pr", "_pri")
                )
            else:
                changed = valid
            write_epoch(changed, epoch_id, cfg.sink_path)
            # O(|tools|) rows — one file per snapshot is the right layout
            merged.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(ledger_path, f"_epoch={epoch_id}")
            )
            _prune_cap_ledger(ledger_path, epoch_id)
        finally:
            merged.unpersist()

    writer = (
        curated.writeStream.outputMode("append")
        .option("checkpointLocation", cfg.checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.late_counter = late_counter
    return q


def read_dpo_export(spark: SparkSession, sink_path: str) -> DataFrame:
    """The current preference dataset: the LATEST emitted pair per tool
    (emissions are change-logged, so the newest epoch's row per tool is
    the live state)."""
    from pyspark.sql import Window

    df = spark.read.option("basePath", sink_path).parquet(
        os.path.join(sink_path, "_epoch=*")
    )
    w = Window.partitionBy("tool").orderBy(F.col("_epoch").desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_epoch")
    )


# ---------------------------------------------------------------- SFT export
def start_sft_export_stream_job(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
    available_now: bool = True,
    context_turns: int = 3,
    context_budget: int | None = None,
):
    """The batch ``sft_pairs`` export as ONE continuous stream: a
    buffer-then-emit stateful handler (streaming/sft.py) assembles each
    conversation's ordered turns, emits context→target pairs when the
    watermark closes a session, and carries the last ``context_turns``
    emitted turns so context windows cross session closes EXACTLY as the
    batch frame does. ``context_budget`` applies the
    ``context_window_trim`` rule per pair before packing (trim before
    pack — round-4 verdict item #6), with the identical array-fold
    semantics as the batch ``sft_pairs_frame(context_budget=...)``.
    Output flows through the idempotent epoch sink — the handler is
    deterministic given checkpointed state, so replayed epochs rewrite
    identical rows (W7; pinned by the kill-resume test).
    """
    from data_harvesting_spark.config import validate_config
    from data_harvesting_spark.streaming.sft import sft_stream
    from data_harvesting_spark.streaming.sink import write_epoch

    validate_config(cfg, streaming_runner="kernel")
    assert cfg.sink_path and cfg.checkpoint_dir, "configure sink + checkpoint"
    os.makedirs(cfg.sink_path, exist_ok=True)
    late_counter = spark.sparkContext.accumulator(0)
    stream = read_transcript_stream(spark, source_dir)
    pairs = sft_stream(stream, cfg, context_turns, late_counter,
                       context_budget)

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        write_epoch(df, epoch_id, cfg.sink_path)

    writer = (
        pairs.writeStream.outputMode("append")
        .option("checkpointLocation", cfg.checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.late_counter = late_counter
    return q


def start_pattern_stream_job(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
    available_now: bool = True,
):
    """The batch ``pattern_failed_retry`` CEP query as ONE continuous
    stream: a buffer-then-emit stateful handler (streaming/patterns.py)
    finalizes each conversation's sessions in event-time order and emits
    failure->retry matches the moment the retry call is final, carrying
    the conversation's last call turn (+ its successor, if seen) across
    session closes so cross-session matches emit EXACTLY as the batch
    lead-windows would. Output flows through the idempotent epoch sink
    (W7; pinned by the kill-resume test)."""
    from data_harvesting_spark.config import validate_config
    from data_harvesting_spark.streaming.patterns import pattern_stream
    from data_harvesting_spark.streaming.sink import write_epoch

    validate_config(cfg, streaming_runner="kernel")
    assert cfg.sink_path and cfg.checkpoint_dir, "configure sink + checkpoint"
    os.makedirs(cfg.sink_path, exist_ok=True)
    late_counter = spark.sparkContext.accumulator(0)
    stream = read_transcript_stream(spark, source_dir)
    matches = pattern_stream(stream, cfg, late_counter)

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        write_epoch(df, epoch_id, cfg.sink_path)

    writer = (
        matches.writeStream.outputMode("append")
        .option("checkpointLocation", cfg.checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.late_counter = late_counter
    return q


def start_timeout_stream_job(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
    available_now: bool = True,
):
    """The batch ``pattern_tool_timeout`` CEP absence query as ONE
    continuous alert stream: a deadline-driven stateful handler
    (streaming/timeouts.py) emits ``(conv_id, call_idx, tool, call_us)``
    the moment a call's lack of an in-time response is decidable — at
    response arrival for late/non-tool successors, at the event-time
    watermark passing ``call_ts + response_timeout`` for unanswered
    calls. No session gap involved: the timer is the per-call deadline,
    folded onto Spark's one event-time timeout per key (min over pending
    deadlines). Output flows through the idempotent epoch sink (W7;
    pinned by the kill-resume test)."""
    from data_harvesting_spark.config import validate_config
    from data_harvesting_spark.streaming.sink import write_epoch
    from data_harvesting_spark.streaming.timeouts import timeout_stream

    validate_config(cfg, streaming_runner="kernel")
    assert cfg.sink_path and cfg.checkpoint_dir, "configure sink + checkpoint"
    os.makedirs(cfg.sink_path, exist_ok=True)
    late_counter = spark.sparkContext.accumulator(0)
    stream = read_transcript_stream(spark, source_dir)
    alerts = timeout_stream(stream, cfg, late_counter)

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        write_epoch(df, epoch_id, cfg.sink_path)

    writer = (
        alerts.writeStream.outputMode("append")
        .option("checkpointLocation", cfg.checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.late_counter = late_counter
    return q


def latency_pairs(transcripts: DataFrame, watermark_delay: str,
                  max_gap: str = "2 hours") -> DataFrame:
    """Adjacent-turn latency via a (stream-stream-capable) self-join:
    turn k joins turn k-1 of the same conversation under an event-time
    range bound (A8 in the streaming surface; the bound lets Spark expire
    join state — adjacent turns further apart than ``max_gap`` are not
    latency-paired, identically in batch and stream).

    Works unchanged on a static DataFrame (batch comparator) and on a
    watermarked stream, where it is a stateful stream-stream join — the
    north_star's flatMapGroupsWithState-free correlation path."""
    cur = transcripts.select("conv_id", "turn_idx", "tool", "ts")
    prev = transcripts.select(
        F.col("conv_id").alias("p_conv"),
        (F.col("turn_idx") + 1).alias("p_next"),
        F.col("ts").alias("prev_ts"),
    )
    if transcripts.isStreaming:
        cur = cur.withWatermark("ts", watermark_delay)
        prev = prev.withWatermark("prev_ts", watermark_delay)
    joined = cur.alias("c").join(
        prev.alias("p"),
        F.expr(
            f"c.conv_id = p.p_conv AND c.turn_idx = p.p_next AND "
            f"p.prev_ts BETWEEN c.ts - INTERVAL {max_gap} AND c.ts"
        ),
    )
    return joined.select(
        "tool",
        "ts",
        (F.unix_micros("ts") - F.unix_micros("prev_ts")).alias("lat_us"),
    )


def latency_quantiles_windowed(lat: DataFrame, window: str = "1 hour") -> DataFrame:
    """Per-(window, tool) p50/p95 latency via percentile_approx (t-digest
    style sketch — mergeable, no global sort; exact below the accuracy
    threshold, so small-fixture stream/batch parity is bytewise)."""
    return (
        lat.where(F.col("tool").isNotNull())
        .groupBy(F.window("ts", window).alias("w"), F.col("tool").alias("key"))
        .agg(
            F.percentile_approx("lat_us", F.lit(0.5), F.lit(10000)).alias("p50_us"),
            F.percentile_approx("lat_us", F.lit(0.95), F.lit(10000)).alias("p95_us"),
            F.count("lat_us").alias("n"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "key",
            "p50_us",
            "p95_us",
            "n",
        )
    )


def start_latency_quantiles_job(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
    sink_path: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    available_now: bool = True,
):
    """Streaming per-tool latency quantiles (A8 × W4): stateful
    stream-stream adjacent-turn join → watermark-closed tumbling windows →
    mergeable quantile sketch. Two chained stateful operators, all JVM."""
    stream = read_transcript_stream(spark, source_dir)
    lat = latency_pairs(stream, cfg.watermark_delay)
    rates = latency_quantiles_windowed(lat, window)
    writer = (
        rates.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda df, epoch: sink_for("epoch")(df, epoch, sink_path))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain(q, idle_seconds: float = 3.0, timeout: float = 180.0) -> None:
    """Run a ProcessingTime-triggered query until it has consumed all
    available input AND gone idle (no batch progress) for ``idle_seconds``.

    Needed because event-time timers fire in the no-data micro-batch that
    runs after the watermark advances — which ``availableNow`` never
    executes (it stops at the last data batch). A production query runs
    forever, so timers fire naturally; drain() is the finite-input analog.
    """
    import time

    deadline = time.time() + timeout
    last_batch = None
    rows_seen = 0
    idle_since = None
    while time.time() < deadline:
        p = q.lastProgress
        if p is None:
            time.sleep(0.25)
            continue
        bid = p["batchId"]
        if bid != last_batch:
            rows_seen += p["numInputRows"]
            last_batch = bid
            idle_since = None
        elif rows_seen > 0 and p["numInputRows"] == 0:
            # data was consumed AND the most recent batch was a no-data
            # batch (watermark advance / timer flush) — now idle = done
            idle_since = idle_since or time.time()
            if time.time() - idle_since >= idle_seconds:
                break
        time.sleep(0.25)
    q.stop()
    q.awaitTermination()


def run_sessionized_stream_to_completion(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
) -> DataFrame:
    """Convenience: run the curate job until input is exhausted and all
    event-time timers have fired; return the curated sink as a batch
    DataFrame."""
    q = start_curate_job(spark, source_dir, cfg, available_now=False)
    drain(q)
    from data_harvesting_spark.streaming.sink import (
        read_epoch_sink,
        read_merge_sink,
    )

    if cfg.sink_format == "epoch":
        return read_epoch_sink(spark, cfg.sink_path)
    return read_merge_sink(spark, cfg.sink_path)


def _read_cap_ledger(spark: SparkSession, ledger_path: str, epoch_id: int):
    """Latest cap-ledger snapshot strictly before ``epoch_id`` (None if
    none). Snapshots are per-epoch dirs so a replayed epoch re-reads the
    exact pre-state it saw the first time — idempotent under W7 replay."""
    import re

    if not os.path.isdir(ledger_path):
        return None
    ks = []
    for d in os.listdir(ledger_path):
        m = re.match(r"_epoch=(\d+)$", d)
        if m and int(m.group(1)) < epoch_id:
            ks.append(int(m.group(1)))
    if not ks:
        return None
    return spark.read.parquet(os.path.join(ledger_path, f"_epoch={max(ks)}"))


def _cap_with_ledger(
    turns: DataFrame, cfg, epoch_id: int, ledger_path: str
) -> DataFrame:
    """Conversation-scope P9 cap + W3 numbering for the session-window
    runner, exact across micro-batches.

    Sessions of one conversation close over multiple batches; the
    cumulative pairs-emitted count and (when suppressing) the P10
    suppression cursor per conversation live in a tiny ledger (one row per
    conversation), snapshotted per epoch next to the sink:

      epoch N reads snapshot N-1 → offsets; numbers this batch's pairs per
      conversation in (window_start, call, response) order starting at the
      offset; keeps ``example_idx < max_pairs_per_conv``; writes snapshot N
      (overwrite) = snapshot N-1 merged with this batch's kept counts.

    Replay of epoch N (crash before checkpoint commit) re-reads the
    unchanged snapshot N-1 and overwrites snapshot N with identical content
    — exactly-once composes with the idempotent sink. At production scale
    the ledger becomes an Iceberg table and the snapshot merge a MERGE
    INTO.

    Bounded width (r2 VERDICT): each snapshot row carries the
    conversation's last event time, and a conversation whose
    ``last + session_gap + cap_state_retention`` has fallen behind the
    batch's max event time is EVICTED from the snapshot — mirroring the
    kernel runner's tombstone timeout (streaming/state.py). Per-epoch
    ledger cost is therefore O(conversations active within the retention),
    not O(all conversations ever seen). The batch max event time is a
    conservative stand-in for the watermark (it is always >= every closed
    session's end, and the true watermark is ahead of it by at most the
    watermark delay), so eviction never fires earlier than the kernel
    runner's timeout would.
    """
    from pyspark.sql import Window

    from data_harvesting_spark.functions.text import text_hash
    from data_harvesting_spark.operators.curate import curate_keyed_pairs
    from data_harvesting_spark.operators.curate_sessions import (
        parse_duration_seconds,
    )

    spark = turns.sparkSession
    keys = ("conv_id", "window_start")
    sup = cfg.suppress_turns_after_emit
    horizon_ms = int(
        (
            parse_duration_seconds(cfg.session_gap)
            + parse_duration_seconds(cfg.cap_state_retention)
        )
        * 1000
    )
    # consumed by curation AND the activity aggregate below — without
    # persist each action would re-execute the micro-batch plan
    turns = turns.persist()
    # one row per conversation in the batch; tiny. The batch horizon `hi`
    # is its max — read from this small frame, not a second full scan.
    acts = turns.groupBy("conv_id").agg(
        (F.unix_micros(F.max("ts")) / 1000).cast("long").alias("_act_ms")
    ).persist()
    hi = acts.agg(F.max("_act_ms").alias("hi")).collect()[0][0]
    pairs = curate_keyed_pairs(turns, cfg, keys)
    prior = _read_cap_ledger(spark, ledger_path, epoch_id)
    if prior is not None and "suppress_until" not in prior.columns:
        prior = prior.withColumn("suppress_until", F.lit(-1).cast("long"))
    # conversation-scope min gate (P8, min_pairs_per_conv > 1): POOLED
    # deferral via a pending buffer, the ledger analog of the kernel
    # runner's deferred emission (streaming/state.py). Nothing is emitted
    # for a conversation until its cumulative pair count (pending from
    # prior epochs + fresh this epoch) reaches the gate; once a
    # conversation has emitted anything (ledger emitted > 0) the gate is
    # definitionally passed and later sessions emit directly. Withheld
    # pairs live in a per-epoch pending snapshot with the same
    # frozen-pre-state replay discipline as the ledger itself, and are
    # retention-evicted with their conversation (semi-join against the
    # post-eviction ledger snapshot below) — batch parity holds whenever
    # inter-session gaps stay under cap_state_retention, exactly the
    # kernel runner's documented contract.
    min_gate = cfg.min_pairs_per_conv
    pending_path = ledger_path.rstrip("/") + ".pending"
    combined = withheld = None
    if min_gate > 1:
        pair_cols = ["conv_id", "window_start", "call_turn_idx",
                     "response_turn_idx", "tool", "call_text", "response_text"]
        pend_prior = _read_cap_ledger(spark, pending_path, epoch_id)
        fresh = pairs.select(*pair_cols)
        combined = (
            fresh if pend_prior is None
            else fresh.unionByName(pend_prior.select(*pair_cols))
        ).persist()
        passed = (
            combined.groupBy("conv_id")
            .agg(F.count("*").alias("_cnt"))
            .where(F.col("_cnt") >= min_gate)
            .select("conv_id")
        )
        if prior is not None:
            passed = passed.unionByName(
                prior.where(F.col("emitted") > 0).select("conv_id")
            ).distinct()
        pairs = combined.join(passed, "conv_id", "left_semi")
        withheld = combined.join(passed, "conv_id", "left_anti")
    if prior is not None and "last_ms" not in prior.columns:
        # pre-eviction snapshot format: stamp rows as just-active at the
        # batch horizon; on an empty batch (hi unknown) stamp NULL, which
        # the eviction filter below treats as "never evict until a real
        # timestamp is observed" — NOT -1, which would evict the whole
        # legacy ledger on the next data epoch and reset every cap
        prior = prior.withColumn(
            "last_ms",
            F.lit(hi).cast("long") if hi is not None
            else F.lit(None).cast("long"),
        )
    if prior is not None:
        pairs = pairs.join(
            prior.select(
                "conv_id",
                F.col("emitted").alias("_emitted0"),
                F.col("suppress_until").alias("_sup0"),
            ),
            "conv_id",
            "left",
        ).na.fill({"_emitted0": 0, "_sup0": -1})
    else:
        pairs = pairs.withColumn(
            "_emitted0", F.lit(0).cast("long")
        ).withColumn("_sup0", F.lit(-1).cast("long"))
    order_cols = ["window_start", "call_turn_idx", "response_turn_idx"]
    if sup > 0:
        # P10 sweep with the carried cursor: _sweep_group reads the
        # _emitted0/_sup0 columns so suppression spacing spans batches
        from data_harvesting_spark.operators.cap import suppress_and_cap

        pairs = suppress_and_cap(pairs, cfg, key="conv_id", order_col=order_cols)
    w = Window.partitionBy("conv_id").orderBy(*[F.col(c) for c in order_cols])
    numbered = pairs.withColumn(
        "example_idx",
        (F.col("_emitted0") + F.row_number().over(w) - 1).cast("int"),
    )
    if cfg.max_pairs_per_conv > 0:
        numbered = numbered.where(F.col("example_idx") < cfg.max_pairs_per_conv)
    curated = numbered.select(
        *keys,
        "example_idx",
        "call_turn_idx",
        "response_turn_idx",
        "tool",
        "call_text",
        "response_text",
        text_hash(F.col("response_text")).alias("text_hash"),
    )
    curated = curated.persist()
    # cursor update is declarative: kept-count and (if suppressing) the
    # last kept response index + spacing; a conv with nothing kept this
    # epoch keeps its prior cursor via the full-outer coalesce. ``acts``
    # (every conversation with ANY turn this batch) refreshes last_ms even
    # when nothing was kept, so an active-but-capped conversation is not
    # evicted while it still produces sessions.
    upd = curated.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("_new"),
        F.max("response_turn_idx").cast("long").alias("_last_resp"),
    )
    batch_info = acts.join(upd, "conv_id", "left")
    new_sup = (
        (F.col("_last_resp") + F.lit(sup)).cast("long")
        if sup > 0
        else F.lit(None).cast("long")
    )
    if prior is not None:
        snapshot = prior.join(batch_info, "conv_id", "full_outer").select(
            "conv_id",
            (
                F.coalesce(F.col("emitted"), F.lit(0))
                + F.coalesce(F.col("_new"), F.lit(0))
            ).cast("long").alias("emitted"),
            F.coalesce(new_sup, F.col("suppress_until"), F.lit(-1))
            .cast("long")
            .alias("suppress_until"),
            # greatest() skips NULLs: null only when BOTH sides are null
            # (legacy row stamped on an empty batch, no activity yet)
            F.greatest(F.col("last_ms"), F.col("_act_ms"))
            .cast("long").alias("last_ms"),
        )
    else:
        snapshot = batch_info.select(
            "conv_id",
            F.coalesce(F.col("_new"), F.lit(0)).cast("long").alias("emitted"),
            F.coalesce(new_sup, F.lit(-1)).cast("long").alias("suppress_until"),
            F.col("_act_ms").cast("long").alias("last_ms"),
        )
    if hi is not None:
        # retention eviction (kernel-runner tombstone analog): forget
        # conversations whose budget window has fully expired; a NULL
        # last_ms (legacy row with no observed timestamp yet) is retained,
        # never evicted on a guess
        snapshot = snapshot.where(
            F.col("last_ms").isNull()
            | (F.col("last_ms") + horizon_ms >= F.lit(hi))
        )
    # few output files: the snapshot is one small row per conversation;
    # 32 shuffle-partition files per epoch would be pure listing overhead
    # (coalesce is a narrow dep — the agg above still runs parallel)
    snapshot.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(ledger_path, f"_epoch={epoch_id}")
    )
    if min_gate > 1:
        # pending(N) = still-below-gate pairs whose conversation survived
        # the ledger's retention eviction; a conversation evicted from the
        # snapshot drops its pending with it (gate permanently failed —
        # the documented beyond-retention behavior)
        withheld.join(
            snapshot.select("conv_id"), "conv_id", "left_semi"
        ).coalesce(4).write.mode("overwrite").parquet(
            os.path.join(pending_path, f"_epoch={epoch_id}")
        )
        combined.unpersist()
        _prune_cap_ledger(pending_path, epoch_id)
    acts.unpersist()
    turns.unpersist()
    _prune_cap_ledger(ledger_path, epoch_id)
    return curated


def _prune_cap_ledger(ledger_path: str, epoch_id: int, keep: int = 3) -> None:
    """Drop snapshots older than ``epoch_id - keep``: only the last
    uncommitted epoch can ever replay, so epoch N re-reads at most snapshot
    N-1 — older dirs are dead weight (the ledger stays O(keep) snapshots,
    each one row per conversation)."""
    import re
    import shutil as _sh

    for d in os.listdir(ledger_path):
        m = re.match(r"_epoch=(\d+)$", d)
        if m and int(m.group(1)) < epoch_id - keep:
            _sh.rmtree(os.path.join(ledger_path, d), ignore_errors=True)


def start_curate_job_session_window(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
    available_now: bool = True,
):
    """Scale-path streaming curate: JVM session windows + declarative batch
    curate on closed sessions.

    The stateful-kernel runner (start_curate_job) pays a Python handler
    invocation per key per micro-batch just to buffer; here the buffering
    is Spark's native ``session_window`` aggregation (UnsafeRow state,
    whole-stage codegen, RocksDB) and append mode hands ``foreachBatch``
    only CLOSED sessions, which the single-exchange declarative pipeline
    (operators/curate.py::curate_keyed) curates with zero Python in the
    per-turn path. ~20x the stateful-kernel throughput (BENCH.md); the
    kernel runner remains the reference for custom per-key state (W5) and
    per-session suppression sweeps.
    """
    from data_harvesting_spark.config import validate_config
    from data_harvesting_spark.operators.curate import curate_keyed

    validate_config(cfg, streaming_runner="session_window")
    assert cfg.sink_path and cfg.checkpoint_dir, "configure sink + checkpoint"
    os.makedirs(cfg.sink_path, exist_ok=True)
    sink_fn = sink_for(cfg.sink_format)
    ledger_path = cfg.sink_path.rstrip("/") + ".capledger"
    stream = read_transcript_stream(spark, source_dir)

    closed_sessions = (
        stream.withWatermark("ts", cfg.watermark_delay)
        .groupBy(
            F.session_window("ts", cfg.session_gap).alias("sw"),
            F.col("conv_id"),
        )
        .agg(
            F.sort_array(
                F.collect_list(F.struct("turn_idx", "role", "text", "tool", "ts"))
            ).alias("turns")
        )
        .select(
            "conv_id", F.col("sw.start").alias("window_start"), "turns"
        )
    )

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        turns = df.select(
            "conv_id", "window_start", F.explode("turns").alias("t")
        ).select("conv_id", "window_start", "t.*")
        if cfg.cap_scope == "conversation":
            # cumulative per-conversation budget + numbering across batches
            curated = _cap_with_ledger(turns, cfg, epoch_id, ledger_path)
            try:
                sink_fn(curated, epoch_id, cfg.sink_path)
            finally:
                curated.unpersist()
        else:
            curated = curate_keyed(turns, cfg)
            sink_fn(curated, epoch_id, cfg.sink_path)

    writer = (
        closed_sessions.writeStream.outputMode("append")
        .option("checkpointLocation", cfg.checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_sketch_stream_job(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
    sink_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    depth: int = 4,
    width: int = 8192,
    top_n: int = 10,
    cand_m: int = 40,
):
    """Streaming corpus telemetry via mergeable sketches: every epoch
    folds its turn-text words into a cumulative count-min sketch
    (cell-wise SUM) and HyperLogLog registers (bucket-wise MAX), then
    emits one monitoring row — cumulative word count, distinct-word HLL
    estimate, registers/cells used, and the current top-``top_n`` heavy
    hitters. The continuous analog of the reference's in-process tally
    prints (`/root/reference/utils/time_verbose_object.py:29-44` +
    `harvest_service.py:198-232`), built on the mergeability the batch
    tests pin: the final ledger equals the one-shot batch sketch over
    the same rows EXACTLY, so a backfill and the stream agree.

    Heavy hitters are the classic CMS+heap composition: a CMS alone
    cannot enumerate keys, so the ledger carries a bounded CANDIDATE set
    — each epoch's local top-``cand_m`` terms union the surviving
    candidates, every candidate re-probed against the cumulative sketch.
    The ledger persists the best ``cand_m`` SURVIVORS (the full
    candidate heap, not just the reported ``top_n`` — round-4 ADVICE:
    reporting-only persistence would mean a term that is cumulatively
    heavy but never simultaneously in an epoch's local top or the prior
    report could never enter the tracked set). A term is tracked from
    the first epoch it is locally heavy in (the standard guarantee of
    this composition); the stream==batch test pins exact agreement on a
    skew-clear corpus.

    State is O(sketch) — ``depth×width + HLL_M + cand_m`` rows,
    independent of stream length — and NEVER evicts: unlike the
    dedup/boilerplate ledgers there is no per-key state to bound, that
    is the entire point of sketching the stream instead of keying it.

    Exactly-once composition is the frozen-pre-state pattern
    (``_read_cap_ledger``): epoch N reads snapshot N-1, writes snapshot
    N; a replayed epoch recomputes identical output for the idempotent
    epoch sink.
    """
    from data_harvesting_spark.functions.text import normalize_text
    from data_harvesting_spark.operators.sketch import (
        HLL_M,
        HLL_NUMERATOR,
        cms_build,
        cms_estimate,
        hll_registers,
    )

    ledger_path = sink_path.rstrip("/") + ".sketch"
    stream = read_transcript_stream(spark, source_dir)

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        from data_harvesting_spark.streaming.sink import write_epoch

        sp = df.sparkSession
        words = df.select(
            F.explode(
                F.filter(
                    F.split(normalize_text("text"), " "), lambda x: x != ""
                )
            ).alias("term")
        ).persist()
        try:
            # unified ledger rows: kind ∈ {cms, hll, n}; cms/n merge by
            # SUM, hll by MAX — one snapshot, three mergeable sketches
            cms_rows = cms_build(words, depth=depth, width=width).select(
                F.lit("cms").alias("kind"),
                F.col("row").cast("int").alias("r"),
                F.col("col").cast("long").alias("c"),
                F.col("cnt").cast("long").alias("v"),
            )
            hll_rows = hll_registers(words).select(
                F.lit("hll").alias("kind"),
                F.lit(0).alias("r"),
                F.col("bucket").cast("long").alias("c"),
                F.col("m_j").cast("long").alias("v"),
            )
            n_rows = words.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("n").alias("kind"),
                F.lit(0).alias("r"),
                F.lit(0).cast("long").alias("c"),
                F.col("n").cast("long").alias("v"),
            )
            batch_state = cms_rows.unionByName(hll_rows).unionByName(n_rows)
            prior = _read_hash_ledger(sp, ledger_path, epoch_id)
            if prior is None:
                prior_sketch, prior_cand = None, None
            else:
                prior_sketch = prior.where(F.col("kind") != "cand").select(
                    "kind", "r", "c", "v"
                )
                prior_cand = prior.where(F.col("kind") == "cand").select(
                    "term"
                )
            merged = (
                batch_state
                if prior_sketch is None
                else prior_sketch.unionByName(batch_state)
            )
            snapshot = (
                merged.groupBy("kind", "r", "c")
                .agg(
                    F.when(F.col("kind") == "hll", F.max("v"))
                    .otherwise(F.sum("v"))
                    .cast("long")
                    .alias("v")
                )
                .persist()
            )

            # CMS+heap heavy hitters: bounded candidate refresh + probe
            # of the CUMULATIVE sketch (so counts span all epochs even
            # for terms that just entered the candidate set)
            batch_top = (
                words.groupBy("term")
                .agg(F.count(F.lit(1)).alias("bc"))
                .orderBy(F.desc("bc"), "term")
                .limit(cand_m)
                .select("term")
            )
            cand = (
                batch_top
                if prior_cand is None
                else batch_top.union(prior_cand).distinct()
            )
            cum_cells = snapshot.where(F.col("kind") == "cms").select(
                F.col("r").alias("row"),
                F.col("c").alias("col"),
                F.col("v").alias("cnt"),
            )
            # estimate once over the whole candidate set; the ledger
            # persists the cand_m best SURVIVORS (not just the reported
            # top_n) — the standard CMS+heap composition keeps the full
            # candidate heap, else a term that is cumulatively heavy but
            # never simultaneously in an epoch's local top or the prior
            # top_n could never enter the tracked set (round-4 ADVICE)
            est = (
                cms_estimate(cum_cells, cand, depth=depth, width=width)
                .orderBy(F.desc("cms_cnt"), "term")
                .limit(cand_m)
                .persist()
            )
            top = est.orderBy(F.desc("cms_cnt"), "term").limit(top_n)

            hll_sum = snapshot.where(F.col("kind") == "hll").agg(
                F.count(F.lit(1)).cast("bigint").alias("registers_used"),
                F.coalesce(
                    F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 51 - v)")),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("s_present"),
            )
            totals = snapshot.where(F.col("kind") == "n").agg(
                F.coalesce(F.sum("v"), F.lit(0)).cast("bigint")
                .alias("n_words_cum")
            )
            cells = snapshot.where(F.col("kind") == "cms").agg(
                F.count(F.lit(1)).cast("bigint").alias("cms_cells_used")
            )
            top_terms = top.agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                (-F.col("cms_cnt")).alias("nk"), "term"
                            )
                        )
                    ),
                    lambda s: s["term"],
                ).alias("top_terms")
            )
            report = (
                hll_sum.crossJoin(totals)
                .crossJoin(cells)
                .crossJoin(top_terms)
                .select(
                    F.lit(epoch_id).cast("long").alias("epoch"),
                    "n_words_cum",
                    F.round(
                        F.lit(HLL_NUMERATOR)
                        / (
                            F.col("s_present")
                            + (F.lit(HLL_M) - F.col("registers_used"))
                            * F.lit(1 << 51).cast("bigint")
                        ),
                        2,
                    ).alias("hll_distinct_words"),
                    "registers_used",
                    "cms_cells_used",
                    "top_terms",
                )
            )
            write_epoch(report, epoch_id, sink_path)
            cand_rows = est.select(
                F.lit("cand").alias("kind"),
                F.lit(0).alias("r"),
                F.lit(0).cast("long").alias("c"),
                F.col("cms_cnt").cast("long").alias("v"),
                "term",
            )
            snapshot.withColumn(
                "term", F.lit(None).cast("string")
            ).unionByName(cand_rows).coalesce(4).write.mode(
                "overwrite"
            ).parquet(os.path.join(ledger_path, f"_epoch={epoch_id}"))
            snapshot.unpersist()
            est.unpersist()
            _prune_cap_ledger(ledger_path, epoch_id)
        finally:
            words.unpersist()

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_event_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """File micro-batch source over event-log parquet slices — the
    relational/funnel input (EVENT_SCHEMA), same replay contract as
    ``read_transcript_stream``."""
    from data_harvesting_spark.schema import EVENT_SCHEMA

    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(source_dir)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def start_sliding_hll_stream_job(
    spark: SparkSession,
    source_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    bits: int = 5,
    window: str = "7 days",
    slide: str = "1 day",
    watermark_delay: str = "1 day",
):
    """Sliding-window distinct users via NATIVE windowed HLL registers —
    the streaming twin of the ``hll_sliding_users`` catalog query, and
    the windowed-state counterpart of the two cumulative sketch streams:
    state here is Spark's own sliding-window aggregation over
    ``(window, bucket) -> max(rho)`` register cells (JVM UnsafeRow state,
    RocksDB-able, EVICTED automatically once the watermark closes a
    window) — no Python handler, no ledger, and the state bound is
    O(open windows × m) by construction.

    Append mode hands ``foreachBatch`` only CLOSED windows; since every
    bucket of a window shares the window's end, each window arrives
    complete, and the finalize step (harmonic sum → one double division,
    ``hll_estimate_grouped``) is a plain batch agg over O(m) rows.
    Emitted estimates equal the batch query's rows for the same windows
    bit-for-bit (same registers by max-merge associativity, same
    exact-integer arithmetic) — pinned by the parity test.

    Rows later than the watermark are dropped by the engine and
    accounted in ``numRowsDroppedByWatermark`` (W2/W6); windows still
    open when the stream stops are simply not yet emitted (they emit on
    resume — kill-resume test).
    """
    from data_harvesting_spark.operators.sketch import (
        hll_estimate_grouped,
        hll_rho_projection,
    )

    stream = read_event_stream(spark, source_dir)
    items = stream.select(
        "ts", F.col("user_id").cast("string").alias("term")
    )
    rho = hll_rho_projection(items, ["ts"], bits=bits)
    regs = (
        rho.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window, slide).alias("w"), "bucket")
        .agg(F.max("rho").alias("m_j"))
    )

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        from data_harvesting_spark.streaming.sink import write_epoch

        cells = df.select(
            F.floor(F.unix_timestamp("w.start") / 86400)
            .cast("bigint")
            .alias("window_start_day"),
            "bucket",
            "m_j",
        )
        est = hll_estimate_grouped(
            cells, ["window_start_day"], bits=bits
        ).select(
            F.lit(epoch_id).cast("long").alias("epoch"),
            "window_start_day",
            "registers_used",
            "s_scaled",
            F.col("hll_estimate").alias("hll_users"),
        )
        write_epoch(est, epoch_id, sink_path)

    writer = (
        regs.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_scd2_stream_job(
    spark: SparkSession,
    source_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    watermark_delay: str = "10 minutes",
    available_now: bool = True,
):
    """Continuous SCD Type-2 dimension maintenance over the event stream
    (streaming/scd2.py): emits every CLOSED version row the moment its
    closing event passes the watermark; the open (current) version per
    user is the keyed state — the dimension's current table, bounded by
    entity count. Emitted closed versions == the batch
    ``scd2_user_state`` query's ``is_current = false`` rows EXACTLY
    (parity + kill-resume tests)."""
    from data_harvesting_spark.streaming.scd2 import scd2_stream

    late_counter = spark.sparkContext.accumulator(0)
    stream = read_event_stream(spark, source_dir)
    closed = scd2_stream(stream, watermark_delay, late_counter)

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        from data_harvesting_spark.streaming.sink import write_epoch

        write_epoch(df, epoch_id, sink_path)

    writer = (
        closed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.late_counter = late_counter
    return q


def start_followups_stream_job(
    spark: SparkSession,
    source_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    lower_us: int = 0,
    upper_us: int = 30 * 60 * 1_000_000,
    watermark: str = "2 hours",
):
    """NATIVE watermarked stream-stream interval self-join — the
    streaming twin of ``operators/temporal.py::range_join`` (same
    semantics: for every error event, all same-user events with ts in
    ``(error_ts + lower, error_ts + upper]``), expressed entirely as
    Spark's built-in stream-stream join instead of a Python stateful
    handler: both sides carry event-time watermarks and the join
    condition is a recognized time-range constraint
    (``r_ts BETWEEN l_ts + lower AND l_ts + upper``), so the engine
    buffers each side in JVM state and EVICTS rows the moment the
    watermark proves no future match can arrive — state is
    O(watermark-window of both sides), maintained by Spark itself with
    no ledger, no handler, no Python in the loop.

    Matches split across micro-batches pair up when the second side
    arrives (pinned by the cross-epoch test); rows later than the
    watermark on either side are dropped by the engine — the documented
    divergence from the batch twin, same contract as every other
    watermarked job here. Output pairs flow append-mode through the
    idempotent epoch sink; aggregation to the blast-radius report shape
    (``events_error_followups``) is a batch job over the sink.
    """
    stream = read_event_stream(spark, source_dir)
    errors = (
        stream.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("l_event_id"),
            F.col("user_id").alias("l_user_id"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", watermark)
    )
    follows = (
        stream.select(
            F.col("event_id").alias("r_event_id"),
            "user_id",
            F.col("ts").alias("r_ts"),
            F.col("value").alias("r_value"),
        )
        .withWatermark("r_ts", watermark)
    )
    joined = errors.join(
        follows,
        F.expr(
            f"""user_id = l_user_id
            AND r_ts > l_ts + INTERVAL {lower_us} MICROSECOND
            AND r_ts <= l_ts + INTERVAL {upper_us} MICROSECOND"""
        ),
    ).select(
        "l_event_id", F.col("l_user_id").alias("user_id"), "l_ts",
        "r_event_id", "r_ts", "r_value",
    )

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        from data_harvesting_spark.streaming.sink import write_epoch

        write_epoch(df, epoch_id, sink_path)

    writer = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_unmatched_errors_stream_job(
    spark: SparkSession,
    source_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    lower_us: int = 0,
    upper_us: int = 30 * 60 * 1_000_000,
    watermark: str = "2 hours",
):
    """LEFT-OUTER watermarked stream-stream interval join — the absence
    (dead-letter) completion of ``start_followups_stream_job``: every
    error event pairs with its same-user follow-ups in
    ``(error_ts + lower, error_ts + upper]``, and an error with NO
    follow-up in that window is still emitted, null-padded, the moment
    the watermark PROVES no future match can arrive (reference analog:
    the harvester's unanswered-call timeout surface,
    /root/reference/queue_harvesting.py:30-68 — here as Spark's native
    outer join instead of the Python stateful handler in
    ``start_timeout_stream_job``, so the timeout fires in the JVM with
    no ledger and no Python in the loop).

    Semantics/contract:
    - Matched rows emit as soon as both sides have arrived (same as the
      inner job); null-padded rows emit only in the no-data micro-batch
      after the watermark passes ``l_ts + upper + delay`` — finite
      replays need ``drain()`` (or a production always-on trigger) for
      the final flush, and errors whose horizon the final watermark
      never passes stay buffered (the engine cannot yet prove absence;
      documented divergence from the batch anti-join twin, pinned by
      the parity test's watermark-advancing sentinel).
    - State is O(watermark-window of both sides), evicted by the engine.
    - Unresolved errors are exactly the sink rows with ``r_event_id``
      NULL; the batch twin of that report is
      ``events_error_followups`` filtered to ``n_follow = 0``.
    """
    stream = read_event_stream(spark, source_dir)
    errors = (
        stream.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("l_event_id"),
            F.col("user_id").alias("l_user_id"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", watermark)
    )
    follows = (
        stream.select(
            F.col("event_id").alias("r_event_id"),
            "user_id",
            F.col("ts").alias("r_ts"),
            F.col("value").alias("r_value"),
        )
        .withWatermark("r_ts", watermark)
    )
    joined = errors.join(
        follows,
        F.expr(
            f"""user_id = l_user_id
            AND r_ts > l_ts + INTERVAL {lower_us} MICROSECOND
            AND r_ts <= l_ts + INTERVAL {upper_us} MICROSECOND"""
        ),
        "left_outer",
    ).select(
        "l_event_id", F.col("l_user_id").alias("user_id"), "l_ts",
        "r_event_id", "r_ts", "r_value",
    )

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        from data_harvesting_spark.streaming.sink import write_epoch

        write_epoch(df, epoch_id, sink_path)

    writer = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_quantile_sketch_stream_job(
    spark: SparkSession,
    source_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
):
    """Streaming per-event-type VALUE-QUANTILE monitor (p50/p90/p99) over
    the mergeable log2-bucket histogram sketch — the continuous SLO-style
    telemetry the batch ``value_quantile_sketch`` query computes one-shot,
    and the fourth sketch kind in the streaming family beside the
    CMS/HLL/candidate ledger of ``start_sketch_stream_job``.

    Every epoch folds its (event_type, bit-length-bucket) counts into the
    cumulative histogram by cell-wise SUM (the sketch's merge law), then
    emits per-type quantile estimates from the CUMULATIVE histogram. The
    final epoch's report equals the one-shot batch
    ``histogram_quantiles(log2_histogram_grouped(...))`` over the same
    rows EXACTLY — integer bucket spans, one double division, no
    order-dependence anywhere, pinned by the stream==batch test.

    State is O(types × ~64 buckets) regardless of stream length and never
    evicts (nothing is keyed per row — that is the point of sketching).
    Exactly-once is the frozen-pre-state ledger pattern shared with the
    other sketch stream: epoch N reads snapshot N-1 and writes snapshot N,
    so a replayed epoch recomputes identical output for the idempotent
    epoch sink.

    Reference parity: the reference prints running per-class tallies as
    its pipeline telemetry (`/root/reference/utils/time_verbose_object.py:29-44`);
    latency/value percentiles over an unbounded stream in fixed memory is
    that telemetry grown up.
    """
    from data_harvesting_spark.operators.sketch import (
        histogram_quantiles,
        log2_histogram_grouped,
    )

    ledger_path = sink_path.rstrip("/") + ".qhist"
    stream = read_event_stream(spark, source_dir)

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        from data_harvesting_spark.streaming.sink import write_epoch

        sp = df.sparkSession
        vm = df.select(
            "event_type",
            F.floor(F.col("value") * 1000).cast("bigint").alias("v"),
        )
        batch_hist = log2_histogram_grouped(vm, ["event_type"])
        prior = _read_hash_ledger(sp, ledger_path, epoch_id)
        merged = (
            batch_hist
            if prior is None
            else prior.select("event_type", "bucket", "cnt").unionByName(
                batch_hist
            )
        )
        snapshot = (
            merged.groupBy("event_type", "bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .persist()
        )
        report = histogram_quantiles(
            snapshot, ["event_type"], list(qs)
        ).select(
            F.lit(epoch_id).cast("long").alias("epoch"),
            "event_type",
            "q",
            "n",
            "est",
        )
        write_epoch(report, epoch_id, sink_path)
        snapshot.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(ledger_path, f"_epoch={epoch_id}")
        )
        snapshot.unpersist()
        _prune_cap_ledger(ledger_path, epoch_id)

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_funnel_stream_job(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
    sink_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    attribution_window: str | None = None,
):
    """Continuous first-touch funnel over the event stream: every epoch
    min-merges its per-user per-stage timestamps into the ledger and
    emits ONE cumulative conversion-report row.

    Why this streams exactly (no prefix caveat): the state is per-user
    per-stage MIN timestamps — a commutative, associative, idempotent
    fold — and the ordering comparisons run at report time only, so the
    cumulative report after epoch N equals the batch funnel over all
    events in epochs ≤ N REGARDLESS of arrival order, even across
    epochs. The stream==batch test pins this with stages arriving out of
    order across micro-batches.

    Unbounded mode (``attribution_window=None``): state is O(all users)
    × 3 timestamps and never evicts — dropping a user's signup would
    un-credit a later conversion (min-merge is not retention-safe the
    way the dedup ledgers are).

    Bounded mode (``attribution_window`` set, e.g. ``"30 days"``):
    stages only count within the window after signup — the standard
    attribution rule — which makes users FINALIZABLE: once the batch
    max event time passes ``t_signup + window + watermark_delay``, no
    in-window event can still arrive (the watermark bounds lateness),
    so the user's 0/1 stage outcomes fold into three persistent COUNTER
    cells and the user row COMPRESSES to a ``done`` tombstone
    (user_id + flag, timestamps nulled). The tombstone is what keeps
    the report exact if the same user signs up AGAIN later: the batch
    funnel's first-touch min keeps the original (already-counted)
    signup, so the stream must ignore the re-entry rather than count
    the user twice — ``done`` rows are excluded from both the live
    scan and re-finalization forever.

    No-signup users whose last stage activity has aged past the
    watermark compress too: their non-null stage timestamps collapse to
    the epoch sentinel (1970-01-01). Under the watermark contract any
    FUTURE signup carries a newer event time than those stages, so in
    the batch funnel the first-touch stage min stays pre-signup and the
    stage is denied (`t_view > t_signup` is strict); the sentinel
    reproduces exactly that denial while dropping the actual values.
    A poisoned stage the user never had stays NULL, so a genuinely new
    post-signup stage still counts — sentinel rows and batch agree on
    every comparison the report makes.

    Ledger width is O(users inside the attribution horizon) full rows
    + O(evicted users) compact tombstones + 1 counter row. The
    tombstones are the information-theoretic floor: exactness under
    arbitrary user re-appearance requires remembering at least the set
    of users whose outcome is already decided. The cumulative report
    stays EXACT under the windowed rule — eviction compresses truth,
    it never forgets it (pinned by the signup-after-dead-eviction and
    re-signup-after-finalization tests).

    Exactly-once: frozen-pre-state snapshots (``_read_cap_ledger``
    protocol) + idempotent epoch sink, as every sibling job.
    """
    from data_harvesting_spark.operators.curate_sessions import (
        parse_duration_seconds,
    )
    from data_harvesting_spark.operators.funnel import (
        FUNNEL_STAGES,
        funnel_outcomes,
        funnel_stage_mins,
    )

    ledger_path = sink_path.rstrip("/") + ".funnel"
    stream = read_event_stream(spark, source_dir)
    cols = [f"t_{s}" for s in FUNNEL_STAGES]
    fcols = ["f_signup", "f_view", "f_purchase"]
    win_s = (
        int(parse_duration_seconds(attribution_window))
        if attribution_window
        else None
    )
    delay_s = int(parse_duration_seconds(cfg.watermark_delay))

    sentinel = F.lit("1970-01-01").cast("timestamp")

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        from data_harvesting_spark.streaming.sink import write_epoch

        sp = df.sparkSession
        batch_mins = funnel_stage_mins(df).withColumn("done", F.lit(False))
        prior = _read_hash_ledger(sp, ledger_path, epoch_id)
        if prior is None:
            prior_users, prior_counts = None, (0, 0, 0)
        elif win_s is None:
            prior_users, prior_counts = (
                prior.select("user_id", *cols, "done"),
                (0, 0, 0),
            )
        else:
            prior_users = prior.where(F.col("user_id").isNotNull()).select(
                "user_id", *cols, "done"
            )
            crow = prior.where(F.col("user_id").isNull()).select(*fcols)
            got = crow.collect()
            prior_counts = (
                (got[0][0] or 0, got[0][1] or 0, got[0][2] or 0)
                if got
                else (0, 0, 0)
            )
        # min-merge the stage mins; a tombstone's done flag survives the
        # merge (max), so a re-appearing finalized user stays suppressed
        state = (
            batch_mins
            if prior_users is None
            else prior_users.unionByName(batch_mins)
            .groupBy("user_id")
            .agg(
                *[F.min(c).alias(c) for c in cols],
                F.max("done").alias("done"),
            )
        ).persist()

        if win_s is None:
            live, counts = state, (0, 0, 0)
            fin_pred = F.lit(False)
            dead_pred = F.lit(False)
        else:
            hi = df.agg(F.max("ts").alias("hi")).collect()[0]["hi"]
            horizon = (
                F.lit(hi)
                - F.make_interval(secs=F.lit(win_s + delay_s))
            )
            dead_horizon = F.lit(hi) - F.make_interval(secs=F.lit(delay_s))
            fin_pred = (
                (~F.col("done"))
                & F.col("t_signup").isNotNull()
                & (F.col("t_signup") < horizon)
            )
            dead_pred = (
                (~F.col("done"))
                & F.col("t_signup").isNull()
                & (
                    F.greatest(
                        F.coalesce(F.col("t_view"), sentinel),
                        F.coalesce(F.col("t_purchase"), sentinel),
                    )
                    < dead_horizon
                )
            )
            finalized = state.where(fin_pred)
            frow = (
                funnel_outcomes(finalized, win_s)
                .agg(
                    F.count("t_signup").alias("s"),
                    F.count("t_view_ok").alias("v"),
                    F.count("t_purchase_ok").alias("p"),
                )
                .collect()[0]
            )
            counts = (
                prior_counts[0] + frow["s"],
                prior_counts[1] + frow["v"],
                prior_counts[2] + frow["p"],
            )
            # live = not already counted (done) and not counted this epoch.
            # Dead-poisoned rows may stay in: null t_signup contributes 0.
            live = state.where((~F.col("done")) & (~fin_pred)).persist()

        live_counts = (
            funnel_outcomes(live, win_s)
            .agg(
                F.count("t_signup").alias("s"),
                F.count("t_view_ok").alias("v"),
                F.count("t_purchase_ok").alias("p"),
            )
        )
        report = live_counts.select(
            F.lit(epoch_id).cast("long").alias("epoch"),
            (F.col("s") + F.lit(counts[0])).cast("bigint").alias("n_signup"),
            (F.col("v") + F.lit(counts[1]))
            .cast("bigint")
            .alias("n_signup_view"),
            (F.col("p") + F.lit(counts[2]))
            .cast("bigint")
            .alias("n_signup_view_purchase"),
            F.round(
                F.try_divide(
                    F.col("v") + F.lit(counts[1]),
                    F.col("s") + F.lit(counts[0]),
                ),
                6,
            ).alias("conv_view"),
            F.round(
                F.try_divide(
                    F.col("p") + F.lit(counts[2]),
                    F.col("v") + F.lit(counts[1]),
                ),
                6,
            ).alias("conv_purchase"),
        )
        write_epoch(report, epoch_id, sink_path)
        # snapshot compression: finalized (and prior done) rows → done
        # tombstones with nulled timestamps; watermark-dead rows → keep,
        # but collapse their non-null stage mins to the sentinel (any
        # future signup is newer, so the comparison outcome is identical)
        tomb = fin_pred | F.col("done")
        snapshot = state.select(
            "user_id",
            F.when(tomb, F.lit(None).cast("timestamp"))
            .otherwise(F.col("t_signup"))
            .alias("t_signup"),
            *[
                F.when(tomb, F.lit(None).cast("timestamp"))
                .when(dead_pred & F.col(c).isNotNull(), sentinel)
                .otherwise(F.col(c))
                .alias(c)
                for c in ("t_view", "t_purchase")
            ],
            tomb.alias("done"),
        )
        if win_s is not None:
            counter_row = sp.createDataFrame(
                [
                    (
                        None, None, None, None, True,
                        counts[0], counts[1], counts[2],
                    )
                ],
                "user_id long, t_signup timestamp, t_view timestamp, "
                "t_purchase timestamp, done boolean, f_signup long, "
                "f_view long, f_purchase long",
            )
            snapshot = snapshot.select(
                "user_id",
                *cols,
                "done",
                *[F.lit(None).cast("long").alias(c) for c in fcols],
            ).unionByName(counter_row)
        snapshot.coalesce(4).write.mode("overwrite").parquet(
            os.path.join(ledger_path, f"_epoch={epoch_id}")
        )
        if live is not state:
            live.unpersist()
        state.unpersist()
        _prune_cap_ledger(ledger_path, epoch_id)

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_document_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """File micro-batch source over document parquet slices — the corpus
    ingest input (documents-table shape), same replay contract as
    ``read_transcript_stream``."""
    reader = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def start_components_stream_job(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
    sink_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    n: int = 3,
    threshold: float = 0.5,
    hash_mode: str = "xxhash64",
):
    """Incremental duplicate-cluster maintenance over a growing corpus
    (round-4 verdict item #5): the streaming counterpart of the batch
    ``dedup_components`` closure, in the reference's infinite-ingest
    shape (`/root/reference/queue_harvesting.py:30-68`).

    Edge rule: MinHash band-bucket candidates verified by
    signature-estimated Jaccard ≥ ``threshold``
    (`operators/dedup.py::minhash_sig_pairs`) — decided entirely from
    the bounded-width signature index, so corpus-side candidates never
    re-read document text.

    Incremental merge (union-find over epoch deltas): per epoch,
      1. sign the new documents; candidates = new×new plus new×index
         band collisions — over all epochs this is EXACTLY the batch
         candidate set (each pair surfaces when its later member
         arrives), so the final labels equal the batch closure.
      2. PROJECT delta edges through the current labels (endpoint →
         its component root, identity for unlabeled nodes) and run the
         large/small-star closure on the projected edges only — work
         O(|delta| + affected roots), never O(corpus).
      3. compose: every label (and newly-edged node) re-roots through
         the delta closure's root map. Roots are min-reachable ids, so
         by induction the composed labels stay the min id of each
         merged cluster — identical to the one-shot batch labels.

    State: the (doc_id, sig) index — O(corpus) rows × N_HASHES width,
    the irreducible cost of cross-epoch candidate generation — plus
    (node, component) for duplicate-involved nodes only. Exactly-once:
    frozen-pre-state snapshots + idempotent epoch sink, as every
    sibling job. Each epoch emits (epoch, n_dup_nodes, n_clusters).
    """
    from data_harvesting_spark.operators.dedup import (
        band_candidates,
        bands_of_signatures,
        connected_components,
        minhash_signatures,
        sig_verify_pairs,
    )

    ledger_path = sink_path.rstrip("/") + ".components"
    stream = read_document_stream(spark, source_dir)

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        from data_harvesting_spark.streaming.sink import write_epoch

        sp = df.sparkSession
        new_sigs = minhash_signatures(df, n, hash_mode).persist()
        prior = _read_hash_ledger(sp, ledger_path, epoch_id)
        if prior is None:
            prior_sigs, prior_labs = None, None
        else:
            prior_sigs = prior.where(F.col("kind") == "sig").select(
                "doc_id", "sig"
            )
            prior_labs = prior.where(F.col("kind") == "lab").select(
                F.col("doc_id").alias("node"),
                F.col("component"),
            )

        # one edge-rule definition: both legs delegate the band-collision
        # predicate to dedup.band_candidates (shared with the oracle-
        # checked sig_pair_dups batch query)
        nb = bands_of_signatures(new_sigs)
        cand = band_candidates(nb)
        if prior_sigs is not None:
            pb = bands_of_signatures(prior_sigs)
            cand = cand.unionByName(band_candidates(nb, pb))
            all_sigs = prior_sigs.unionByName(new_sigs)
        else:
            all_sigs = new_sigs
        edges = sig_verify_pairs(cand.distinct(), all_sigs, threshold).select(
            "doc_a", "doc_b"
        ).persist()

        labs = (
            prior_labs
            if prior_labs is not None
            else sp.createDataFrame([], "node bigint, component bigint")
        )
        # project delta edges through current labels (root or identity)
        la = labs.select(F.col("node").alias("doc_a"),
                         F.col("component").alias("_ca"))
        lb = labs.select(F.col("node").alias("doc_b"),
                         F.col("component").alias("_cb"))
        projected = (
            edges.join(la, "doc_a", "left")
            .join(lb, "doc_b", "left")
            .select(
                F.coalesce("_ca", "doc_a").alias("doc_a"),
                F.coalesce("_cb", "doc_b").alias("doc_b"),
            )
            .where(F.col("doc_a") != F.col("doc_b"))
            .distinct()
        )
        if projected.isEmpty():
            upd = labs
        else:
            cc = connected_components(projected)  # (node=old root, component)
            nodes = (
                labs.select("node")
                .unionByName(edges.select(F.col("doc_a").alias("node")))
                .unionByName(edges.select(F.col("doc_b").alias("node")))
                .distinct()
            )
            base = (
                nodes.join(labs, "node", "left")
                .select(
                    "node",
                    F.coalesce("component", "node").alias("_c0"),
                )
            )
            upd = (
                base.join(
                    cc.withColumnRenamed("node", "_c0"), "_c0", "left"
                )
                .select(
                    "node", F.coalesce("component", "_c0").alias("component")
                )
            )
        upd = upd.persist()

        report = upd.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dup_nodes"),
            F.countDistinct("component").cast("bigint").alias("n_clusters"),
        ).select(
            F.lit(epoch_id).cast("long").alias("epoch"),
            "n_dup_nodes",
            "n_clusters",
        )
        write_epoch(report, epoch_id, sink_path)

        sig_rows = all_sigs.select(
            F.lit("sig").alias("kind"),
            "doc_id",
            "sig",
            F.lit(None).cast("bigint").alias("component"),
        )
        lab_rows = upd.select(
            F.lit("lab").alias("kind"),
            F.col("node").alias("doc_id"),
            F.lit(None).cast("array<bigint>").alias("sig"),
            "component",
        )
        sig_rows.unionByName(lab_rows).coalesce(4).write.mode(
            "overwrite"
        ).parquet(os.path.join(ledger_path, f"_epoch={epoch_id}"))
        upd.unpersist()
        edges.unpersist()
        new_sigs.unpersist()
        _prune_cap_ledger(ledger_path, epoch_id)

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_seq_pattern_stream_job(
    spark: SparkSession,
    source_dir: str,
    cfg: HarvestConfig,
    available_now: bool = True,
):
    """The generic contiguous sequence matcher (streaming/cep.py) on the
    transcript stream with the stock DIALOG_TRIPLE pattern — the batch
    ``pattern_seq_dialog`` catalog query as ONE continuous stream. Rows
    finalize strictly in event-time order at the watermark; each match
    emits at the flush that finalizes its last step's row, with the
    last n-1 finalized rows carried per conversation so matches spanning
    flushes emit exactly as the batch lead-chain would (parity test).
    Output flows through the idempotent epoch sink (W7; kill-resume
    test)."""
    from data_harvesting_spark.operators.cep import DIALOG_TRIPLE
    from data_harvesting_spark.operators.curate_sessions import (
        parse_duration_seconds,
    )
    from data_harvesting_spark.streaming.cep import (
        DIALOG_OUTPUT_SCHEMA,
        TRANSCRIPT_ROWS,
        seq_pattern_stream,
    )
    from data_harvesting_spark.streaming.sink import write_epoch

    assert cfg.sink_path and cfg.checkpoint_dir, "configure sink + checkpoint"
    os.makedirs(cfg.sink_path, exist_ok=True)
    retention_ms = int(parse_duration_seconds(cfg.cap_state_retention) * 1000)
    late_counter = spark.sparkContext.accumulator(0)
    stream = read_transcript_stream(spark, source_dir)
    matches = seq_pattern_stream(
        stream,
        TRANSCRIPT_ROWS,
        DIALOG_TRIPLE,
        DIALOG_OUTPUT_SCHEMA,
        cfg.watermark_delay,
        retention_ms,
        late_counter,
    )

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        write_epoch(df, epoch_id, cfg.sink_path)

    writer = (
        matches.writeStream.outputMode("append")
        .option("checkpointLocation", cfg.checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.late_counter = late_counter
    return q


def start_burst_pattern_stream_job(
    spark: SparkSession,
    source_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    watermark_delay: str = "10 minutes",
    retention_ms: int = 24 * 3600 * 1000,
):
    """The SAME generic matcher on the EVENT-LOG stream with the
    time-bounded CONVERSION_BURST pattern (view -> click -> purchase as
    consecutive events of one user within 30 minutes) — one handler
    factory, two row shapes, which is the point of the generic CEP
    surface. Batch twin: ``pattern_seq_conversion``; parity + kill-resume
    tests."""
    from data_harvesting_spark.operators.cep import CONVERSION_BURST
    from data_harvesting_spark.streaming.cep import (
        BURST_OUTPUT_SCHEMA,
        EVENT_ROWS,
        seq_pattern_stream,
    )
    from data_harvesting_spark.streaming.sink import write_epoch

    late_counter = spark.sparkContext.accumulator(0)
    stream = read_event_stream(spark, source_dir)
    matches = seq_pattern_stream(
        stream,
        EVENT_ROWS,
        CONVERSION_BURST,
        BURST_OUTPUT_SCHEMA,
        watermark_delay,
        retention_ms,
        late_counter,
    )

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        write_epoch(df, epoch_id, sink_path)

    writer = (
        matches.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.late_counter = late_counter
    return q


def start_dq_monitor_stream_job(
    spark: SparkSession,
    source_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuous data-quality monitor over the event stream: every epoch
    re-evaluates the named gate rules (uniqueness via HLL, completeness,
    non-negativity, domain membership — `operators/dq.py`, one shared
    frame with the batch twin) against the CUMULATIVE stream and emits
    ``(epoch, rule, passed, actual)`` — the `dq_constraints` batch gate
    grown into fleet telemetry, alongside the always-on listener metrics
    (`streaming/metrics.py`).

    State is two mergeable tables, O(1) in the stream: rule counters
    (merge = SUM — every counter is a count) and 1024 event_id HLL
    registers (merge = MAX). Both merges are associative and
    commutative, so the final epoch's report equals the one-shot batch
    ``dq_monitor_batch`` over the same rows EXACTLY — including the HLL
    estimate, which is one deterministic double division over exact-int
    sums. Exactly-once is the frozen-pre-state ledger shared with the
    sketch streams: epoch N reads snapshot N-1 and writes snapshot N, so
    a replayed epoch recomputes identical output for the idempotent
    epoch sink (kill-resume pinned).

    The two states ride ONE tagged snapshot table ``(kind, k, v)`` —
    ``c`` rows merge by sum, ``h`` rows by max — so the ledger write
    stays a single bounded parquet (≤ len(counters) + 1024 rows).
    """
    from data_harvesting_spark.operators.dq import (
        dq_monitor_counters,
        dq_monitor_registers,
        dq_monitor_report,
    )
    from data_harvesting_spark.streaming.sink import write_epoch

    ledger_path = sink_path.rstrip("/") + ".dqstate"
    stream = read_event_stream(spark, source_dir)

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        ctr_b = dq_monitor_counters(df).select(
            F.lit("c").alias("kind"), "k", "v"
        )
        reg_b = dq_monitor_registers(df).select(
            F.lit("h").alias("kind"),
            F.col("bucket").cast("string").alias("k"),
            F.col("m_j").cast("long").alias("v"),
        )
        prior = _read_hash_ledger(df.sparkSession, ledger_path, epoch_id)
        merged = ctr_b.unionByName(reg_b)
        if prior is not None:
            merged = merged.unionByName(prior.select("kind", "k", "v"))
        snapshot = (
            merged.groupBy("kind", "k")
            .agg(F.sum("v").alias("_sum"), F.max("v").alias("_max"))
            .select(
                "kind",
                "k",
                F.when(F.col("kind") == "c", F.col("_sum"))
                .otherwise(F.col("_max"))
                .cast("long")
                .alias("v"),
            )
            .persist()
        )
        counters = snapshot.where(F.col("kind") == "c").select("k", "v")
        regs = snapshot.where(F.col("kind") == "h").select(
            F.col("k").cast("bigint").alias("bucket"),
            F.col("v").cast("int").alias("m_j"),
        )
        report = dq_monitor_report(counters, regs).select(
            F.lit(epoch_id).cast("long").alias("epoch"),
            "rule",
            "passed",
            "actual",
        )
        write_epoch(report, epoch_id, sink_path)
        snapshot.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(ledger_path, f"_epoch={epoch_id}")
        )
        snapshot.unpersist()
        _prune_cap_ledger(ledger_path, epoch_id)

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_enrich_stream_job(
    spark: SparkSession,
    source_dir: str,
    dim_path: str,
    sink_path: str,
    checkpoint_dir: str,
    key_col: str = "event_type",
    available_now: bool = True,
):
    """Stream-static dimension enrichment with per-epoch dim refresh —
    the streaming twin of the J2 broadcast class-mapping join
    (`operators/mapping.py`; reference: the label-translation dim the
    harvest loop consults per frame,
    `/root/reference/services/harvest_service.py:150-171`), and the
    consumer side of the SCD2 maintenance stream
    (`start_scd2_stream_job` maintains the dimension; this job enriches
    facts against its current snapshot).

    Each micro-batch RE-READS the dimension parquet and broadcast-joins
    it (left) onto the epoch's fact rows, so dimension updates take
    effect at the next epoch boundary — made explicit through
    foreachBatch because a native stream-static join against a file
    source may pin the file listing at query start and never see
    updates. Semantics are therefore PROCESSING-EPOCH enrichment: a row
    is labeled with the dim version visible when its epoch runs, the
    standard production contract for slowly-changing reference data.
    When EVENT-TIME-correct attribution is required instead, use the
    batch SCD2 validity-interval join (`scd2_user_state`) or the as-of
    join (`events_asof_attribution`) — both shipped and oracle-checked.

    Scale shape: the fact stream never shuffles — the dim (size-bounded
    by contract, like every broadcast dim here) ships to executors once
    per epoch; unknown keys survive the left join with null attributes
    (counted downstream, never dropped silently). Exactly-once: the
    idempotent per-epoch overwrite sink — a replayed epoch re-enriches
    with the then-current dim snapshot and REPLACES its output
    atomically, so each epoch directory is internally consistent with
    exactly one dim version.
    """
    stream = read_event_stream(spark, source_dir)

    def batch_writer(df: DataFrame, epoch_id: int) -> None:
        from data_harvesting_spark.streaming.sink import write_epoch

        dim = spark.read.parquet(dim_path)  # fresh snapshot, this epoch
        out = df.join(F.broadcast(dim), on=key_col, how="left")
        write_epoch(out, epoch_id, sink_path)

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
