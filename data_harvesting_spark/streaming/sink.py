"""Exactly-once sinks (S5/S6/W7).

The reference's sink is filesystem writes named by unix seconds — duplicated
on crash, colliding within 1 s (`exports/yolov8/yolov8_export.py:63-90`,
`services/harvest_service.py:110-129`). The engine replaces it with
checkpointed offsets + an idempotent write in ``foreachBatch``:

- ``epoch`` mode (default, no extra jars): each micro-batch writes to its
  own ``_epoch=N`` directory with overwrite. A replayed batch (failure
  between write and checkpoint commit) regenerates the SAME rows for the
  SAME epoch and overwrites the SAME directory → exactly-once end to end.
  Deterministic batch content is guaranteed by the replayable source +
  deterministic pipeline (no wall-clock, no rand).
- ``merge`` mode: keyed upsert emulation (delete-matching + append) on the
  curated key (conv_id, window_start) — the local stand-in for the
  production Iceberg ``MERGE INTO``.
- ``iceberg`` mode: real ``MERGE INTO`` via SQL, gated on the runtime
  actually having Iceberg on the classpath (not in this container).

A sink-format registry dispatches by name (reference factory pattern,
`exports/export_factory.py:15-27`).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CURATED_KEY = ["conv_id", "window_start"]

# conv_id hash buckets partitioning the merge sink: an epoch rewrites ONLY
# the buckets its batch touches, so per-epoch cost is O(touched buckets),
# not O(total sink). More buckets = finer rewrite granularity.
N_MERGE_BUCKETS = 64


def _bucket_col():
    return F.pmod(F.xxhash64("conv_id"), F.lit(N_MERGE_BUCKETS)).cast("int")


def write_epoch(df: DataFrame, epoch_id: int, sink_path: str) -> None:
    """Idempotent per-epoch overwrite + per-partition lineage record."""
    from data_harvesting_spark.streaming.metrics import record_epoch_lineage

    epoch_dir = os.path.join(sink_path, f"_epoch={epoch_id}")
    df.withColumn("_epoch", F.lit(epoch_id)).write.mode("overwrite").parquet(
        epoch_dir
    )
    record_epoch_lineage(sink_path, epoch_id, epoch_dir)


def read_epoch_sink(spark: SparkSession, sink_path: str) -> DataFrame:
    _recover_compaction(sink_path)
    df = spark.read.option("basePath", sink_path).parquet(
        os.path.join(sink_path, "_epoch=*")
    )
    return df.drop("_epoch")


# ---------------------------------------------------------------- compaction
# Long-running streams accumulate one _epoch=N directory per micro-batch —
# the classic lakehouse small-file problem (Iceberg's rewrite_data_files /
# the reference's dataset re-versioning, `exports/yolov8/yolov8_export.py:
# 40-52`). compact_epochs folds settled epochs into one consolidated
# directory, crash-safely, without touching the epochs that could still be
# replayed from the checkpoint.

_COMPACT_MARKER = ".compacting"


def _recover_compaction(sink_path: str) -> None:
    """Roll the sink out of an interrupted compaction.

    Protocol (``compact_epochs``): (1) stage the consolidated directory
    under ``<sink>.compact.tmp/<attempt>/`` — the sink itself is untouched;
    (2) atomically rename the ``.compacting`` marker into place, naming the
    source dirs, the destination, and the attempt dir; (3) remove the
    source dirs; (4) move the staged dir in; (5) remove the marker. Every
    crash window resolves without row loss or duplication:

    - no marker → nothing to do. Pre-marker tmp state is NEVER touched from
      the read path: a reader racing a live ``compact_epochs`` between its
      staging write and its marker write must not delete the staged rows
      (the compactor would then remove the sources and lose them — the
      round-3 ADVICE race). Stale attempts are cleaned by the single-writer
      ``compact_epochs`` itself.
    - torn/unreadable marker → impossible with the atomic rename write, but
      treated as pre-commit (the marker lands before any source is
      touched, so sources are intact): drop the marker, leave tmp for the
      compactor to clean.
    - marker + staged dir present → sources may be partially removed, the
      staged dir holds ALL their rows: finish removals, move it in.
    - marker + destination already in the sink → finish removals, clean up.

    Idempotent and safe to run concurrently with the post-marker tail of a
    live compaction: removals tolerate already-gone dirs and the final
    rename tolerates the other side having won it.
    """
    marker = os.path.join(sink_path, _COMPACT_MARKER)
    tmp_root = sink_path.rstrip("/") + ".compact.tmp"
    if not os.path.isfile(marker):
        return
    try:
        with open(marker) as f:
            state = json.load(f)
    except (json.JSONDecodeError, OSError):
        try:
            os.remove(marker)
        except FileNotFoundError:
            pass
        return
    staged = os.path.join(tmp_root, state.get("attempt", ""), state["dest"])
    dest = os.path.join(sink_path, state["dest"])
    if os.path.isdir(staged) or os.path.isdir(dest):
        for name in state["remove"]:
            shutil.rmtree(os.path.join(sink_path, name), ignore_errors=True)
        if not os.path.isdir(dest):
            try:
                os.rename(staged, dest)
            except OSError:
                # a concurrent recovery won the rename — dest must exist now
                if not os.path.isdir(dest):
                    raise
    try:
        os.remove(marker)
    except FileNotFoundError:
        pass
    # post-marker, the staged attempt has been moved (or its dest already
    # exists) — the tmp root holds nothing live
    shutil.rmtree(tmp_root, ignore_errors=True)


def compact_epochs(
    spark: SparkSession,
    sink_path: str,
    keep_last: int = 2,
    target_partitions: int = 8,
) -> str | None:
    """Fold settled epoch directories (and any previous consolidation) into
    ONE ``_epoch=compact-<hi>`` directory of ``target_partitions`` files.

    The newest ``keep_last`` numeric epochs are NEVER touched — only the
    final uncommitted epoch can be replayed after a crash, so anything
    older is immutable and safe to fold (``keep_last=2`` leaves a margin).
    Rows keep their embedded ``_epoch`` data column, so per-row provenance
    survives consolidation. Row multiset is preserved exactly; only the
    file layout changes. Single-writer maintenance, same assumption as the
    merge sink; crash-safe via ``_recover_compaction`` (marker protocol
    above — the staged directory holds every source row before any source
    is removed).

    Returns the consolidated directory name, or None if fewer than two
    sources are eligible. At 100 TB this is the job that keeps a year-old
    stream's file count O(compactions + recent epochs), not O(epochs ever
    committed) — the parquet stand-in for Iceberg ``rewrite_data_files``.
    """
    _recover_compaction(sink_path)
    if not os.path.isdir(sink_path):
        return None
    numeric, compacts = [], []
    for name in os.listdir(sink_path):
        if not name.startswith("_epoch="):
            continue
        val = name.split("=", 1)[1]
        if val.isdigit():
            numeric.append(int(val))
        elif val.startswith("compact-"):
            compacts.append(name)
    numeric.sort()
    fold = numeric[: max(0, len(numeric) - keep_last)]
    sources = [f"_epoch={n}" for n in fold] + sorted(compacts)
    if len(sources) < 2:
        return None
    dest_name = f"_epoch=compact-{fold[-1] if fold else '0'}"
    if dest_name in sources:  # nothing new since the last consolidation
        return None

    tmp_root = sink_path.rstrip("/") + ".compact.tmp"
    # single-writer maintenance: any tmp content here is a DEAD attempt's
    # (this is the only place tmp may be cleaned pre-marker — the read path
    # must never touch it, see _recover_compaction)
    shutil.rmtree(tmp_root, ignore_errors=True)
    # per-attempt staging dir, recorded in the marker: a reader recovering
    # a crashed compaction resolves exactly this attempt's staged rows
    import uuid as _uuid

    attempt = _uuid.uuid4().hex[:12]
    # no basePath: the source dirs are read as leaves, so the embedded
    # _epoch DATA column is the only _epoch — no partition-column twin
    df = spark.read.parquet(*[os.path.join(sink_path, s) for s in sources])
    staged = os.path.join(tmp_root, attempt, dest_name)
    df.coalesce(target_partitions).write.mode("overwrite").parquet(staged)

    # atomic marker commit: temp file + fsync + rename — a crash mid-write
    # can never leave a torn marker for readers to trip on
    marker = os.path.join(sink_path, _COMPACT_MARKER)
    marker_tmp = marker + ".tmp"
    with open(marker_tmp, "w") as f:
        json.dump({"remove": sources, "dest": dest_name, "attempt": attempt}, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(marker_tmp, marker)
    for name in sources:
        shutil.rmtree(os.path.join(sink_path, name), ignore_errors=True)
    try:
        os.rename(staged, os.path.join(sink_path, dest_name))
    except OSError:
        # a reader's _recover_compaction raced the post-marker tail and
        # finished the move — same end state, nothing lost
        if not os.path.isdir(os.path.join(sink_path, dest_name)):
            raise
    try:
        os.remove(marker)
    except FileNotFoundError:
        pass
    shutil.rmtree(tmp_root, ignore_errors=True)

    # keep the lineage audit map complete: the folded epochs' file records
    # now point at directories this consolidation replaced
    dest_dir = os.path.join(sink_path, dest_name)
    n_files = sum(
        1 for f in os.listdir(dest_dir) if f.endswith(".parquet")
    )
    import time as _time

    with open(os.path.join(sink_path, "_lineage.jsonl"), "a") as f:
        f.write(json.dumps({
            "compaction": dest_name,
            "folded": sources,
            "n_files": n_files,
            "ts": _time.time(),
        }) + "\n")
    return dest_name


def _recover_buckets(sink_path: str) -> None:
    """Roll the sink forward/back out of any interrupted bucket swap.

    ``write_merge`` promotes a bucket in atomic renames: stage ``.new``,
    rename live → ``.old``, rename ``.new`` → live, delete ``.old``. A hard
    crash can strand suffixed dirs; every crash window leaves a state this
    recovery resolves without losing the pre-epoch rows (the interrupted
    epoch then replays and re-merges idempotently):

    - live dir present → any ``.old``/``.new`` siblings are stale; delete.
    - live missing, ``.old`` present (crash between the two renames) →
      restore ``.old`` as live, delete ``.new``.
    - only ``.new`` (first write of a fresh bucket) → delete; the replayed
      epoch regenerates it.
    """
    if not os.path.isdir(sink_path):
        return
    names = set(os.listdir(sink_path))
    for name in sorted(names):
        for suffix in (".old", ".new"):
            if not (name.startswith("_bucket=") and name.endswith(suffix)):
                continue
            live = name[: -len(suffix)]
            path = os.path.join(sink_path, name)
            if live in names:
                shutil.rmtree(path, ignore_errors=True)
            elif suffix == ".old":
                os.rename(path, os.path.join(sink_path, live))
                names.add(live)
                stale_new = live + ".new"
                if stale_new in names:
                    shutil.rmtree(
                        os.path.join(sink_path, stale_new), ignore_errors=True
                    )
                    names.discard(stale_new)
            elif live + ".old" not in names:
                shutil.rmtree(path, ignore_errors=True)


def _promote_bucket(tmp: str, sink_path: str, bucket: int) -> None:
    """Crash-safe bucket swap: atomic sibling renames only, so the prior
    contents survive on disk until the new dir is fully in place (any
    interruption is undone by ``_recover_buckets`` on the next call)."""
    src = os.path.join(tmp, f"_bucket={bucket}")
    if not os.path.isdir(src):
        return
    dst = os.path.join(sink_path, f"_bucket={bucket}")
    staged, old = dst + ".new", dst + ".old"
    shutil.rmtree(staged, ignore_errors=True)
    os.rename(src, staged)
    if os.path.isdir(dst):
        shutil.rmtree(old, ignore_errors=True)
        os.rename(dst, old)
    os.rename(staged, dst)
    shutil.rmtree(old, ignore_errors=True)


def write_merge(df: DataFrame, epoch_id: int, sink_path: str) -> None:
    """Keyed upsert emulation over parquet (single-writer streaming only),
    partition-scoped: the sink is hash-bucketed by conv_id and an epoch
    reads + rewrites ONLY the buckets its batch touches — per-epoch cost is
    proportional to the touched slice, never the whole sink.

    Idempotent under W7 replay: re-running an epoch regenerates the same
    merged bucket contents (anti-join on the curated key replaces, never
    duplicates), and bucket promotion is crash-safe (atomic rename swap +
    ``_recover_buckets``: the live dir is never deleted before its
    replacement exists). Production: Iceberg ``MERGE INTO`` on the same key
    (``write_iceberg_merge``); this is the jar-free local stand-in.
    """
    spark = df.sparkSession
    _recover_buckets(sink_path)
    batch = df.dropDuplicates(CURATED_KEY + ["example_idx"]).withColumn(
        "_bucket", _bucket_col()
    )
    # persist: the touched-buckets collect and the merged write both
    # consume this frame — without it, the whole upstream micro-batch
    # (e.g. the stateful curation) would execute twice per epoch
    batch = batch.persist()
    touched = sorted(r[0] for r in batch.select("_bucket").distinct().collect())
    if not touched:
        batch.unpersist()
        return
    has_existing = os.path.isdir(sink_path) and any(
        d.startswith("_bucket=") for d in os.listdir(sink_path)
    )
    if has_existing:
        # partition pruning limits the scan to touched bucket dirs
        existing = spark.read.parquet(sink_path).where(
            F.col("_bucket").isin(touched)
        )
        keys = batch.select(*CURATED_KEY).distinct()
        keep = existing.join(keys, CURATED_KEY, "left_anti")
        merged = keep.unionByName(batch)
    else:
        merged = batch
    tmp = sink_path.rstrip("/") + ".tmp"
    try:
        merged.write.mode("overwrite").partitionBy("_bucket").parquet(tmp)
    finally:
        batch.unpersist()
    os.makedirs(sink_path, exist_ok=True)
    for b in touched:
        _promote_bucket(tmp, sink_path, b)
    shutil.rmtree(tmp, ignore_errors=True)


def read_merge_sink(spark: SparkSession, sink_path: str) -> DataFrame:
    _recover_buckets(sink_path)
    return spark.read.parquet(sink_path).drop("_bucket")


ICEBERG_MERGE_SQL = """
MERGE INTO {table} t
USING batch_updates s
ON t.conv_id = s.conv_id AND t.window_start = s.window_start
   AND t.example_idx = s.example_idx
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED THEN INSERT *
"""


def write_iceberg_merge(df: DataFrame, epoch_id: int, table: str) -> None:
    """Real Iceberg MERGE (requires iceberg-spark-runtime on classpath)."""
    spark = df.sparkSession
    if "org.apache.iceberg" not in spark.conf.get(
        "spark.sql.extensions", ""
    ):
        raise RuntimeError(
            "Iceberg extensions not configured; use sink_format='epoch' "
            "locally or add iceberg-spark-runtime to the cluster classpath"
        )
    df.createOrReplaceTempView("batch_updates")
    spark.sql(ICEBERG_MERGE_SQL.format(table=table))


SINKS = {
    "parquet-merge": write_merge,
    "epoch": write_epoch,
    "iceberg": write_iceberg_merge,
}


def sink_for(name: str):
    if name not in SINKS:
        raise KeyError(f"unknown sink format {name!r}; known: {sorted(SINKS)}")
    return SINKS[name]
