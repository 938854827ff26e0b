"""The shared per-session curate kernel — ONE implementation used by BOTH
runners (mirrors the reference's E1/E2 split, SURVEY §3):

- batch:     groupBy(conv_id, session_id).applyInPandas(kernel)
- streaming: applyInPandasWithState buffers a session, emits kernel(buffer)
             when the watermark closes it

Byte-for-byte batch/stream parity is therefore by construction (north_star
requirement), not by coincidence of two implementations.

The kernel itself is pandas-vectorized: dedup via hash `duplicated()`,
as-of call↔response pairing via `merge_asof(by=tool)`, first-response-wins
via `drop_duplicates`, cap via `head()`. Only the suppression>0 path is a
bounded greedy loop (inherently sequential — reference
`services/harvest_service.py:207-231`), bounded by the emission cap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from data_harvesting_spark.config import HarvestConfig

# kernel input columns (text_hash precomputed JVM-side with xxhash64)
KERNEL_INPUT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "text_hash"]

# kernel output columns
KERNEL_OUTPUT_COLS = [
    "conv_id", "window_start", "example_idx", "call_turn_idx",
    "response_turn_idx", "tool", "call_text", "response_text", "text_hash",
]

_EMPTY = pd.DataFrame(
    {
        "conv_id": pd.Series(dtype="object"),
        "window_start": pd.Series(dtype="datetime64[us]"),
        "example_idx": pd.Series(dtype="int32"),
        "call_turn_idx": pd.Series(dtype="int32"),
        "response_turn_idx": pd.Series(dtype="int32"),
        "tool": pd.Series(dtype="object"),
        "call_text": pd.Series(dtype="object"),
        "response_text": pd.Series(dtype="object"),
        "text_hash": pd.Series(dtype="int64"),
    }
)


def curate_session(pdf: pd.DataFrame, cfg: HarvestConfig) -> pd.DataFrame:
    """Curate ONE session's turns → curated call/response pairs.

    Expects columns KERNEL_INPUT_COLS; any extra columns are ignored.
    Semantics (identical to operators/curate.py's declarative pipeline,
    scoped to the session):
      1. stable order (turn_idx)
      2. dedup turns by text_hash, keep first
      3. response pairs with most recent preceding call of same tool
      4. first response per call wins
      5. both texts non-empty
      6. optional suppression sweep, then emission cap, stable numbering
    """
    if len(pdf) == 0:
        return _EMPTY.copy()
    pdf = pdf.sort_values("turn_idx", kind="mergesort")
    window_start = pdf["ts"].min()
    conv_id = pdf["conv_id"].iloc[0]

    # 2. dedup (NaN hashes — null text — group together, matching SQL
    # PARTITION BY null-grouping semantics)
    pdf = pdf[~pdf["text_hash"].duplicated(keep="first")]

    is_call = (pdf["role"] == cfg.call_role) & pdf["tool"].notna()
    is_resp = (pdf["role"] == cfg.response_role) & pdf["tool"].notna()
    calls = pdf[is_call]
    resps = pdf[is_resp]
    if len(calls) == 0 or len(resps) == 0:
        return _EMPTY.copy()

    # 3. as-of: most recent preceding call of same tool
    merged = pd.merge_asof(
        resps[["turn_idx", "tool", "text", "text_hash"]].rename(
            columns={"turn_idx": "response_turn_idx", "text": "response_text"}
        ).sort_values("response_turn_idx").assign(
            _on=lambda d: d["response_turn_idx"].astype("int64")
        ),
        calls[["turn_idx", "tool", "text"]].rename(
            columns={"turn_idx": "call_turn_idx", "text": "call_text"}
        ).sort_values("call_turn_idx").assign(
            _on=lambda d: d["call_turn_idx"].astype("int64")
        ),
        on="_on",
        by="tool",
        direction="backward",
        allow_exact_matches=False,
    ).drop(columns="_on")
    merged = merged[merged["call_turn_idx"].notna()]
    if len(merged) == 0:
        return _EMPTY.copy()

    # 4. first response per call
    merged = merged.sort_values("response_turn_idx", kind="mergesort")
    merged = merged.drop_duplicates(subset=["call_turn_idx"], keep="first")

    # 5. condition: both sides non-empty
    ok = (
        merged["call_text"].notna()
        & (merged["call_text"].str.strip().str.len() > 0)
        & merged["response_text"].notna()
        & (merged["response_text"].str.strip().str.len() > 0)
    )
    merged = merged[ok]

    # order by call for numbering/cap (matches curate.py window order)
    merged = merged.sort_values(
        ["call_turn_idx", "response_turn_idx"], kind="mergesort"
    )

    # 6a. suppression sweep (response-turn spacing), bounded by cap
    if cfg.suppress_turns_after_emit > 0:
        keep_rows = []
        suppress_until = -1
        for row in merged.itertuples(index=True):
            if row.response_turn_idx <= suppress_until:
                continue
            keep_rows.append(row.Index)
            suppress_until = row.response_turn_idx + cfg.suppress_turns_after_emit
            if cfg.max_pairs_per_conv and len(keep_rows) >= cfg.max_pairs_per_conv:
                break
        merged = merged.loc[keep_rows]
    elif cfg.max_pairs_per_conv:
        merged = merged.head(cfg.max_pairs_per_conv)

    if cfg.min_pairs_per_conv > 1 and len(merged) < cfg.min_pairs_per_conv:
        return _EMPTY.copy()

    n = len(merged)
    return pd.DataFrame(
        {
            "conv_id": np.repeat(conv_id, n),
            "window_start": np.repeat(window_start, n),
            "example_idx": np.arange(n, dtype="int32"),
            "call_turn_idx": merged["call_turn_idx"].astype("int32").to_numpy(),
            "response_turn_idx": merged["response_turn_idx"].astype("int32").to_numpy(),
            "tool": merged["tool"].to_numpy(),
            "call_text": merged["call_text"].to_numpy(),
            "response_text": merged["response_text"].to_numpy(),
            "text_hash": merged["text_hash"].astype("int64").to_numpy(),
        }
    )


def split_sessions(pdf: pd.DataFrame, gap_seconds: float) -> list[pd.DataFrame]:
    """Split one conversation's turns into gap-bounded sessions by event
    time (sorted by ts, ties by turn_idx)."""
    if len(pdf) == 0:
        return []
    pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
    ts = pdf["ts"].to_numpy()
    gaps = np.diff(ts) > np.timedelta64(int(gap_seconds * 1_000_000), "us")
    session_ids = np.concatenate([[0], np.cumsum(gaps)])
    return [pdf[session_ids == s] for s in range(session_ids[-1] + 1)]
