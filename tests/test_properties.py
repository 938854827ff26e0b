"""Property-based tests (hypothesis) for the sequential kernels — the
operators whose correctness is NOT pinned by a SQL oracle because they are
genuinely imperative: the P9/P10 sweep and gap sessionization. Each is
checked against an obviously-correct brute-force reference over randomized
inputs, including carried-cursor starts (the streaming ledger/state path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from data_harvesting_spark.operators.cap import _sweep_group
from data_harvesting_spark.operators.kernel import session_id_array


def _brute_sweep(indexes, max_emit, suppress, emitted0=0, sup0=-1):
    kept = []
    emitted, until = emitted0, sup0
    for idx in sorted(indexes):
        if idx <= until:
            continue
        if max_emit and emitted >= max_emit:
            break
        kept.append(idx)
        emitted += 1
        if suppress:
            until = idx + suppress
    return kept


@settings(max_examples=300, deadline=None)
@given(
    idxs=st.lists(st.integers(0, 80), min_size=0, max_size=40, unique=True),
    max_emit=st.integers(0, 10),
    suppress=st.integers(0, 10),
    emitted0=st.integers(0, 12),
    sup0=st.integers(-1, 90),
)
def test_sweep_group_matches_bruteforce(idxs, max_emit, suppress, emitted0, sup0):
    pdf = pd.DataFrame({"turn_idx": idxs})
    pdf["_emitted0"] = emitted0
    pdf["_sup0"] = sup0
    got = _sweep_group(pdf, "turn_idx", max_emit, suppress)["turn_idx"].tolist()
    want = _brute_sweep(idxs, max_emit, suppress, emitted0, sup0)
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    ts_offsets=st.lists(st.integers(0, 50_000), min_size=1, max_size=40),
    gap_s=st.integers(1, 5_000),
)
def test_session_id_array_matches_bruteforce(ts_offsets, gap_s):
    base = pd.Timestamp("2026-01-01")
    pdf = pd.DataFrame(
        {
            "ts": [base + pd.Timedelta(seconds=o) for o in ts_offsets],
            "turn_idx": np.arange(len(ts_offsets), dtype="int32"),
        }
    )
    out, sids = session_id_array(pdf, float(gap_s))
    # brute force: strict > split on the sorted event times (JVM
    # session_window merges touching windows — see operators/kernel.py)
    ts_sorted = sorted(ts_offsets)
    want = [0]
    for prev, cur in zip(ts_sorted, ts_sorted[1:]):
        want.append(want[-1] + (1 if (cur - prev) > gap_s else 0))
    assert sids.tolist() == want
    # ids are non-decreasing and the frame is time-ordered
    assert (np.diff(sids) >= 0).all()
    assert out["ts"].is_monotonic_increasing
