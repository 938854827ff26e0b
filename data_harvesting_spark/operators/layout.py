"""Physical-layout operators: Z-order (Morton) clustering for
multi-dimensional data skipping.

A table sorted on ONE column prunes file/row-group min-max stats
perfectly for that column and not at all for any other; interleaving
the bits of two (or more) dimension keys into one Morton key makes
rows that are close in EITHER dimension land close in the sort order,
so min/max pruning works on BOTH — the layout trick behind
Delta/Iceberg `OPTIMIZE ZORDER BY` and classic UB-tree indexing
(Morton 1966; Bayer 1997). At 100 TB this is the difference between a
time-range query scanning every user-sorted file and scanning ~sqrt of
them.

Everything here is exact integer bit arithmetic (shift/and/or), a
per-row whole-stage-codegen expression with an identical SQL spelling
in DuckDB — no UDF, no floating point, oracle-checkable bit-for-bit.

Reference parity: the reference writes media under vault paths keyed
by time alone (`/root/reference/queue_harvesting.py:84-104`); Z-order
is the layout that ALSO serves the per-camera/per-user access path
from the same files.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ZORDER_BITS = 16


def zorder_key(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton key: interleave the low ``bits`` bits of two non-negative
    int columns (x in even positions, y in odd). 2*bits OR-terms of
    shift/and — pure codegen, no shuffle, rides the scan."""
    out = None
    for i in range(bits):
        xt = F.shiftleft(
            F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i
        )
        yt = F.shiftleft(
            F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        out = xt.bitwiseOR(yt) if out is None else out.bitwiseOR(xt).bitwiseOR(yt)
    return out


def zorder_key_sql(x: str, y: str, bits: int = ZORDER_BITS) -> str:
    """The identical Morton expression as ANSI/DuckDB SQL text."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def blocks_hit(df, order_col: str, pred, block_rows: int = 256):
    """Data-skipping meter for layout comparisons (test/diagnostic):
    sort by ``order_col``, cut into ``block_rows``-row blocks (the
    row-group stand-in), and count how many blocks contain at least one
    row matching ``pred`` — the blocks a min-max-pruning reader must
    fetch. The global row_number is a deliberate single-partition stage:
    this is a measurement harness over test-scale data, not a production
    path (production assigns blocks with a range partitioner)."""
    from pyspark.sql import Window

    rn = F.row_number().over(Window.orderBy(order_col, F.monotonically_increasing_id()))
    blocks = df.withColumn("_blk", ((rn - 1) / F.lit(block_rows)).cast("bigint"))
    return (
        blocks.where(pred).select("_blk").distinct().count(),
        blocks.select("_blk").distinct().count(),
    )
