"""Probabilistic sketch operators with engine-portable determinism.

Count-min sketch (Cormode & Muthukrishnan 2005) re-expressed as plain
DataFrame aggregation: every sketch cell is a ``(row, col)`` group key,
so building the sketch is ONE hash aggregate whose map-side combine
collapses each partition to at most ``depth × width`` cells before the
shuffle — the sketch, not the data, crosses the wire. Estimates are the
classic min-over-rows probe and NEVER underestimate (one-sided error,
like the Bloom gate in quality.py).

Hash positions are the first 60 md5 bits of ``term || '#' || row`` mod
``width`` — the same per-row expression DuckDB evaluates, so the oracle
reproduces the exact sketch and every estimate matches bit-for-bit
(collisions included; they are deterministic).

Reference parity: the reference keeps exact per-class tallies in a
single process (`/root/reference/services/harvest_service.py:198-232`);
at 100 TB exact per-term tallies ARE the sketch's job — fixed memory,
mergeable across executors and across streaming epochs (cell-wise sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_harvesting_spark.functions.text import normalize_text


def _pos(term, row: int, width: int):
    """Portable md5 cell column for sketch row ``row``."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(term, F.lit(f"#{row}"))), 1, 15),
            16,
            10,
        ).cast("bigint"),
        F.lit(width),
    )


def cms_build(words: DataFrame, *, depth: int = 4, width: int = 8192) -> DataFrame:
    """Build a count-min sketch over a one-column ``term`` DataFrame
    (one row per occurrence). Returns ``(row, col, cnt)`` — at most
    ``depth × width`` rows total, regardless of input size.

    One explode (×depth) rides the scan; the groupBy's partial
    aggregation bounds what each task emits at ``depth × width`` cells,
    so shuffle volume is O(sketch), not O(data).
    """
    cells = words.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _pos(F.col("term"), j, width).alias("col"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell")
    ).select("cell.row", "cell.col")
    return cells.groupBy("row", "col").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame, terms: DataFrame, *, depth: int = 4, width: int = 8192
) -> DataFrame:
    """Probe the sketch for each row of ``terms`` (column ``term``):
    estimate = min over the ``depth`` cells the term hashes to. The
    sketch side is tiny (≤ depth × width rows) and broadcasts; the probe
    is a broadcast join + one term aggregate."""
    probes = terms.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _pos(F.col("term"), j, width).alias("col"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("term", "cell.row", "cell.col")
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("cms_cnt"))
    )


def cms_top_terms(
    docs: DataFrame, *, k: int = 50, depth: int = 4, width: int = 8192
) -> DataFrame:
    """Heavy-hitter report: exact top-``k`` words by frequency with the
    count-min estimate alongside — ``cms_cnt >= exact_cnt`` always (CMS
    is one-sided). Ties on count break by term for a deterministic
    top-k. At 100 TB the exact pass is what you replace: the sketch is
    built in one bounded-shuffle aggregate and probed for a candidate
    set from any cheap source; here the exact counts double as both the
    candidates and the verification column."""
    words = docs.select(
        F.explode(
            F.filter(
                F.split(normalize_text("text"), " "), lambda x: x != ""
            )
        ).alias("term")
    )
    exact = words.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_cnt")
    )
    top = exact.orderBy(F.desc("exact_cnt"), "term").limit(k)
    sketch = cms_build(words, depth=depth, width=width)
    est = cms_estimate(sketch, top.select("term"), depth=depth, width=width)
    return top.join(est, "term").select(
        "term",
        "exact_cnt",
        "cms_cnt",
        (F.col("cms_cnt") >= F.col("exact_cnt")).alias("one_sided_ok"),
    )


# HyperLogLog constants (Flajolet et al. 2007), m = 1024 registers.
# The bias constant and the full numerator alpha*m^2*2^51 are baked as
# Python-float literals so Spark and DuckDB parse the SAME double and
# the one final division is bit-identical cross-engine.
HLL_M = 1024
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
HLL_NUMERATOR = _HLL_ALPHA * HLL_M * HLL_M * float(1 << 51)


def hll_distinct(items: DataFrame) -> DataFrame:
    """HyperLogLog distinct-count over a one-column ``term`` DataFrame —
    duplicates welcome, that is the point. Engine-portable determinism:
    the 60-bit md5 hash splits into a 10-bit register index and a 50-bit
    suffix whose leading-zero rank comes from integer ``length(bin(x))``
    (floor(log2)+1 — exact in both engines, no floating log); the
    harmonic sum is kept as an exact int64 ``sum(2^(51-M_j))`` (scaled
    by 2^51, max 2^61 — no FP accumulation), so the estimate is ONE
    deterministic double division at the end.

    Scale posture: one 1024-group hash aggregate (map-side combine means
    each task ships at most 1024 (bucket, max-rho) rows — O(registers),
    not O(data)) and registers merge by MAX, so the sketch composes
    across executors and streaming epochs exactly like ``cms_build``.
    The exact countDistinct runs alongside as the verification column —
    at 100 TB it is the column you drop.

    Raw-range estimator only (no small-range linear counting — that
    needs ln(), which IEEE does not pin cross-engine); callers stay in
    the raw range by sizing m below n/2.5.
    """
    sums = hll_summary(hll_registers(items))
    exact = items.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.countDistinct("term").cast("bigint").alias("exact_distinct"),
    )
    return sums.crossJoin(exact).select(
        F.lit(HLL_M).alias("hll_m"),
        "registers_used",
        "s_scaled",
        F.round(F.lit(HLL_NUMERATOR) / F.col("s_scaled"), 2).alias(
            "hll_estimate"
        ),
        "n_items",
        "exact_distinct",
        F.round(
            F.abs(
                F.lit(HLL_NUMERATOR) / F.col("s_scaled")
                - F.col("exact_distinct")
            )
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err"),
    )


def hll_registers(items: DataFrame) -> DataFrame:
    """The HLL state itself: ``(bucket, m_j)`` max-rho registers for a
    one-column ``term`` DataFrame. Registers from different splits (or
    streaming epochs) merge by ``groupBy(bucket).max(m_j)``."""
    h = F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10).cast(
        "bigint"
    )
    hashed = items.select(
        h.bitwiseAND(F.lit(HLL_M - 1)).alias("bucket"),
        F.shiftright(h, 10).alias("rem"),
    ).select(
        "bucket",
        F.when(F.col("rem") == 0, F.lit(51))
        .otherwise(F.lit(51) - F.length(F.bin("rem")))
        .cast("int")
        .alias("rho"),
    )
    return hashed.groupBy("bucket").agg(F.max("rho").alias("m_j"))


def hll_summary(regs: DataFrame) -> DataFrame:
    """Collapse a register table to ``(registers_used, s_scaled)`` — the
    exact-integer harmonic sum the estimate divides into."""
    return regs.agg(
        F.count(F.lit(1)).cast("bigint").alias("registers_used"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 51 - m_j)"))
        .cast("bigint")
        .alias("s_present"),
    ).select(
        "registers_used",
        (
            F.col("s_present")
            + (F.lit(HLL_M) - F.col("registers_used"))
            * F.lit(1 << 51).cast("bigint")
        ).alias("s_scaled"),
    )


def bottomk_sample(items: DataFrame, k: int = 64) -> DataFrame:
    """Min-wise (bottom-k) sample: the ``k`` distinct terms with the
    smallest portable md5 hash — a uniform-without-replacement sample of
    the distinct-term set that is MERGEABLE (bottom-k of a union equals
    bottom-k of the concatenated per-split bottom-k's), deterministic,
    and replay-stable. The third classic mergeable sketch beside
    ``cms_build`` (frequency) and ``hll_registers`` (cardinality); the
    same hash doubles as an inclusion-probability estimator (the k-th
    smallest hash estimates distinct count, cross-checked against HLL).

    Scale posture: distinct is one hash aggregate (map-side combine);
    the bottom-k itself is ``TakeOrdered`` — a per-partition heap + a
    k-row driver merge, never a global sort.
    """
    h = F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10).cast(
        "bigint"
    )
    return (
        items.select("term")
        .distinct()
        .select("term", h.alias("h"))
        .orderBy("h", "term")
        .limit(k)
    )


_HLL_ALPHAS = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_alpha(m: int) -> float:
    """Standard HLL bias-correction constant (Flajolet et al. 2007)."""
    return _HLL_ALPHAS.get(m, 0.7213 / (1 + 1.079 / m))


def hll_numerator(bits: int) -> float:
    """alpha_m * m^2 scaled by the integer harmonic-sum scale 2^(61-bits)
    — one double literal, injected verbatim into Spark and the oracle."""
    m = 1 << bits
    return hll_alpha(m) * m * m * float(1 << (61 - bits))


def hll_rho_projection(
    items: DataFrame, keep: list[str], *, bits: int = 10
) -> DataFrame:
    """Per-row (bucket, rho) projection of a ``term`` column — the
    stateless half of the grouped HLL build, shared by the batch
    ``hll_registers_grouped`` and the streaming windowed register agg
    (same 60-bit md5 split, same exact integer rank)."""
    m = 1 << bits
    shift = 61 - bits
    h = F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10).cast(
        "bigint"
    )
    return items.select(
        *keep,
        h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
        F.shiftright(h, bits).alias("rem"),
    ).select(
        *keep,
        "bucket",
        F.when(F.col("rem") == 0, F.lit(shift))
        .otherwise(F.lit(shift) - F.length(F.bin("rem")))
        .cast("int")
        .alias("rho"),
    )


def hll_registers_grouped(
    items: DataFrame, keys: list[str], *, bits: int = 10
) -> DataFrame:
    """Per-group HLL registers over a ``term`` column: ``keys + (bucket,
    m_j)``. The generalization of ``hll_registers`` that makes the
    sketch's MERGE law usable as a windowing primitive: registers for
    any union of groups are the bucket-wise MAX of the groups' registers,
    so per-day sketches roll into per-week windows without touching raw
    rows again. Same 60-bit md5 split; ``bits`` register-index bits keep
    the exact-integer harmonic sum bounded at m * 2^(61-bits) = 2^61."""
    hashed = hll_rho_projection(items, keys, bits=bits)
    return hashed.groupBy(*keys, "bucket").agg(F.max("rho").alias("m_j"))


def hll_estimate_grouped(
    regs: DataFrame, keys: list[str], *, bits: int = 10
) -> DataFrame:
    """Collapse grouped registers to per-group raw-range estimates —
    exact-int harmonic sums, ONE double division per group at the end
    (the same determinism contract as ``hll_summary``)."""
    m = 1 << bits
    shift = 61 - bits
    num = hll_numerator(bits)
    return (
        regs.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("registers_used"),
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {shift} - m_j)"))
            .cast("bigint")
            .alias("s_present"),
        )
        .select(
            *keys,
            "registers_used",
            (
                F.col("s_present")
                + (F.lit(m) - F.col("registers_used"))
                * F.lit(1 << shift).cast("bigint")
            ).alias("s_scaled"),
        )
        .select(
            *keys,
            "registers_used",
            "s_scaled",
            F.round(F.lit(num) / F.col("s_scaled"), 2).alias("hll_estimate"),
        )
    )


def log2_histogram_grouped(
    values: DataFrame, keys: list[str]
) -> DataFrame:
    """Mergeable quantile sketch #4 beside CMS (frequency), HLL
    (cardinality) and bottom-k (sampling): a log2-bucket histogram over a
    non-negative int64 ``v`` column. Bucket = bit-length of v (exact
    integer ``length(bin(v))`` — floor(log2)+1, the same no-floating-log
    trick as HLL's rho), bucket 0 reserved for v = 0. Counts merge by
    SUM across any partitioning of the input — per-day histograms roll
    into windows/corpus totals without re-touching raw rows.

    Scale posture: ONE hash aggregate whose map-side combine caps each
    task's output at keys × ~64 buckets — O(sketch), not O(data)."""
    b = (
        F.when(F.col("v") <= 0, F.lit(0))
        .otherwise(F.length(F.bin("v")))
        .cast("int")
    )
    return (
        values.select(*keys, b.alias("bucket"))
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame, keys: list[str], qs: list[float]
) -> DataFrame:
    """Per-group quantile estimates from a log2-bucket histogram:
    nearest-rank target r = ceil(q*n) (FP-safe epsilon), located in the
    first bucket whose running count reaches r, linearly interpolated
    inside the bucket's exact integer span [2^(b-1), 2^b - 1]. Integer
    arithmetic end-to-end, ONE double division per (group, q) — the same
    determinism contract as the HLL estimate, so a SQL oracle reproduces
    every estimate bit-for-bit."""
    from pyspark.sql import Window

    totals = hist.groupBy(*keys).agg(F.sum("cnt").alias("n"))
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy(*keys).orderBy("bucket")
        ),
    )
    # quantile fan-out is an in-row explode of a constant array — no
    # dim join, no BNLJ; the totals join broadcasts O(groups) rows.
    j = (
        cum.join(F.broadcast(totals), keys)
        .withColumn(
            "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
        )
        .withColumn(
            "r", F.ceil(F.col("q") * F.col("n") - F.lit(1e-9)).cast("bigint")
        )
        .where(
            (F.col("cum") >= F.col("r"))
            & (F.col("cum") - F.col("cnt") < F.col("r"))
        )
    )
    lo = F.when(
        F.col("bucket") == 0, F.lit(0).cast("bigint")
    ).otherwise(F.expr("shiftleft(CAST(1 AS BIGINT), bucket - 1)"))
    hi = F.when(
        F.col("bucket") == 0, F.lit(0).cast("bigint")
    ).otherwise(F.expr("shiftleft(CAST(1 AS BIGINT), bucket) - 1"))
    p = F.col("r") - (F.col("cum") - F.col("cnt"))
    return j.select(
        *keys,
        "q",
        "n",
        F.round(
            lo + ((hi - lo) * p) / F.col("cnt"), 4
        ).alias("est"),
    )
