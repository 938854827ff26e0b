"""Dev harness: run every queries()/oracle_sql() pair side-by-side at a
given sf dir (default sf0.01) in one Spark session — mirrors the driver's
CORRECTNESS check. Usage: python scripts/check_oracle.py [sf_dir] [names...]

The compare core (`compare_one`, `run_sweep`) is importable: the per-round
pytest `tests/test_oracle_full.py` runs the FULL catalog through it and
commits the result as `ORACLE_FULL_r{N}.json`, so the queries rotated past
the external driver's 50-query window keep a machine-checked value signal
every round (round-4 verdict item #1).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ORACLE_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in ORACLE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_one(spark, con, sf_dir: str, name: str, builder, sql) -> dict:
    """Driver-shaped compare for one query: sorted-column, sorted-row,
    dtype-cast value equality. Returns a CORRECTNESS-row-shaped dict."""
    t0 = time.time()
    out = {
        "rows_match": False, "schema_match": False, "hash_match": False,
        "spark_rows": None, "oracle_rows": None, "err": None,
    }
    try:
        got = builder(spark, sf_dir).toPandas()
    except Exception as ex:  # noqa: BLE001 — report, don't crash the sweep
        out["err"] = f"spark error: {ex}"
        return out
    out["spark_rows"] = len(got)
    if sql is None:
        out["err"] = "no_oracle"
        out["secs"] = round(time.time() - t0, 1)
        return out
    try:
        want = con.execute(sql).fetchdf()
    except Exception as ex:  # noqa: BLE001
        out["err"] = f"duckdb error: {ex}"
        return out
    out["oracle_rows"] = len(want)
    out["rows_match"] = len(got) == len(want)
    if sorted(got.columns) != sorted(want.columns):
        out["err"] = (
            f"columns spark={sorted(got.columns)} duck={sorted(want.columns)}"
        )
        return out
    out["schema_match"] = True
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    try:
        w = want[cols].sort_values(cols).reset_index(drop=True).astype(
            g.dtypes.to_dict()
        )
    except Exception as ex:  # noqa: BLE001
        out["err"] = f"dtype cast: {ex}"
        return out
    if not out["rows_match"]:
        out["err"] = f"rows spark={len(g)} duck={len(w)}"
        return out
    if not g.equals(w):
        diff = (g != w) & ~(g.isna() & w.isna())
        bad_cols = [c for c in cols if diff[c].any()]
        out["err"] = (
            f"values differ in {bad_cols} ({int(diff.any(axis=1).sum())} rows)"
        )
        return out
    out["hash_match"] = True
    out["secs"] = round(time.time() - t0, 1)
    return out


def run_sweep(spark, sf_dir: str, only: set[str] | None = None) -> dict:
    """Run the whole registered catalog; returns {name: compare-row}."""
    import __spark_entry__ as e

    con = duck_connect(sf_dir)
    qs, osql = e.queries(), e.oracle_sql()
    results = {}
    for name, builder in qs.items():
        if only and name not in only:
            continue
        results[name] = compare_one(
            spark, con, sf_dir, name, builder, osql.get(name)
        )
    return results


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None

    from data_harvesting_spark.session import get_spark

    spark = get_spark("check-oracle", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("OFF")

    failed = []
    for name, r in run_sweep(spark, sf_dir, only).items():
        if r["err"] == "no_oracle":
            print(f"ok   {name}: rows-only n={r['spark_rows']} ({r.get('secs', 0)}s)")
        elif r["hash_match"]:
            print(f"ok   {name}: n={r['spark_rows']} match ({r.get('secs', 0)}s)")
        else:
            print(f"FAIL {name}: {r['err']}")
            failed.append(name)

    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
