"""Dev harness: run every queries()/oracle_sql() pair side-by-side at a
given sf dir (default sf0.01) in one Spark session — mirrors the driver's
CORRECTNESS check. Usage: python scripts/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from data_harvesting_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark("check-oracle", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("OFF")

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = e.queries(), e.oracle_sql()
    failed = []
    for name, builder in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = builder(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in osql:
            print(f"ok   {name}: rows-only n={len(got)} ({time.time()-t0:.1f}s)")
            continue
        try:
            want = con.execute(osql[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns spark={sorted(got.columns)} duck={sorted(want.columns)}")
            failed.append(name)
            continue
        cols = sorted(got.columns)
        g = got[cols].sort_values(cols).reset_index(drop=True)
        try:
            w = want[cols].sort_values(cols).reset_index(drop=True).astype(g.dtypes.to_dict())
        except Exception as ex:
            print(f"FAIL {name}: dtype cast: {ex}")
            failed.append(name)
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} duck={len(w)}")
            failed.append(name)
            continue
        if not g.equals(w):
            diff = (g != w) & ~(g.isna() & w.isna())
            bad_cols = [c for c in cols if diff[c].any()]
            print(f"FAIL {name}: values differ in {bad_cols} "
                  f"({int(diff.any(axis=1).sum())} rows)")
            i = diff.any(axis=1).idxmax()
            print("  spark:", g.loc[i].to_dict())
            print("  duck :", w.loc[i].to_dict())
            failed.append(name)
            continue
        print(f"ok   {name}: n={len(g)} match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
