"""Automated physical-plan audit over the FULL query catalog.

For every registered catalog query, compiles the executed plan at a
given sf dir (default sf0.01) and flags the three scale smells the
round verdicts audit by hand: CartesianProduct, BroadcastNestedLoopJoin,
and Exchange SinglePartition. Prints one JSON line per flagged query and
a final summary line; write the full result with --out.

A flag is NOT automatically a defect — the known-intended shapes are
1-row broadcast frames (scalar totals), scalar final aggregates, pinned
tiny offset sides, and declared all-pairs oracle baselines whose scale
variants ship alongside (see BENCH.md "plan audit" sections). The audit
exists so every NEW flag is a conscious decision, not an accident.

Usage: python scripts/plan_audit.py [sf_dir] [--out PLAN_AUDIT.json]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SMELLS = [
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "Exchange SinglePartition",
]


def audit(spark, sf_dir: str) -> dict:
    from data_harvesting_spark.plans import catalog

    out = {}
    for name, builder in catalog.spark_queries().items():
        try:
            df = builder(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            flags = {s: plan.count(s) for s in SMELLS if s in plan}
            out[name] = {
                "flags": flags,
                "n_exchanges": plan.count("Exchange hashpartitioning"),
            }
        except Exception as exc:  # noqa: BLE001 — audit must not abort
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    from data_harvesting_spark.session import get_spark

    spark = get_spark("plan-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    result = audit(spark, sf_dir)

    clean = [n for n, r in result.items() if not r.get("flags") and "error" not in r]
    flagged = {n: r for n, r in result.items() if r.get("flags")}
    errors = {n: r for n, r in result.items() if "error" in r}
    for n, r in flagged.items():
        print(json.dumps({"query": n, **r}))
    for n, r in errors.items():
        print(json.dumps({"query": n, **r}))
    print(
        json.dumps(
            {
                "total": len(result),
                "clean": len(clean),
                "flagged": len(flagged),
                "errors": len(errors),
            }
        )
    )
    if out_path:
        Path(out_path).write_text(json.dumps(result, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
