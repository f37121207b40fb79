"""Plan-shape audit over every declared query (guide §1/§7.2).

Builds each ``MAPS_QUERIES`` entry at sf0.01 and scans its formatted
physical plan for optimization smells:

- ``BatchEvalPython`` (row-at-a-time Python UDF in a batch path)
- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` (accidental
  cross-products)
- expression lines > 4 KB (codegen-method blowup risk)
- ``SortMergeJoin`` count (for manual review of join strategy)
- Exchange count, scan count without PushedFilters

Usage: python tools/plan_audit.py [out.json] [query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_audit.json"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.01")
    from maps_spark.plans.queries import MAPS_QUERIES
    from maps_spark.session import get_spark
    spark = get_spark("plan-audit", cpus=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution \
        .ExplainMode.fromString("formatted")
    report: dict[str, dict] = {}
    for name, fn in MAPS_QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001 - audit must not stop
            report[name] = {"error": str(e)[:200]}
            continue
        lines = plan.split("\n")
        report[name] = {
            "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
            "smj": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
            "bhj": len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)),
            "batch_eval_python": plan.count("BatchEvalPython"),
            "arrow_eval_python": plan.count("ArrowEvalPython"),
            "map_in_arrow": plan.count("MapInArrow")
            + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas"),
            "cartesian": plan.count("CartesianProduct"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "longest_expr_line": max(len(l) for l in lines),
            "regexp_refs": plan.count("regexp_"),
            "scans": plan.count("Scan parquet"),
            "scans_no_pushdown": len(re.findall(
                r"PushedFilters: \[\]", plan)),
        }
        sys.stderr.write(f"{name} ok\n")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"wrote {out_path} ({len(report)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
