"""Dump ``.explain('formatted')`` for named declared queries to files.

Usage::

    python tools/explain_query.py OUT_DIR SUFFIX q1 q2 ...

writes ``OUT_DIR/<query>_<SUFFIX>.txt`` for each named query, built at
``$SPARK_GRAFT_SF_DIR`` (default sf0.01 — the plan shape, not the data,
is what is captured).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.01")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    from maps_spark.plans.queries import MAPS_QUERIES
    from maps_spark.session import get_spark
    spark = get_spark("explain", cpus=cpus,
                      shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = MAPS_QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
