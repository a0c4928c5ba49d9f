"""Save full `.explain("formatted")` output per query to plans/r14/.

The round-14 optimization deliverable: for each touched query, commit
the physical plan BEFORE and AFTER the change so plan-shape claims
("2 Exchange -> 1", "SortMergeJoin -> BroadcastHashJoin") are
checkable without running Spark.

Usage: python tools/explain_save.py <suffix> <query> [query ...]
       (suffix is 'before' or 'after'; sf dir from $SPARK_GRAFT_SF_DIR,
        default /root/testdata/sf0.1)
Writes /root/repo/plans/r14/<query>_<suffix>.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_data_ingestion_spark.plans import registry
    from etl_data_ingestion_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="explain_save")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = "/root/repo/plans/r14"
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} ({suffix}) sf_dir={sf_dir}\n")
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
