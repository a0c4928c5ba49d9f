"""kcore partition-sizing probe: stock vs shuffle.partitions preset
(kcore materializes inside its own gate; presetting the conf before
the call governs its whole execution).

Usage: AB_SF=... python tools/ab_kcore_parts.py [rounds] [parts]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_data_ingestion_spark.plans import registry
from etl_data_ingestion_spark.session import get_spark

SF = os.environ.get("AB_SF", "/root/testdata/sf0.1")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    parts = sys.argv[2] if len(sys.argv) > 2 else "8"
    registry.load_all()
    spark = get_spark()
    spark.range(4).write.mode("overwrite").format("noop").save()
    fn = registry.QUERIES["graph_kcore_peel"]
    key = "spark.sql.shuffle.partitions"
    base = spark.conf.get(key)
    res = {"stock": [], "parts": []}
    for i in range(rounds):
        for tag in ("stock", "parts"):
            spark.catalog.clearCache()
            if tag == "parts":
                spark.conf.set(key, parts)
            t0 = time.perf_counter()
            fn(spark, SF).write.mode("overwrite").format("noop").save()
            res[tag].append(time.perf_counter() - t0)
            spark.conf.set(key, base)
    for tag in ("stock", "parts"):
        print(f"{tag}: min={min(res[tag]):.2f} "
              f"all={[round(x, 2) for x in res[tag]]}")


if __name__ == "__main__":
    main()
