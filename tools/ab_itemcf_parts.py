"""item_cf variant probe: does shrinking shuffle partitions inside the
AQE gate (32 -> 8) cut the pair-Exchange overhead? In-session
interleaved min-of-N: stock item_cf vs a partitions-override arm
(conf flipped around the call — safe because item_cf materializes
its result eagerly inside its own gate, so the restored conf never
governs execution).

Usage: python tools/ab_itemcf_parts.py [rounds] [parts]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from etl_data_ingestion_spark.plans import registry
from etl_data_ingestion_spark.session import get_spark

SF = __import__("os").environ.get("AB_SF", "/root/testdata/sf0.1")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    parts = sys.argv[2] if len(sys.argv) > 2 else "8"
    registry.load_all()
    spark = get_spark()
    spark.range(4).write.mode("overwrite").format("noop").save()
    fn = registry.QUERIES["ml_item_item_cf"]
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
            if tag == "parts":
                spark.conf.set(key, base)
    for tag in ("stock", "parts"):
        print(f"{tag}: min={min(res[tag]):.2f} "
              f"all={[round(x, 2) for x in res[tag]]}")


if __name__ == "__main__":
    main()
