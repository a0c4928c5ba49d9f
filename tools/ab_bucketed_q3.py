"""A/B: tpch_q3 on stock parquet scans (SHJ plan) vs the opt-in
bucketed-storage tier (lineitem/orders bucketed+sorted on orderkey,
capacity-model item 2). The bucket WRITE is untimed — it is the
pay-once-at-write-time cost the tier amortizes; rerun cost here is
the steady-state query.

Usage: python tools/ab_bucketed_q3.py [sf_dir] [n_buckets]
Prints per-variant best-of-3 (interleaved) and the Exchange count of
each physical plan.
"""

from __future__ import annotations

import contextlib
import io
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_data_ingestion_spark.catalog import (
    disable_bucketed_facts,
    enable_bucketed_facts,
)
from etl_data_ingestion_spark.plans import registry
from etl_data_ingestion_spark.session import get_spark


def n_exchanges(df) -> int:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().count("Exchange")


def time_query(spark, fn, sf_dir) -> float:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf1"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    registry.load_all()
    spark = get_spark(app_name="ab_bucketed_q3")
    spark.sparkContext.setLogLevel("ERROR")
    q3 = registry.QUERIES["tpch_q3_shipping_priority"]

    # warm JVM/codegen once, untimed
    time_query(spark, q3, sf_dir)
    print("stock plan exchanges:", n_exchanges(q3(spark, sf_dir)))

    # untimed one-time bucket write
    t0 = time.perf_counter()
    tables = enable_bucketed_facts(spark, sf_dir, n_buckets)
    print(f"bucket write ({tables}): {time.perf_counter() - t0:.1f}s [untimed]")
    time_query(spark, q3, sf_dir)  # warm bucketed path, untimed
    print("bucketed plan exchanges:", n_exchanges(q3(spark, sf_dir)))
    disable_bucketed_facts(spark)

    samples: dict[str, list[float]] = {"stock": [], "bucketed": []}
    for _pass in range(3):
        disable_bucketed_facts(spark)
        samples["stock"].append(time_query(spark, q3, sf_dir))
        enable_bucketed_facts(spark, sf_dir, n_buckets)
        samples["bucketed"].append(time_query(spark, q3, sf_dir))
    disable_bucketed_facts(spark)
    for k, v in samples.items():
        print(
            f"{k:9s} min={min(v):.3f}s samples={[round(x, 3) for x in v]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
