"""Zero-row fixture generator for the empty-corpus robustness sweep.

The r13 advisor caught a real empty-relation bug (threshold-curve
aggregates returning NULL where the oracle emits 0 once the scored
pair relation is empty). That class — F.sum/F.avg over zero rows,
head-of-empty, seq(1, size-1) on nothing, division by a zero count —
only fires when a whole intermediate relation is empty, which no
driver fixture exercises. This writes a fixture dir where EVERY base
table is 0 rows with the exact parquet schema of the shipped
sf0.001 fixtures, so every registered query and oracle can run on it
unchanged via tools/check_parity.py.

Usage: python tools/gen_empty.py [OUT_DIR]   (default .scaledata/sf_empty)
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_data_ingestion_spark.catalog import TABLES, table_path  # noqa: E402

SRC = "/root/testdata/sf0.001"


def main() -> None:
    out_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, ".scaledata/sf_empty")
    )
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = table_path(SRC, t)
        schema = pq.read_schema(src)
        dst = table_path(out_dir, t)
        pq.write_table(schema.empty_table(), dst)
        print(f"{t}: 0 rows, {len(schema)} cols -> {dst}")


if __name__ == "__main__":
    main()
