"""Variant decomposition for the r12 tail rewrites: same working-tree
plans, gate ON vs gate OFF (small_fact_aqe_gate monkeypatched to a
no-op in the OFF arm). Fresh process per arm per round, interleaved.

Usage: python tools/ab_gate_toggle.py [sf_dir] [rounds] [query ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, os, json, contextlib
sys.path.insert(0, sys.argv[1])
if os.environ.get("AB_NOGATE") == "1":
    from etl_data_ingestion_spark import catalog
    @contextlib.contextmanager
    def _nogate(spark, sf_dir, table="lineitem", threshold=0):
        yield False
    catalog.small_fact_aqe_gate = _nogate
import bench
from etl_data_ingestion_spark.plans import registry
from etl_data_ingestion_spark.session import get_spark
registry.load_all()
spark = get_spark()
spark.range(4).write.mode("overwrite").format("noop").save()
out = {}
for name in sys.argv[3:]:
    out[name] = bench.run_query(spark, name, sys.argv[2])
print("RESULT " + json.dumps(out))
"""


def run_arm(nogate: bool, sf_dir: str, names: list[str]) -> dict[str, float]:
    env = dict(os.environ, AB_NOGATE="1" if nogate else "0")
    p = subprocess.run(
        [sys.executable, "-c", CHILD, HERE, sf_dir, *names],
        capture_output=True, text=True, cwd=HERE, env=env,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT: {p.stderr[-2000:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    names = sys.argv[3:]
    on: dict[str, list[float]] = {n: [] for n in names}
    off: dict[str, list[float]] = {n: [] for n in names}
    for i in range(rounds):
        for nogate, acc, tag in ((False, on, "gate"), (True, off, "nogate")):
            res = run_arm(nogate, sf_dir, names)
            for n, t in res.items():
                acc[n].append(t)
            print(f"round {i} {tag}: "
                  + " ".join(f"{n}={t:.2f}" for n, t in res.items()),
                  flush=True)
    for n in names:
        print(f"{n}: gate_min={min(on[n]):.2f} nogate_min={min(off[n]):.2f} "
              f"gate={[round(x,2) for x in on[n]]} "
              f"nogate={[round(x,2) for x in off[n]]}")


if __name__ == "__main__":
    main()
