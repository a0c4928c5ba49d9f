"""Interleaved A/B for the round-12 worst-ratio-tail rewrites.

Protocol: for each query, alternate FRESH processes between tree A
(the committed round-11 code, a git worktree) and tree B (the working
tree), N rounds each, timing with bench.run_query (clearCache, noop
sink — the bench protocol). Process-level interleaving keeps host
drift symmetric between the arms, which is exactly the weakness the
r11 verdict flagged in non-interleaved artifact comparisons. Reports
min and median per arm.

Usage: python tools/ab_r12_tail.py [sf_dir] [rounds] [query ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TREE_A = "/tmp/r11tree"
TREE_B = HERE

CHILD = r"""
import sys, time, json
sys.path.insert(0, sys.argv[1])
import bench
from etl_data_ingestion_spark.plans import registry
from etl_data_ingestion_spark.session import get_spark
registry.load_all()
spark = get_spark()
# one tiny warmup action so session/JVM startup stays out of the timing
spark.range(4).write.mode("overwrite").format("noop").save()
out = {}
for name in sys.argv[3:]:
    out[name] = bench.run_query(spark, name, sys.argv[2])
print("RESULT " + json.dumps(out))
"""


def run_tree(tree: str, sf_dir: str, names: list[str]) -> dict[str, float]:
    p = subprocess.run(
        [sys.executable, "-c", CHILD, tree, sf_dir, *names],
        capture_output=True,
        text=True,
        cwd=tree,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from {tree}: {p.stderr[-2000:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    names = sys.argv[3:] or [
        "graph_pagerank_bipartite",
        "graph_assortativity",
        "graph_community_modularity",
        "graph_rich_club_coefficient",
        "pipeline_dedup_threshold_curve",
    ]
    a_runs: dict[str, list[float]] = {n: [] for n in names}
    b_runs: dict[str, list[float]] = {n: [] for n in names}
    for i in range(rounds):
        for tree, acc in ((TREE_A, a_runs), (TREE_B, b_runs)):
            res = run_tree(tree, sf_dir, names)
            for n, t in res.items():
                acc[n].append(t)
            print(f"round {i} {os.path.basename(tree)}: "
                  + " ".join(f"{n}={t:.2f}" for n, t in res.items()),
                  flush=True)

    def med(xs):
        s = sorted(xs)
        return s[len(s) // 2]

    print("\n| query | r11 min | r11 med | r12 min | r12 med | d(min) |")
    print("|---|---|---|---|---|---|")
    summary = {}
    for n in names:
        am, bm = min(a_runs[n]), min(b_runs[n])
        print(
            f"| {n} | {am:.2f} | {med(a_runs[n]):.2f} | {bm:.2f} "
            f"| {med(b_runs[n]):.2f} | {100 * (bm - am) / am:+.0f}% |"
        )
        summary[n] = {"r11_min": round(am, 3), "r12_min": round(bm, 3),
                      "r11": [round(x, 3) for x in a_runs[n]],
                      "r12": [round(x, 3) for x in b_runs[n]]}
    print(json.dumps({"sf_dir": sf_dir, "rounds": rounds, "ab": summary}))


if __name__ == "__main__":
    main()
