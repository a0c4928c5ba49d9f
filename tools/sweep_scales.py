"""Multi-scale parity sweep — the institutionalized version of the
hand-run sweeps that caught six latent cross-engine bugs in round 7
(fuzzy double ROUND at half boundaries, negative zero, ulp drift in
coupled recursions, HUGEINT dtype reds, recall-floor breaks).

The driver's correctness gate runs at sf0.01 only; these bug classes
are float-BOUNDARY classes, so whether one fires depends on whether
any value in the dataset lands on a boundary — more data = more dice
rolls. This script rolls the dice at every scale point we have:

    sf0.001 / sf0.01 / sf0.1   (driver fixtures, /root/testdata)
    sf0.3   / sf1              (.scaledata, tools/gen_scale.py)

For each sf it runs the full registry through tools/check_parity.py
in a FRESH subprocess (one Spark JVM at a time — two local JVMs
contend; and a fresh process is what the driver does), with the
standard oracle-timeout policy (superlinear brute-force oracles DNF
at sf>=0.3 by design — counted oracle-timeout, not failure).

Writes SWEEP_r{N}.json at the repo root: one entry per sf with
ok/rows-only/oracle-timeout/failed counts and every non-OK query
name — committed alongside BENCH_r{N}.json each round.

Usage: python tools/sweep_scales.py [round_number] [sf ...]
  round_number defaults to 0 (writes SWEEP_r0.json)
  sf args (e.g. 0.01 1) restrict the sweep; default runs all five.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SF_DIRS = {
    "0.001": "/root/testdata/sf0.001",
    "0.01": "/root/testdata/sf0.01",
    "0.1": "/root/testdata/sf0.1",
    "0.3": os.path.join(REPO, ".scaledata/sf0.3"),
    "1": os.path.join(REPO, ".scaledata/sf1"),
}

LINE = re.compile(r"^(OK|FAIL|ROWS-ONLY|ORACLE-TIMEOUT)\s+([\w.]+)")


def ensure_scaledata(sf: str, path: str) -> bool:
    """Generate .scaledata dirs on demand (idempotent, seeded)."""
    if os.path.isdir(path):
        return True
    if not path.startswith(os.path.join(REPO, ".scaledata")):
        return False  # driver fixture missing — nothing we can do
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/gen_scale.py"), sf, path],
        check=True,
        cwd=REPO,
    )
    return True


def sweep_one(sf: str, path: str) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_ORACLE_TIMEOUT", "180")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/check_parity.py"), path],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
    )
    counts = {"ok": 0, "rows_only": 0, "oracle_timeout": 0, "failed": 0}
    non_ok: dict[str, list[str]] = {
        "failed": [],
        "rows_only": [],
        "oracle_timeout": [],
    }
    for raw in proc.stdout.splitlines():
        m = LINE.match(raw.strip())
        if not m:
            continue
        kind, name = m.groups()
        key = {
            "OK": "ok",
            "FAIL": "failed",
            "ROWS-ONLY": "rows_only",
            "ORACLE-TIMEOUT": "oracle_timeout",
        }[kind]
        counts[key] += 1
        if key != "ok":
            non_ok[key].append(name)
    return {
        "sf": sf,
        "sf_dir": path,
        "rc": proc.returncode,
        **counts,
        "non_ok": non_ok,
        # keep the first FAIL detail lines for triage without rerunning
        "fail_detail": [
            ln
            for ln in proc.stdout.splitlines()
            if ln.startswith("FAIL") or ln.startswith("   ")
        ][:60],
    }


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "0"
    wanted = sys.argv[2:] or list(SF_DIRS)
    results = []
    worst_rc = 0
    for sf in wanted:
        path = SF_DIRS[sf]
        if not ensure_scaledata(sf, path):
            print(f"SKIP sf{sf}: fixture dir missing ({path})")
            continue
        print(f"=== sweeping sf{sf} ({path}) ===", flush=True)
        r = sweep_one(sf, path)
        results.append(r)
        worst_rc = max(worst_rc, r["rc"])
        print(
            f"sf{sf}: {r['ok']} ok, {r['rows_only']} rows-only, "
            f"{r['oracle_timeout']} oracle-timeout, {r['failed']} failed",
            flush=True,
        )
        for name in r["non_ok"]["failed"]:
            print(f"  FAILED: {name}")
    out = os.path.join(REPO, f"SWEEP_r{rnd}.json")
    with open(out, "w") as f:
        json.dump({"round": rnd, "results": results}, f, indent=1)
    print(f"\nwrote {out}; overall {'CLEAN' if worst_rc == 0 else 'FAILURES'}")
    return worst_rc


if __name__ == "__main__":
    raise SystemExit(main())
