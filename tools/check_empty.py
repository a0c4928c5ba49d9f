"""Empty-corpus robustness sweep — full registry vs DuckDB on 0-row
base tables.

Motivation: the r13 advisor caught a real empty-RELATION bug
(threshold-curve aggregates returning NULL where the oracle emits 0
once the scored pair relation is empty — fixed with coalesce). That
bug class — F.sum/avg over zero rows yielding NULL vs the oracle's
arithmetic, first()-of-nothing, division by zero counts, HOFs over
empty arrays — fires only when an intermediate relation is empty,
which no populated fixture exercises. Running the WHOLE registry on
all-empty base tables drives every such site at once: each query
must either agree with its DuckDB oracle on the empty input or fail
loudly with a documented degenerate-input exception.

Classification:
  OK             both engines agree (usually both 0 rows, sometimes
                 a fixed-shape domain result with NULL/0 measures)
  DESIGNED-RAISE the Spark side raises one of the registry's
                 documented degenerate-corpus loud failures (the
                 repo's stated alternative to silently wrong output;
                 matched against EXPECTED_RAISES below — anything
                 not listed there stays FAIL)
  FAIL           divergence or an undocumented exception — a bug.

Usage: python tools/check_empty.py
Writes tools/out/empty_sweep.json; exits nonzero on FAIL.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EMPTY_DIR = os.path.join(REPO, ".scaledata/sf_empty")

# Documented loud-failure contracts on degenerate input: query-name
# pattern -> substring that must appear in the raise message. Kept
# deliberately narrow — a new query landing in here requires the
# docstring to state the degenerate-input contract first.
EXPECTED_RAISES: dict[str, str] = {
    # populated below as the sweep classifies real raises; see
    # tests/test_empty_corpus.py for the pinned contracts
}

LINE = re.compile(r"^(OK|FAIL|ROWS-ONLY|ORACLE-TIMEOUT)\s+([\w.]+)(.*)")


def main() -> int:
    if not os.path.isdir(EMPTY_DIR):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/gen_empty.py")],
            check=True,
            cwd=REPO,
        )
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_ORACLE_TIMEOUT", "60")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools/check_parity.py"),
            EMPTY_DIR,
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
    )
    ok, fail, designed, rows_only = [], [], [], []
    for raw in proc.stdout.splitlines():
        m = LINE.match(raw.strip())
        if not m:
            continue
        status, name, rest = m.groups()
        if status == "OK":
            ok.append(name)
        elif status == "ROWS-ONLY":
            rows_only.append(name)
        elif status == "FAIL":
            pat = EXPECTED_RAISES.get(name)
            if pat and "spark raised" in rest and pat in rest:
                designed.append(name)
            else:
                fail.append({"name": name, "detail": rest.strip()[:300]})
    out = {
        "tool": "check_empty",
        "n_ok": len(ok),
        "n_designed_raise": len(designed),
        "n_rows_only": len(rows_only),
        "n_fail": len(fail),
        "designed_raise": designed,
        "rows_only": rows_only,
        "failures": fail,
    }
    os.makedirs(os.path.join(REPO, "tools/out"), exist_ok=True)
    with open(os.path.join(REPO, "tools/out/empty_sweep.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"empty sweep: {len(ok)} ok, {len(designed)} designed-raise, "
        f"{len(rows_only)} rows-only, {len(fail)} FAIL"
    )
    for f_ in fail:
        print(f"  FAIL {f_['name']}: {f_['detail'][:160]}")
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
