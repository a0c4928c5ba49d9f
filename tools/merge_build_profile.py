"""Merge PROFILE_SLICE outputs of tools/profile_build.py into the
single committed artifact tools/out/build_profile.json.

Usage: python tools/merge_build_profile.py N   (merges _1ofN.._NofN)
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rows, sf = [], None
    for i in range(1, n + 1):
        d = json.load(open(f"tools/out/build_profile_{i}of{n}.json"))
        rows += d["rows"]
        sf = d["sf"]
    with open("tools/out/build_profile.json", "w") as f:
        json.dump({"sf": sf, "rows": rows}, f, indent=1)
    ok = [r for r in rows if "err" not in r]
    print(
        f"merged {len(rows)} rows; build="
        f"{sum(r['build'] for r in ok):.1f}s "
        f"optimize={sum(r['optimize'] for r in ok):.1f}s "
        f"execute={sum(r['execute'] for r in ok):.1f}s"
    )


if __name__ == "__main__":
    main()
