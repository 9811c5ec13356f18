"""Per-query perf-regression guard: compare a fresh bench run against
the committed BENCH_LOCAL.json snapshot and flag queries that got
slower beyond noise.

Usage:
    SPARK_GRAFT_SF_DIR=... python bench.py > /tmp/bench_now.json
    python scripts/bench_compare.py /tmp/bench_now.json

Machine noise on this box is large: ±20% run-to-run from JVM/GC, and
whole-suite phases of 1.5-2x when the host carries external load
(observed load-average spikes to ~10 with no local process — see
SCALE.md). So: (a) only >2.5x slowdowns with >1 s absolute delta are
flagged, (b) run the fresh bench with BENCH_RUNS=2 (min-of-2 warm
timing) and confirm a flagged query standalone before believing it.
Exit code 1 if anything regressed.
"""

from __future__ import annotations

import json
import os
import sys

RATIO = 2.5
MIN_DELTA_S = 1.0


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = json.load(open(os.path.join(here, "BENCH_LOCAL.json")))
    now = json.load(open(sys.argv[1]))
    regressions = []
    for name, t_now in sorted(now["queries"].items()):
        t_base = base["queries"].get(name)
        if t_base is None or t_base <= 0 or t_now <= 0:
            continue
        if t_now > t_base * RATIO and t_now - t_base > MIN_DELTA_S:
            regressions.append((name, t_base, t_now))
    for name, t_base, t_now in regressions:
        print(f"REGRESSION {name}: {t_base:.2f}s -> {t_now:.2f}s ({t_now / t_base:.1f}x)")
    print(
        f"total: {base['value']:.1f}s (snapshot, n={len(base['queries'])}) -> "
        f"{now['value']:.1f}s (now, n={len(now['queries'])}); "
        f"{len(regressions)} regression(s)"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
