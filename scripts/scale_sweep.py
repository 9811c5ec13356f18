"""sf0.1 -> sf1.0 scaling sweep (VERDICT r2/r3 item): time the most
expensive declared queries at sf0.1 and at the 10x derived corpus
(scripts/make_scale_data.py) and report the per-query scaling factor.
Linear-claimed designs should land well under ~12x cost at 10x data
(10x work + shuffle/log factors); a super-linear factor flags a plan
that would not survive 100 TB.

Usage: python scripts/scale_sweep.py [queries_csv]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from torua_spark.queries import all_queries, extra_queries  # noqa: E402
from torua_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "connected_components",
    "graph_pagerank",
    "graphrag_ppr",
    "vector_neardup_pairs",
    "dedup_cluster_canonical",
    "dedup_prefix_filter",
]

SF1_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"
)


def _time(spark, fn, sf_dir: str, runs: int = 2) -> tuple[float, int]:
    best, rows = None, -1
    for _ in range(runs):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        rows = df.count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        df = None
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    # between-queries isolation, same discipline as bench.py
    try:
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    except Exception:
        pass
    spark.sparkContext._jvm.System.gc()
    return best, rows


def main() -> int:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else DEFAULT
    qs = {**all_queries(), **extra_queries()}
    spark = get_spark("scale_sweep", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    out = {}
    for name in names:
        t01, r01 = _time(spark, qs[name], "/root/testdata/sf0.1")
        t1, r1 = _time(spark, qs[name], SF1_DIR)
        out[name] = {
            "sf0.1_sec": round(t01, 2),
            "sf1_sec": round(t1, 2),
            "factor": round(t1 / t01, 2),
            "rows_sf0.1": r01,
            "rows_sf1": r1,
        }
        print(
            f"{name}: {t01:.2f}s -> {t1:.2f}s = {t1 / t01:.2f}x "
            f"(rows {r01} -> {r1})",
            flush=True,
        )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
