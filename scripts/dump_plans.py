"""Dump `.explain("formatted")` for every declared query into
plans/<tag>/<query>_<suffix>.txt (the optimization-round evidence
artifact: the judge checks plan claims against these files).

Usage: python scripts/dump_plans.py <tag> <suffix> [sf_dir] [only,names]
  e.g. python scripts/dump_plans.py r14 before /root/testdata/sf0.1
       python scripts/dump_plans.py r14 after  /root/testdata/sf0.1 graph_k_core
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from torua_spark.queries import all_queries  # noqa: E402
from torua_spark.session import get_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = None
    if len(sys.argv) > 4:
        only = {n.strip() for n in sys.argv[4].split(",") if n.strip()}
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    failed = []
    for name, fn in all_queries().items():
        if only is not None and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, sf_dir)
            formatted = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # keep dumping the rest
            failed.append(name)
            formatted = f"PLAN FAILED: {e}"
        with open(path, "w") as f:
            f.write(f"-- {name} ({suffix}) at {sf_dir}\n")
            f.write(formatted)
        print(f"wrote {path}")
    spark.stop()
    if failed:
        print(f"FAILED plans: {failed}", file=sys.stderr)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
