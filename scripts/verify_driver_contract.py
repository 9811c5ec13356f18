"""Driver-replica verification: consume __spark_entry__.py exactly the
way the round driver does — entry() smoke at sf0.001, then every
queries() entry vs its oracle_sql() via DuckDB at sf0.01 with
order-insensitive value comparison. Prints PASS/FAIL per query.

Usage: python scripts/verify_driver_contract.py [sf_dir]
"""

from __future__ import annotations

import datetime as _dt
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from torua_spark.session import get_spark  # noqa: E402
from torua_spark.sources.catalog import TABLES  # noqa: E402


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _canon_violation(rows, cols):
    """The DRIVER canonicalizes results with pandas sort_values, which
    raises ``unhashable type`` on list/dict cells (round-7
    graph_collect_priorities lesson). For DECLARED entries this harness
    must therefore REJECT container cells instead of stringifying them
    — the permissive _norm path above remains only for extras, which
    never cross the driver boundary. Returns 'col (type)' of the first
    offending cell, or None."""
    for r in rows:
        for i, v in enumerate(r):
            if isinstance(v, (list, tuple, set, dict)):
                return f"{cols[i]} ({type(v).__name__})"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("verify_driver_contract")

    df = entrymod.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, schema={df.columns}")
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql())
    # Entries facing the driver's strict pandas canon. Captured BEFORE
    # the VERIFY_EXTRA update below on purpose: under VERIFY_EXTRA=1
    # the loop also sweeps extras, which never cross the driver
    # boundary and MAY return container cells (the permissive _norm
    # stringification applies to them only).
    declared = set(qs)
    # size-law oracles: the static strings render the sf0.01 driver
    # gate; at any other SF re-render from the corpus size so the law
    # (e.g. auto_band_bits) is exercised instead of mismatched
    from torua_spark.queries import oracle_renderers

    for qname, render in oracle_renderers().items():
        if qname in oracles:
            n_rows = con.execute(
                "SELECT count(*) FROM embeddings"
            ).fetchone()[0]
            # sf_dir disambiguates SFs whose row counts tie (r14,
            # ADVICE r13: sf0.001 and sf0.01 are both 500/500)
            oracles[qname] = render(n_rows, sf_dir=sf_dir)
    if os.environ.get("VERIFY_EXTRA") == "1":
        # Sweep the pytest-only surface too (the micro-queries folded
        # into composites plus signature-level variants).
        from torua_spark.queries import extra_oracle_sql, extra_queries

        qs.update(extra_queries())
        oracles.update(extra_oracle_sql())
    only = os.environ.get("VERIFY_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        qs = {n: f for n, f in qs.items() if n in keep}
    failures = []
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name in declared:
            bad = _canon_violation(srows, scols)
            if bad:
                failures.append(name)
                print(
                    f"FAIL  {name}: driver-canon violation — container cell "
                    f"in declared output column {bad}; serialize (array_join) "
                    f"before declaring"
                )
                continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows ({time.perf_counter()-t0:.2f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            ok, why = False, f"cols spark={sorted(scols)} duck={sorted(dcols)}"
        elif len(srows) != len(drows):
            ok, why = False, f"rowcount spark={len(srows)} duck={len(drows)}"
        else:
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ms = sorted("|".join(_norm(r[i]) for i in order_s) for r in srows)
            md = sorted("|".join(_norm(r[i]) for i in order_d) for r in drows)
            if ms != md:
                sset, dset = set(md), set(ms)
                ok, why = False, (
                    f"values spark-only={[x for x in ms if x not in sset][:3]} "
                    f"duck-only={[x for x in md if x not in dset][:3]}"
                )
        if ok:
            print(f"PASS  {name}: {len(srows)} rows ({time.perf_counter()-t0:.2f}s)")
        else:
            failures.append(name)
            print(f"FAIL  {name}: {why}")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match at {sf_dir}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
