"""Synthesize an sf1.0-equivalent dataset from the driver's sf0.1
tables for the SCALE.md scaling sweep (VERDICT r2/r3 stretch item).

/root/testdata is read-only and carries no sf1.0, so the 10x corpus is
derived: MULT structure-preserving replicas of every sf0.1 table with
DISJOINT key spaces, written under the repo (testdata_sf1/, gitignored).
The transform per replica k is an isometry of the workload, chosen so
that per-replica query structure is EXACTLY the sf0.1 structure and
cross-replica interaction is nil — i.e. a 10x corpus whose true result
cardinalities scale by exactly 10x, which is what a scaling factor
measurement needs (a naive 10x copy would instead create a 10-way
exact-duplicate flood and measure a different workload):

- fact/dim keys shift by k * (decade-rounded max+1): 10 disjoint
  isomorphic star-schema subgraphs -> graph queries (CC / PageRank /
  PPR) see 10x vertices+edges at identical diameter and degree
  distribution.
- documents: every whitespace token gets a replica suffix ("qa".."qi")
  -> within-replica shingle/Jaccard structure is bit-identical to
  sf0.1 (the suffix rides inside every token), cross-replica shingle
  sets are disjoint -> dedup candidate and verified-pair counts scale
  exactly 10x.
- embeddings: replica-specific fixed permutation of the 64 dims — an
  isometry (norms and within-replica cosines exactly preserved);
  cross-replica cosines decorrelate -> near-dup pair count scales 10x.
- events: ids/users shift; timestamps unchanged (10x event density in
  the same time range — the correct temporal scaling).

Usage: python scripts/make_scale_data.py [out_dir] [mult]
"""

from __future__ import annotations

import os
import random
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# (table, [(col, shift)]) — shift chosen > max key at sf0.1.
KEY_SHIFTS = {
    "customer": [("c_custkey", 20_000)],
    "supplier": [("s_suppkey", 2_000)],
    "part": [("p_partkey", 30_000)],
    "orders": [("o_orderkey", 200_000), ("o_custkey", 20_000)],
    "lineitem": [
        ("l_orderkey", 200_000),
        ("l_partkey", 30_000),
        ("l_suppkey", 2_000),
    ],
    # user_id MUST shift by the custkey shift: events join customers on
    # user_id == c_custkey (streaming enrichment), so a replica's users
    # must land inside the same replica's customer key range or the
    # sf1 join becomes degenerate (90% of events matching nothing) and
    # the enrichment sweep row measures an artifact.
    "events": [("event_id", 200_000), ("user_id", 20_000)],
}


def replica_select(table: str, k: int, dim: int) -> str:
    if table in ("region", "nation"):
        return f"SELECT * FROM read_parquet('{SRC}/{table}.parquet')" if k == 0 else ""
    if table == "documents":
        if k == 0:
            return f"SELECT * FROM read_parquet('{SRC}/documents.parquet')"
        sfx = "q" + "abcdefghijklmnopqrstuvwxyz"[k - 1]
        return (
            f"SELECT doc_id + {k * 10_000} AS doc_id, "
            rf"regexp_replace(text, '(\S+)', '\1{sfx}', 'g') AS text, "
            f"lang, source, "
            rf"length(regexp_replace(text, '(\S+)', '\1{sfx}', 'g')) AS n_chars "
            f"FROM read_parquet('{SRC}/documents.parquet')"
        )
    if table == "embeddings":
        if k == 0:
            return f"SELECT * FROM read_parquet('{SRC}/embeddings.parquet')"
        perm = list(range(1, dim + 1))
        random.Random(k).shuffle(perm)
        idx = "[" + ",".join(str(i) for i in perm) + "]"
        return (
            f"SELECT vec_id + {k * 10_000} AS vec_id, "
            f"list_select(embedding, {idx}) AS embedding, label "
            f"FROM read_parquet('{SRC}/embeddings.parquet')"
        )
    shifts = {c: s for c, s in KEY_SHIFTS[table]}
    con = duckdb.connect()
    cols = [
        d[0]
        for d in con.execute(
            f"SELECT * FROM read_parquet('{SRC}/{table}.parquet') LIMIT 0"
        ).description
    ]
    sel = ", ".join(
        f"{c} + {k * shifts[c]} AS {c}" if c in shifts and k > 0 else c for c in cols
    )
    return f"SELECT {sel} FROM read_parquet('{SRC}/{table}.parquet')"


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"
    )
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    dim = con.execute(
        f"SELECT len(embedding) FROM read_parquet('{SRC}/embeddings.parquet') LIMIT 1"
    ).fetchone()[0]
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        parts = [
            s for k in range(mult) if (s := replica_select(t, k, dim))
        ]
        q = " UNION ALL ".join(parts)
        dst = os.path.join(out, f"{t}.parquet")
        con.execute(f"COPY ({q}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")
    # Isometry invariant: every replica's events must join its own
    # replica's customers exactly the way sf0.1 does (a shift mismatch
    # here once made the sf1 enrichment join 90% degenerate and the
    # sweep row an artifact).
    orphans = con.execute(f"""
        SELECT count(*) FROM read_parquet('{out}/events.parquet') e
        WHERE NOT EXISTS (
            SELECT 1 FROM read_parquet('{out}/customer.parquet') c
            WHERE c.c_custkey = e.user_id
        )
    """).fetchone()[0]
    src_orphans = con.execute(f"""
        SELECT count(*) FROM read_parquet('{SRC}/events.parquet') e
        WHERE NOT EXISTS (
            SELECT 1 FROM read_parquet('{SRC}/customer.parquet') c
            WHERE c.c_custkey = e.user_id
        )
    """).fetchone()[0]
    assert orphans == src_orphans * mult, (
        f"events->customer join broke in replication: {orphans} orphan "
        f"events at {mult}x vs {src_orphans} at 1x — check KEY_SHIFTS"
    )
    print(f"join invariant OK: {orphans} orphan events ({src_orphans} x {mult})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
