"""Property tests: the pattern compiler vs BRUTE-FORCE reference
matchers on random small graphs (hypothesis).

The compiler's contract is homomorphic (SQL-join) matching — a binding
may reuse an edge, duplicate edge rows multiply matches — so every
reference below enumerates bindings with plain nested loops over the
RAW edge list (duplicates preserved) and the raw vertex list. The
hand-written tests in test_pattern.py pin individual clause semantics;
these pin the JOIN ALGEBRA itself on adversarial shapes (self-loops,
parallel edges, isolated vertices, empty edge sets) that hand cases
miss. Spark-job budget: max_examples is small (the draw space is what
varies), matching the repo's existing hypothesis discipline."""

from collections import Counter

from hypothesis import given, settings, strategies as st

from torua_spark.plans.pattern import PropertyGraph

N_V = 5  # vertex ids 0..4

edges_st = st.lists(
    st.tuples(st.integers(0, N_V - 1), st.integers(0, N_V - 1)),
    min_size=0, max_size=12,
)
vals_st = st.lists(
    st.integers(-3, 3), min_size=N_V, max_size=N_V
)


def _pg(spark, edges, vals):
    v = spark.createDataFrame(
        [(i, vals[i]) for i in range(N_V)], "vid long, val long"
    )
    e = spark.createDataFrame(edges or [], "es long, ed long")
    return (
        PropertyGraph()
        .add_vertex("v", v, "vid")
        .add_edge("E", e, "es", "ed")
    )


def _rows(df, *cols):
    return Counter(tuple(r[c] for c in cols) for r in df.collect())


@settings(max_examples=3, deadline=None)
@given(edges=edges_st, vals=vals_st)
def test_property_single_hop_and_where(spark, edges, vals):
    pg = _pg(spark, edges, vals)
    got = _rows(
        pg.query("MATCH (a:v)-[:E]->(b:v) RETURN a, b"), "a", "b"
    )
    want = Counter((s, d) for s, d in edges)
    assert got == want
    # WHERE on an id and on an attribute of the far endpoint
    got2 = _rows(
        pg.query(
            "MATCH (a:v)-[:E]->(b:v) WHERE a < b AND b.val >= 0 "
            "RETURN a, b"
        ),
        "a", "b",
    )
    want2 = Counter(
        (s, d) for s, d in edges if s < d and vals[d] >= 0
    )
    assert got2 == want2


@settings(max_examples=3, deadline=None)
@given(edges=edges_st, vals=vals_st)
def test_property_two_hop_cycle_and_distinct(spark, edges, vals):
    pg = _pg(spark, edges, vals)
    # homomorphic 2-hop: edges may repeat (self-loop walks count)
    got = _rows(
        pg.query("MATCH (a:v)-[:E]->(b:v)-[:E]->(c:v) RETURN a, c"),
        "a", "c",
    )
    want = Counter(
        (s1, d2) for s1, d1 in edges for s2, d2 in edges if d1 == s2
    )
    assert got == want
    # repeated variable closes a cycle (2-cycles incl. self-loops twice)
    got2 = _rows(
        pg.query("MATCH (a:v)-[:E]->(b:v)-[:E]->(a) RETURN a, b"),
        "a", "b",
    )
    want2 = Counter(
        (s1, d1) for s1, d1 in edges for s2, d2 in edges
        if d1 == s2 and d2 == s1
    )
    assert got2 == want2
    # DISTINCT collapses multiplicity
    got3 = _rows(
        pg.query(
            "MATCH (a:v)-[:E]->(b:v)-[:E]->(c:v) RETURN DISTINCT a, c"
        ),
        "a", "c",
    )
    assert got3 == Counter(set(want))


@settings(max_examples=3, deadline=None)
@given(edges=edges_st, vals=vals_st)
def test_property_comma_conjunction_shared_var(spark, edges, vals):
    pg = _pg(spark, edges, vals)
    got = _rows(
        pg.query(
            "MATCH (a:v)-[:E]->(b:v), (c:v)-[:E]->(b) RETURN a, b, c"
        ),
        "a", "b", "c",
    )
    want = Counter(
        (s1, d1, s2) for s1, d1 in edges for s2, d2 in edges if d2 == d1
    )
    assert got == want


@settings(max_examples=3, deadline=None)
@given(edges=edges_st, vals=vals_st)
def test_property_optional_match_null_extension(spark, edges, vals):
    pg = _pg(spark, edges, vals)
    got = _rows(
        pg.query(
            "MATCH (a:v) OPTIONAL MATCH (a)-[:E]->(b:v) RETURN a, b"
        ),
        "a", "b",
    )
    want = Counter()
    for a in range(N_V):
        outs = [d for s, d in edges if s == a]
        if outs:
            for d in outs:
                want[(a, d)] += 1
        else:
            want[(a, None)] += 1
    assert got == want


@settings(max_examples=3, deadline=None)
@given(edges=edges_st, vals=vals_st)
def test_property_exists_and_aggregates(spark, edges, vals):
    pg = _pg(spark, edges, vals)
    # EXISTS: semi-join — one row per anchored vertex, never multiplied
    got = _rows(
        pg.query("MATCH (a:v) WHERE EXISTS((a)-[:E]->(x)) RETURN a"),
        "a",
    )
    srcs = {s for s, _ in edges}
    assert got == Counter((a,) for a in range(N_V) if a in srcs)
    # NOT EXISTS is the complement over the same anchor set
    got_n = _rows(
        pg.query("MATCH (a:v) WHERE NOT EXISTS((a)-[:E]->(x)) RETURN a"),
        "a",
    )
    assert got_n == Counter((a,) for a in range(N_V) if a not in srcs)
    # grouped aggregates over the hop: count multiplicity + sum of attr
    got_agg = {
        r["a"]: (r["n"], r["s"])
        for r in pg.query(
            "MATCH (a:v)-[:E]->(b:v) "
            "RETURN a, count(*) AS n, sum(b.val) AS s"
        ).collect()
    }
    want_agg = {}
    for s, d in edges:
        n, tot = want_agg.get(s, (0, 0))
        want_agg[s] = (n + 1, tot + vals[d])
    assert got_agg == want_agg
